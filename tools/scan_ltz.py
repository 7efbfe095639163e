"""Full-registry TIMESTAMP_LTZ output scan (round 14).

PySpark collects LTZ timestamps as naive datetimes rendered in the
driver Python process's LOCAL timezone (HANDOFF knowledge #36), so a
graded query emitting LTZ hashes differently on drivers in different
timezones.  The engine rule: every temporal output column is
TIMESTAMP_NTZ.

This scan resolves each registered query's LAZY schema (no collect
for batch plans; streaming-protocol ids do execute their run — the
scan is still minutes, not hours) and reports every column whose type
contains TimestampType (LTZ) anywhere, including inside arrays and
structs.  Exit 1 if any are found.

    python tools/scan_ltz.py [q_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType, TimestampType

from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark


def has_ltz(dt) -> bool:
    if isinstance(dt, TimestampType):
        return True
    if isinstance(dt, ArrayType):
        return has_ltz(dt.elementType)
    if isinstance(dt, MapType):
        return has_ltz(dt.keyType) or has_ltz(dt.valueType)
    if isinstance(dt, StructType):
        return any(has_ltz(f.dataType) for f in dt.fields)
    return False


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names = sys.argv[1:] or list(REGISTRY)
    spark = build_spark(app_name="scan-ltz")
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[tuple[str, list[str]]] = []
    errs: list[str] = []
    for name in names:
        try:
            sch = REGISTRY[name].fn(spark, sf).schema
        except Exception as e:  # noqa: BLE001
            errs.append(f"{name}: {type(e).__name__}")
            continue
        cols = [f.name for f in sch.fields if has_ltz(f.dataType)]
        if cols:
            bad.append((name, cols))
            print(f"LTZ {name}: {cols}")
    print(f"{len(bad)} ids with LTZ outputs / {len(names)} scanned"
          + (f"; {len(errs)} errored: {errs}" if errs else ""))
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
