"""Full-registry oracle sweep over DEGENERATE data (round 8).

Builds an sf0.001 replica with the degenerate overwrites the
tests/test_degenerate_parity.py fixture uses — constant lineitem
discount AND quantity (variance 0), constant event values + a single
event class (zero positives, var 0), one all-zero embedding — then
runs tools/check_oracle.py over EVERY registered id against it.

This catches the class of bug the per-id degenerate tests can only
pin after the fact: engine-divergent division-by-zero behavior that
the seeded driver data never exercises.  The round-8 run caught
q_pr_auc / q_lift_deciles (unguarded /positives ANSI crash vs DuckDB
NULL) and q_agg_corr / q_corr_matrix (F.corr's internal division
ANSI-crashes on a zero-variance column even under a CASE guard —
aggregates evaluate before the projection).

Usage: python tools/degenerate_sweep.py [--base /root/testdata/sf0.001]
Expect the SAME pass/rows-only/fail split as the normal-data sweep.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_degenerate(base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table
    from etl_caltopo_spark.session import build_spark

    spark = build_spark(app_name="build-degenerate")
    for t in TABLES:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    li = (
        spark.read.parquet(f"{base}/lineitem.parquet")
        .withColumn("l_discount", F.lit(0.05))
        .withColumn("l_quantity", F.lit(7.0))
    )
    li.coalesce(1).write.mode("overwrite").parquet(f"{out}/_li")
    ev = (
        load_table(spark, base, "events")
        .withColumn("value", F.lit(2.5))
        .withColumn("event_type", F.lit("view"))
    )
    ev.coalesce(1).write.mode("overwrite").parquet(f"{out}/_ev")
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    zero = F.transform(F.col("embedding"), lambda x: x * F.lit(0.0))
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, zero).otherwise(F.col("embedding")),
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{out}/_emb")
    for sub, t in (("_li", "lineitem"), ("_ev", "events"), ("_emb", "embeddings")):
        part = next(f for f in os.listdir(f"{out}/{sub}") if f.endswith(".parquet"))
        os.replace(f"{out}/{sub}/{part}", f"{out}/{t}.parquet")
        shutil.rmtree(f"{out}/{sub}")
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*", help="query ids (default: all)")
    args = ap.parse_args()
    d = tempfile.mkdtemp(prefix="spark_graft_degsweep_")
    try:
        build_degenerate(args.base, d)
        cmd = [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "check_oracle.py"),
            "--sf",
            d,
            *args.names,
        ]
        return subprocess.call(cmd)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
