"""Physical-plan red-flag audit over the whole registry (guide §7.2).

For every registered id (streaming-protocol ids excluded — their
returned frames are driver-materialized), captures
``explain("formatted")`` under SPARK_GRAFT_LAZY_PLANS=1 and summarizes:

- number of Exchange nodes (shuffles) and their partitioning,
- join operators chosen (BroadcastHashJoin / SortMergeJoin /
  ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct),
- Python boundary nodes (BatchEvalPython / ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas),
- whether each parquet scan carries PushedFilters,
- WholeStageCodegen span count.

    python tools/plan_scan.py [--json PATH] [q_name ...]

Output: one JSON object keyed by id; red-flag ids (cartesian /
nested-loop joins, BatchEvalPython) are listed on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_LAZY_PLANS", "1")

from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark

#: protocol ids whose fn() runs availableNow streams / driver loops at
#: call time; their returned plans are `Scan ExistingRDD` by design
SKIP_PREFIX = (
    "q_stream_dedup", "q_stream_stateful", "q_stream_interval",
    "q_stream_incr", "q_stream_cdc", "q_stream_watermark",
    "q_stream_topk", "q_stream_enrich", "q_stream_hll",
    "q_stream_foreachbatch", "q_llm_curation_stream",
)

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_OPS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
)


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def summarize(txt: str) -> dict:
    counts = {}
    for op in JOIN_OPS + PY_OPS:
        n = len(re.findall(rf"\b{op}\b", txt))
        if n:
            counts[op] = n
    n_exchange = len(re.findall(r"\bExchange (hash|range|Single|round)", txt)) + len(
        re.findall(r"\bExchange\b(?! (hash|range|Single|round))", txt)
    )
    # simpler: count operator-list lines that are Exchange nodes
    n_exchange = len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*Exchange", txt, re.M))
    scans = len(re.findall(r"Scan parquet", txt))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", txt))
    codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
    reused = len(re.findall(r"ReusedExchange", txt))
    return {
        "exchanges": n_exchange,
        "reused_exchanges": reused,
        "parquet_scans": scans,
        "scans_with_pushed_filters": pushed,
        "codegen_spans": codegen,
        **counts,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = args.names or [
        n for n in REGISTRY if not n.startswith(SKIP_PREFIX)
    ]
    spark = build_spark(app_name="etl-caltopo-plan-scan")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    flags: list[str] = []
    for n in names:
        try:
            txt = plan_text(REGISTRY[n].fn(spark, args.sf))
        except Exception as exc:
            out[n] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        s = summarize(txt)
        out[n] = s
        if s.get("CartesianProduct") or s.get("BatchEvalPython"):
            flags.append(n)
        print(f"{n}: {s}", file=sys.stderr)

    if flags:
        print(f"RED FLAGS: {flags}", file=sys.stderr)
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
