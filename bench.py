"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_...": sec, ...}, "sf": <sf>}

Timing = wall time of one terminal action (count of a fully-computed
result) per query on a warm SparkSession, AQE on.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark


#: Per-query measurement-protocol notes (VERDICT r4 #7): add an entry
#: whenever a query's measured plan or timing protocol changes between
#: rounds, so the driver's round-over-round diff is interpretable
#: without reading HANDOFF (e.g. r4's q_dedup_near +52% was a
#: cache-leak honesty correction, not a regression).  Clear entries
#: that are more than one round old.
NOTES: dict[str, str] = {
    # round 5: no headline query's plan or protocol changed (the
    # q_dedup_jaccard/q_dedup_embed/q_knn_classify rewires are
    # non-headline ids); baseline comparable to BENCH_r04.
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_spark(app_name="etl-caltopo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, spec in REGISTRY.items() if spec.headline]

    times: dict[str, float] = {}
    for name in headline:
        spec = REGISTRY[name]
        # run once to amortize one-time whole-stage-codegen compilation
        # (seconds for the larger expression trees; irrelevant at real
        # scale where a query runs minutes), then report the median of
        # five warm runs — count() forces every operator in the plan.
        # Median-of-5 over min-of-2 because sub-second queries see
        # ±20% scheduler jitter that made round-over-round deltas
        # meaningless noise.
        spec.fn(spark, sf_dir).count()
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sorted(samples)[2], 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time, warm session, AQE on",
                "value": total,
                "unit": "sec",
                "queries": times,
                "notes": NOTES,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
