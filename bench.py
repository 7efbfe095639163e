"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec", "sf": <sf>,
   "notes": {...}, "queries": {"q_...": sec, ...},
   "spread": {"q_...": [min, med, max]}}

Key order is a contract (VERDICT r8 #1): the driver archives only the
last 2000 characters, so measurements go last, prose notes first.

Timing = wall time of one terminal action (count of a fully-computed
result) per query on a warm SparkSession, AQE on.

Protocol (round 6, drift-proofing per VERDICT r5 #2): one warm-up pass
over every query (amortizes whole-stage-codegen compilation), then
three full measurement PASSES; within each pass every query runs once
and the pass visits queries in a different deterministic shuffled
order.  Per query we report the median of the three samples, plus
[min, median, max] in "spread".  Interleaving passes (rather than
running one query's samples back-to-back) decorrelates slow-box drift
from per-query regressions: a machine that is globally 10% slower
moves every query's median together, while a genuine plan regression
moves one query across all three passes.
"""

from __future__ import annotations

import json
import os
import random
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
    "protocol": (
        "interleaved median-of-3 (r6 cutover; full rationale in "
        "HANDOFF.md) — not comparable to pre-r6 back-to-back numbers."
    ),
    "box_weather": (
        "this box drifts a uniform 1.3-1.8x field multiplier for hours "
        "(HANDOFF knowledge #11); same-code totals span 9-14 s.  A real "
        "regression moves ONE query against the field — adjudicate with "
        "tools/bench_ab.py old-rev new-rev (built r10; identical-code "
        "smoke: field 1.001, adjusted ratios 0.87-1.08, none flagged)."
    ),
    "r15_headline_additions": (
        "headline set widened by 4 ADDITIONS (q_graph_2hop_sketch, "
        "q_knn_classify, q_dedup_minhash_portable, q_pagerank) so the "
        "driver bench sees the heavy tail the r14 optimization targeted; "
        "no id removed or renamed.  r14-code reference timings for the "
        "additions are stamped in OPTIMIZATION_r15.md."
    ),
    "scaling": (
        "the trailing 'env' key carries the EFFECTIVE master / "
        "defaultParallelism / shuffle partitions so a low-core run is "
        "verifiable from the archived tail.  At sf0.1 most headliners "
        "are sub-second and fixed driver overhead dominates the "
        "core-count ratio; the 4 r15 additions are the multi-second "
        "ids where parallelism is measurable.  For a wider spread, "
        "point SPARK_GRAFT_SF_DIR at a 10x replica "
        "(tools/scale_probe.py builds one)."
    ),
}

#: Number of interleaved measurement passes (1 sample/query/pass).
PASSES = 3


def emit_line(
    times: dict[str, float],
    spread: dict[str, list[float]],
    sf: float,
    env: dict[str, object] | None = None,
) -> str:
    """Serialize the one-line JSON result.  KEY ORDER IS A CONTRACT
    (VERDICT r8 #1): the driver archives only the LAST 2000 characters
    of stdout, so the measurements — queries and spread — must come
    AFTER the prose notes or a long note evicts them from the committed
    artifact (BENCH_r08.json carried zero per-query numbers for exactly
    this reason).  notes first, queries/spread last, then the compact
    ``env`` block (VERDICT r14 #1: the driver re-runs this bench at a
    lower core count and previously had no way to verify the env was
    honored — the trailing position keeps the effective master /
    parallelism inside the archived tail).
    tests/test_bench_contract.py pins the order, that a full-size
    queries dict STILL survives a 2000-char tail, and that env is
    bounded small."""
    total = round(sum(times.values()), 3)
    payload: dict[str, object] = {
        "metric": "headline query wall time, warm session, AQE on",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "notes": NOTES,
        "queries": times,
        "spread": spread,
    }
    if env is not None:
        payload["env"] = env
    return json.dumps(payload)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = build_spark(app_name="etl-caltopo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, spec in REGISTRY.items() if spec.headline]

    # Warm-up pass: amortizes one-time whole-stage-codegen compilation
    # (seconds for the larger expression trees; irrelevant at real
    # scale where a query runs minutes).  count() forces every
    # operator in the plan.
    for name in headline:
        REGISTRY[name].fn(spark, sf_dir).count()

    # Interleaved measurement passes, each in a fresh deterministic
    # shuffled order so that slow-box drift spreads evenly across
    # queries instead of penalizing whichever query ran last.
    samples: dict[str, list[float]] = {name: [] for name in headline}
    rng = random.Random(0x5F0C6)
    for _ in range(PASSES):
        order = list(headline)
        rng.shuffle(order)
        for name in order:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in headline:
        s = sorted(samples[name])
        times[name] = round(s[len(s) // 2], 3)
        spread[name] = [round(s[0], 3), round(s[len(s) // 2], 3), round(s[-1], 3)]
    # The EFFECTIVE runtime shape, so the driver's low-core scaling run
    # is verifiable from the archived tail (VERDICT r14 #1: every
    # 8-vs-32 ratio read ~1 and the driver could not distinguish "env
    # ignored" from "overhead-dominated"; session.py honors
    # SPARK_GRAFT_CPUS — now the artifact proves it).
    sc = spark.sparkContext
    env = {
        "master": sc.master,
        "cores": sc.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
    }
    print(emit_line(times, spread, sf, env))


if __name__ == "__main__":
    main()
