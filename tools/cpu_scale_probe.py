"""Core-count scaling control probe (optimization r15, VERDICT r14 #2).

The driver re-runs bench.py at a lower core count and compares
per-query walls.  When every ratio reads ~1 it cannot tell "the env
was ignored" from "the workload does not scale with cores on this
box".  bench.py's trailing env block settles the first question; this
probe settles the second: it times ONE deliberately CPU-bound codegen
job (range → xxhash64 → pmod → sum, no I/O, no Python boundary, no
skew) under the same SPARK_GRAFT_CPUS contract.

    SPARK_GRAFT_CPUS=32 python tools/cpu_scale_probe.py
    SPARK_GRAFT_CPUS=8  python tools/cpu_scale_probe.py

If THIS job scales with cores (r15 measurement on the round-15 box:
2.53 s at 32 vs 6.58 s at 8 — 2.6x at a 4x core spread, against a
raw-multiprocessing ceiling of ~18 effective cores), flat ratios on
the engine's queries are a property of their work profile
(python-boundary, memory bandwidth, driver/stage barriers), not of
the harness.  A raw multiprocessing burn (bottom) prints the box's
effective-core ceiling so the Spark ratio has a denominator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_caltopo_spark.session import build_spark

ROWS = 4_000_000_000


def spark_probe() -> float:
    spark = build_spark(app_name="cpu-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, ROWS, 1, 64)
    # warm-up (codegen compile) on a hash variant, then measure
    df.select(F.xxhash64("id").alias("h")).agg(
        F.sum(F.pmod(F.col("h"), F.lit(1_000_000)))
    ).collect()
    t0 = time.perf_counter()
    df.select(F.xxhash64(F.col("id") + 1).alias("h")).agg(
        F.sum(F.pmod(F.col("h"), F.lit(1_000_000)))
    ).collect()
    dt = time.perf_counter() - t0
    print(
        f"spark cpu probe: {dt:.2f}s at master={spark.sparkContext.master} "
        f"defaultParallelism={spark.sparkContext.defaultParallelism}"
    )
    return dt


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def raw_ceiling() -> None:
    import multiprocessing as mp

    burn = _burn
    base = None
    for procs in (1, 8, 32):
        t0 = time.perf_counter()
        with mp.Pool(procs) as p:
            p.map(burn, [20_000_000] * procs)
        dt = time.perf_counter() - t0
        base = base or dt
        eff = procs * base / dt
        print(
            f"raw burn procs={procs}: {dt:.2f}s "
            f"(~{eff:.0f} effective cores at this width)"
        )


if __name__ == "__main__":
    spark_probe()
    raw_ceiling()
