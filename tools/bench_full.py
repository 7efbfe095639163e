"""Time EVERY registered query id with the noop sink (guide §1.4).

Produces the ranked cost list the optimization rounds work from:

    python tools/bench_full.py [--sf DIR] [--passes N] [--json PATH] [q ...]

Timing = wall time of ``df.write.format("noop").mode("overwrite")
.save()`` on a warm session — forces every column of every row, unlike
``count()`` which lets Catalyst prune columns (and sometimes whole
subtrees).  One warm-up pass then ``--passes`` interleaved measurement
passes (median reported), mirroring bench.py's drift-proofing protocol.

Jobs are labeled via ``setJobDescription`` so the Spark UI maps stages
back to ids.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark


def noop_time(spark, name: str, sf_dir: str) -> float:
    spark.sparkContext.setJobDescription(f"bench_full: {name}")
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query ids (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = args.names or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown ids: {unknown}", file=sys.stderr)
        return 2

    spark = build_spark(app_name="etl-caltopo-spark-bench-full")
    spark.sparkContext.setLogLevel("ERROR")

    samples: dict[str, list[float]] = {n: [] for n in names}
    errs: dict[str, str] = {}
    # Warm-up pass (codegen compilation), then measured passes in
    # deterministic shuffled orders (decorrelates box drift).
    rng = random.Random(0xB14C)
    for p in range(args.passes + 1):
        order = list(names)
        rng.shuffle(order)
        for n in order:
            try:
                dt = noop_time(spark, n, args.sf)
            except Exception as exc:  # keep going; record the failure
                errs[n] = f"{type(exc).__name__}: {exc}"[:300]
                continue
            if p > 0:
                samples[n].append(dt)
            else:
                print(f"warmup {n}: {dt:.3f}s", file=sys.stderr)

    med: dict[str, float] = {}
    for n in names:
        s = sorted(samples[n])
        if s:
            med[n] = round(s[len(s) // 2], 3)
    ranked = dict(sorted(med.items(), key=lambda kv: -kv[1]))
    out = {
        "sf": args.sf,
        "passes": args.passes,
        "total": round(sum(med.values()), 3),
        "errors": errs,
        "queries": ranked,
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
