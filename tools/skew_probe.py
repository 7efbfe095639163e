"""Key-skew probe: rebuild the 10x replica set with deliberately HOT
keys, then measure how each shuffle shape degrades and which mitigation
catches it.

Skew injected (deterministic hash selectors, no RNG):
- lineitem: 50% of rows collapse onto ONE l_orderkey (a 3M-line order
  at 10x, ~16x the median partition) — join-side skew for the
  orderkey shuffles.  At local-box data sizes the hot partition is
  still below AQE's default 256 MB split threshold, so the SMJ runs
  compress the regime (skewedPartitionThresholdInBytes=8m,
  advisoryPartitionSizeInBytes=4m) to make the splitter face the same
  relative imbalance it would at cluster scale with defaults.
- events: 10% of rows collapse onto ONE user_id — partition skew for
  the user-keyed window / session shuffles (AQE cannot split these:
  window semantics pin a key to one task).
- documents: 10% of rows share identical text — hot digest for the
  dedup groupBy (map-side partial aggregation absorbs it).

Measured queries and why:
- q_sql_tpch_q5: under default AQE every dim side broadcasts, so the
  hot orderkey never shuffles (skew-immune by plan shape).  The probe
  ALSO forces sort-merge joins (broadcast thresholds -1, the 100 TB
  regime where orders no longer fits) and times skewJoin splitting
  OFF vs ON — the AQE mitigation the session factory relies on.
- q_join_asof / q_stream_session: single user_id shuffle into a
  window / session-window — the shapes where AQE skew splitting does
  NOT apply; the probe records the measured degradation bound (hot
  task does O(hot_n log hot_n) local work).
- q_dedup_exact: hot digest groupBy — partial aggregation combines
  map-side, so the hot key arrives pre-collapsed (skew-immune).

q_market_basket is EXCLUDED by design: its output is quadratic in
basket size (a 600k-line basket means ~2*10^11 pairs semantically,
not a placement problem); the documented lever is min-support pruning
before pairing, not shuffle mitigation.

Usage: python tools/skew_probe.py [n_copies]   (default 10)
       python tools/skew_probe.py --shared-prefix [n_copies]
           run ONLY the rank shared-prefix ladder (VERDICT r9 #1c):
           a 50%-hot primary whose tiebreaks all share a one-domain
           URL prefix — the shape the r9 adaptive offset exists to
           split — measured unsplit vs sub-bucketed, with a full
           exactness check against the single-partition window.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_caltopo_spark.io import TABLES, load_table
from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark
from tools.scale_probe import build_scaled

HOT_ORDERKEY = 1
HOT_USER = 1
HOT_TEXT = (
    "the hot duplicate document every tenth row collapses onto for the "
    "skew probe corpus"
)

#: fraction selectors — deterministic, engine-side hash, no RNG
def _frac(pct: int, *cols):
    return F.abs(F.hash(*[F.col(c) for c in cols])) % 100 < pct


_TENTH = lambda *cols: _frac(10, *cols)  # noqa: E731


def build_skewed(spark, n_copies: int, base_dir: str, out_dir: str) -> None:
    """Derive the skewed tables from the balanced replica set."""
    for t in TABLES:
        path = f"{out_dir}/{t}.parquet"
        if os.path.exists(path):
            continue
        df = load_table(spark, base_dir, t)
        if t == "lineitem":
            df = df.withColumn(
                "l_orderkey",
                F.when(
                    _frac(50, "l_orderkey", "l_linenumber"), F.lit(HOT_ORDERKEY)
                ).otherwise(F.col("l_orderkey")),
            )
        elif t == "events":
            df = df.withColumn(
                "user_id",
                F.when(_TENTH("event_id"), F.lit(HOT_USER)).otherwise(
                    F.col("user_id")
                ),
            )
        elif t == "documents":
            df = df.withColumn(
                "text",
                F.when(_TENTH("doc_id"), F.lit(HOT_TEXT)).otherwise(F.col("text")),
            )
        df.write.mode("overwrite").parquet(path)


def time_query(spark, name: str, sf_dir: str) -> float:
    spec = REGISTRY[name]
    spec.fn(spark, sf_dir).count()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def shared_prefix_ladder(spark, base_dir: str) -> None:
    """Rank shared-prefix skew ladder (VERDICT r9 #1c): 50% of the 10x
    orders frame collapses onto ONE o_totalprice, and the tiebreak is a
    one-domain URL (`https://example.com/<zero-padded orderkey>`) — the
    exact shape that re-collapsed the hot task under the pre-r9 fixed
    7-byte proxy.  Measures max bucket rows + hot-value sub-bucket
    spread + wall for unsplit vs adaptive-offset sub-bucketed, then
    checks the sub-bucketed global_row_number bit-exact against the
    single-partition window (feasible at probe scale; the tests pin it
    at unit scale)."""
    from pyspark.sql import Window

    from etl_caltopo_spark.operators.rank import (
        BUCKET_COL,
        global_row_number,
        with_value_buckets,
    )

    HOT = 123456.78
    orders = load_table(spark, base_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    hot = (
        orders.withColumn(
            "o_totalprice",
            F.when(F.pmod("o_orderkey", 2) == 0, F.lit(HOT)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("https://example.com/"),
                F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            ),
        )
        .localCheckpoint(eager=True)
    )
    n = hot.count()
    print(f"| rank shared-prefix probe | rows={n} | target n/32={n // 32} | |")
    for tb in (None, "url"):
        b = with_value_buckets(hot, "o_totalprice", buckets=32, tiebreak=tb)
        mx = max(r["count"] for r in b.groupBy(BUCKET_COL).count().collect())
        spread = (
            b.filter(F.col("o_totalprice") == HOT)
            .select(BUCKET_COL)
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        got = global_row_number(
            hot,
            "o_totalprice",
            [F.col("o_totalprice"), F.col("url")],
            rn_col="rn",
            tiebreak=tb,
        )
        got.select(F.max("rn")).collect()
        dt = time.perf_counter() - t0
        label = "adaptive-offset sub-bucketed" if tb else "unsplit"
        print(
            f"| rank 50%-hot URL tiebreak ({label}) | max task {mx} rows "
            f"({mx * 100 // n}%), hot spread {spread} | {dt:.2f} s | buckets=32 |"
        )
    # exactness: sub-bucketed output vs the single-partition window
    ref = hot.withColumn(
        "rn_ref", F.row_number().over(Window.orderBy("o_totalprice", "url"))
    ).select("o_orderkey", "rn_ref")
    mismatches = (
        got.select("o_orderkey", "rn")
        .join(ref, "o_orderkey")
        .filter(F.col("rn") != F.col("rn_ref"))
        .count()
    )
    print(f"| rank shared-prefix exactness | mismatches vs window: {mismatches} | | |")
    assert mismatches == 0, f"{mismatches} rank mismatches vs window reference"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--shared-prefix"]
    only_shared_prefix = "--shared-prefix" in sys.argv[1:]
    n = int(args[0]) if args else 10
    base_dir = f"/tmp/spark_graft_scale_{n}x"
    skew_dir = f"/tmp/spark_graft_skew_{n}x"
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(skew_dir, exist_ok=True)
    spark = build_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, n, base_dir)
    if only_shared_prefix:
        shared_prefix_ladder(spark, base_dir)
        return
    build_skewed(spark, n, base_dir, skew_dir)

    def set_conf(**kv):
        for k, v in kv.items():
            spark.conf.set(k, v)

    print("| query | balanced 10x (s) | skewed 10x (s) | config |")
    print("|---|---|---|---|")
    for name in ("q_join_asof", "q_stream_session", "q_dedup_exact"):
        tb = time_query(spark, name, base_dir)
        ts = time_query(spark, name, skew_dir)
        print(f"| {name} | {tb:.2f} | {ts:.2f} | default (AQE on) |")

    # q5 under default AQE (dims broadcast — skew-immune shape)
    tb = time_query(spark, "q_sql_tpch_q5", base_dir)
    ts = time_query(spark, "q_sql_tpch_q5", skew_dir)
    print(f"| q_sql_tpch_q5 | {tb:.2f} | {ts:.2f} | default (AQE broadcast) |")

    # q5 forced to sort-merge joins (the beyond-broadcast regime):
    # skew splitting OFF vs ON
    forced = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # compress the skew regime to local data sizes (see module doc)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    }
    for skew_on in (False, True):
        set_conf(
            **forced,
            **{"spark.sql.adaptive.skewJoin.enabled": str(skew_on).lower()},
        )
        tb = time_query(spark, "q_sql_tpch_q5", base_dir)
        ts = time_query(spark, "q_sql_tpch_q5", skew_dir)
        label = "forced SMJ, AQE skew split " + ("ON" if skew_on else "OFF")
        print(f"| q_sql_tpch_q5 | {tb:.2f} | {ts:.2f} | {label} |")
    # restore
    for k in forced:
        spark.conf.unset(k)
    set_conf(**{"spark.sql.adaptive.skewJoin.enabled": "true"})

    # Salted-join ladder (round 5, q_join_skew_salted): under the hot
    # orderkey (50% of lineitem on ONE key) with joins forced to
    # sort-merge and AQE skew splitting disabled — the regime where the
    # manual mitigation is the only one left — compare the plain
    # fact-dim join+agg against the 8-way salted plan.  Both produce
    # identical aggregates (hash-graded); the delta is pure placement.
    def plain_join_agg(sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        return (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue"),
            )
        )

    def time_df(build, sf_dir):
        build(sf_dir).count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            build(sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        return best

    salt_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    set_conf(**salt_conf)
    salted = REGISTRY["q_join_skew_salted"].fn
    tp = time_df(plain_join_agg, skew_dir)
    tsalt = time_df(lambda d: salted(spark, d), skew_dir)
    print(f"| plain join+agg (hot key) | - | {tp:.2f} | forced SMJ, skew split OFF |")
    print(f"| q_join_skew_salted (hot key) | - | {tsalt:.2f} | forced SMJ, skew split OFF |")
    for k in salt_conf:
        spark.conf.unset(k)
    set_conf(**{"spark.sql.adaptive.skewJoin.enabled": "true"})

    # Rank-operator hot-value ladder (round 8): a 50%-hot primary on
    # the 10x orders frame, with and without tiebreak sub-bucketing —
    # the per-task bound and wall time the r8 VERDICT item asked for,
    # reproducible here instead of as an ad-hoc probe.
    from etl_caltopo_spark.operators.rank import (
        BUCKET_COL,
        global_row_number,
        with_value_buckets,
    )

    orders = load_table(spark, base_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    hot = orders.withColumn(
        "o_totalprice",
        F.when(F.pmod("o_orderkey", 2) == 0, F.lit(123456.78)).otherwise(
            F.col("o_totalprice")
        ),
    ).localCheckpoint(eager=True)
    n = hot.count()
    print(f"| rank hot-value probe | rows={n} | target n/32={n // 32} | |")
    for tb in (None, "o_orderkey"):
        b = with_value_buckets(hot, "o_totalprice", buckets=32, tiebreak=tb)
        mx = max(
            r["count"] for r in b.groupBy(BUCKET_COL).count().collect()
        )
        t0 = time.perf_counter()
        global_row_number(
            hot,
            "o_totalprice",
            [F.col("o_totalprice"), F.col("o_orderkey")],
            rn_col="rn",
            tiebreak=tb,
        ).select(F.max("rn")).collect()
        dt = time.perf_counter() - t0
        label = "sub-bucketed" if tb else "unsplit"
        print(
            f"| rank 50%-hot ({label}) | max task {mx} rows "
            f"({mx * 100 // n}%) | {dt:.2f} s | buckets=32 |"
        )

    shared_prefix_ladder(spark, base_dir)


if __name__ == "__main__":
    main()
