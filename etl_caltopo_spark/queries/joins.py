"""Join queries (SURVEY §2.3 "Joins").

The reference's only join is the broadcast folder lookup
(/root/reference/task.ts:142-152); the rest are the standard
relational completion ([EXT]).  nation/region stand in for the folders
dimension (FIXTURES.md role mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.operators.joins import asof_join, broadcast_lookup_join
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_broadcast_left_join",
    oracle="""
    SELECT c.c_custkey,
           '/' || n.n_name AS path
    FROM customer c
    LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <= 2) n
      ON c.c_nationkey = n.n_nationkey
    """,
)
def q_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast left lookup join + derived path column (ref
    task.ts:142-152).  The dimension is filtered so some fact rows
    dangle — those keep a null path (quirk Q5: dangling folderId ⇒ no
    path)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 2)
    joined = broadcast_lookup_join(
        cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "left"
    )
    return joined.select(
        "c_custkey",
        F.concat(F.lit("/"), F.col("n_name")).alias("path"),
    )


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
           floor(o.o_totalprice * 100) / 100 AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join ([EXT]); AQE picks the physical strategy."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "inner")
        .select(
            "o_orderkey",
            "c_custkey",
            "c_mktsegment",
            fround(F.col("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) / count(*) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    headline=True,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimension join chain + aggregate — the flagship query
    (SURVEY §7.2): filter-free customer ⋈ nation ⋈ region with a group
    count, the relational rendering of the reference's
    feature→folder→path flow.  Both dims broadcast: zero fact-side
    shuffles before the aggregation."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    return joined.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_acctbal"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ([EXT]: the "has folder" predicate of quirk Q5)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return cust.join(
        big_orders, cust["c_custkey"] == big_orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ([EXT]: the "dangling folderId" predicate)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return cust.join(
        big_orders, cust["c_custkey"] == big_orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_join_range",
    oracle="""
    SELECT c.c_custkey, s.s_suppkey,
           floor(abs(c.c_acctbal - s.s_acctbal) * 100) / 100 AS bal_diff
    FROM customer c
    JOIN supplier s
      ON c.c_acctbal BETWEEN s.s_acctbal - 10.0 AND s.s_acctbal + 10.0
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join ([EXT]).  The small side (supplier) broadcasts
    → BroadcastNestedLoopJoin; the big side streams without a shuffle.
    At cluster scale a band-bucketed equi-join prefilter (join on
    floor(bal/10) buckets ±1) bounds the pair count — kept simple here
    because supplier is a dimension."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cond = cust["c_acctbal"].between(supp["s_acctbal"] - 10.0, supp["s_acctbal"] + 10.0)
    return cust.join(F.broadcast(supp), cond, "inner").select(
        "c_custkey",
        "s_suppkey",
        fround(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias("bal_diff"),
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    headline=True,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join ([EXT], SURVEY §2.3): each purchase gets the
    latest click at-or-before it by the same user.  Union+window
    formulation — one shuffle on user_id, no range-join explosion."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        partition_keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=[],
        prefix="last_click_",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_click_ts"),
    )

@query(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         b AS (SELECT p.event_id, p.user_id, p.ts, cb.ts AS back_ts
               FROM p ASOF LEFT JOIN c cb
                 ON p.user_id = cb.user_id AND p.ts >= cb.ts),
         f AS (SELECT p.event_id, cf.ts AS fwd_ts
               FROM p ASOF LEFT JOIN c cf
                 ON p.user_id = cf.user_id AND p.ts <= cf.ts)
    SELECT b.event_id AS purchase_id,
           b.user_id,
           b.ts AS purchase_ts,
           CASE WHEN fwd_ts IS NULL THEN back_ts
                WHEN back_ts IS NULL THEN fwd_ts
                WHEN epoch_us(b.ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(b.ts) THEN back_ts
                ELSE fwd_ts END AS nearest_click_ts
    FROM b JOIN f ON b.event_id = f.event_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-either-direction as-of join ([EXT], VERDICT r9 #6):
    each purchase gets the click closest in time by the same user,
    backward OR forward, ties on absolute distance to the earlier
    (backward) click — the sensor-alignment variant of q_join_asof
    (a backward-only as-of misattributes a purchase that follows a
    click by hours but precedes one by seconds).

    Scale shape: identical to q_join_asof — ONE shuffle on user_id,
    both directional candidates computed by two window functions over
    the same exchange + sort (operators/joins.py asof_join_nearest),
    no range-join pair explosion.  The oracle replays it as DuckDB's
    native two-directional ASOF JOIN pair + CASE, distances in exact
    integer epoch microseconds on both engines."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.joins import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join_nearest(
        purchases,
        clicks,
        partition_keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=[],
        prefix="nearest_click_",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("nearest_click_ts"),
    )
