"""Retail-analytics wave: market-basket affinity (co-occurrence +
lift) and deterministic surrogate/fingerprint keys.

Market-basket is the classic "self-join inside a group" shape — the
engine's version keeps the pair explosion bounded by deduplicating to
(order, part) first and co-locating the self-join on the order key so
the only wide shuffle is the pair aggregation.  Surrogate keys are the
warehouse-loading primitive the reference's id passthrough
(`task.ts:106`) implies but never needed: stable hash keys computed
from business keys, portable across engines (md5 is md5 everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_market_basket",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS pair_count
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), item AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_count FROM li GROUP BY 1
    ), n AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li
    )
    SELECT p.part_a, p.part_b, p.pair_count,
           ia.item_count AS count_a, ib.item_count AS count_b,
           CAST(p.pair_count * n.n_orders AS DOUBLE)
               / CAST(ia.item_count * ib.item_count AS DOUBLE) AS lift
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n
    """,
    headline=True,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in ≥2 orders, with association lift
    = P(a,b) / (P(a)·P(b)) over the order universe.

    Plan shape for scale: dedup to (order, part) first (bounds the
    pair explosion at k² per order, k = basket size), self-join
    co-located on l_orderkey (one shuffle shared by both sides under
    AQE), then aggregate pairs — the only wide exchange whose key
    space is part×part.  Item counts join back
    un-hinted (AQE broadcasts them while they fit; at part-universe
    scale they degrade to shuffle joins instead of OOMing a forced
    broadcast); the scalar order count broadcasts.  At 100 TB the extra lever is frequent-item
    pruning (drop parts below min support before pairing), which only
    shrinks the data and is omitted here to keep the oracle exact.
    Lift is an exact integer ratio evaluated in one double division —
    row-level IEEE-identical across engines.
    """
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import pin_frame

    # li pinned (r14, knowledge #16): both self-join sides, the item
    # counts and the order count all consume the distinct (order,
    # part) frame — unpinned, the scan + dedup ran once per consumer
    # (measured: two duplicate map stages + three 1.8 s reducer-side
    # dedups of the same exchange).  A basket-array rewrite (one
    # orderkey shuffle, in-row a<b pair generation) was ALSO tried
    # and reverted: 3.35 s vs 2.56 s — transform/slice/flatten are
    # interpreted CodegenFallback expressions and cost more than the
    # co-located self-join they replaced.
    li = pin_frame(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= 2)
    )
    item = li.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("item_count")
    )
    n = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("item_count").alias("count_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("item_count").alias("count_b")
    )
    # NO broadcast hint on the item-count sides: their cardinality is
    # the part universe (unbounded at 100 TB — a forced broadcast
    # would OOM the driver); AQE picks broadcast-hash while they fit
    # and degrades to a shuffle join when they don't (code-review r6).
    # The scalar n_orders row stays an explicit broadcast.
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            "count_a",
            "count_b",
            (
                (F.col("pair_count") * F.col("n_orders")).cast("double")
                / (F.col("count_a") * F.col("count_b")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "q_surrogate_key",
    oracle="""
    SELECT o_orderkey,
           md5(concat_ws('|', 'orders', CAST(o_orderkey AS VARCHAR))) AS sk,
           md5(concat_ws('|',
                         CAST(o_custkey AS VARCHAR),
                         o_orderstatus,
                         o_orderpriority,
                         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))) AS row_fp
    FROM orders
    """,
)
def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key + row fingerprint per order.

    The warehouse-load primitive behind SCD/CDC (see q_scd2,
    q_cdc_merge): a stable hash of the business key gives a
    cluster-reproducible surrogate (no monotonically_increasing_id —
    that is partition-layout-dependent and unusable as a durable key),
    and a fingerprint over the tracked attributes detects changed rows
    without comparing column-by-column.  Pure codegen'd hash work per
    row, embarrassingly parallel, no shuffle at all.  The fingerprint
    deliberately covers only string/int/timestamp columns — float
    rendering is engine-specific and has no place in a hash input.
    """
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.md5(
            F.concat_ws("|", F.lit("orders"), F.col("o_orderkey").cast("string"))
        ).alias("sk"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            )
        ).alias("row_fp"),
    )
