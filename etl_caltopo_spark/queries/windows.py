"""Window-function + sort/limit/top-k queries (SURVEY §2.3, all [EXT]).

Determinism note: every window/sort order includes a unique tiebreaker
(orderkey/custkey) so boundary rows hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.operators.topk import top_k, top_k_per_group
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey, o_custkey,
               floor(o_totalprice * 100) / 100 AS total,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
               CAST(rank() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer via row_number."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            fround(F.col("o_totalprice"), 2).alias("total"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor((o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey)) * 100) / 100 AS delta_prev,
           floor(lead(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) * 100) / 100 AS next_total
    FROM orders
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over a per-customer order timeline."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        fround(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
        fround(F.lead("o_totalprice").over(w), 2).alias("next_total"),
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
    headline=True,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec running sum (cumulative revenue per customer)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_sort",
    oracle="""
    SELECT o_orderkey, floor(o_totalprice * 100) / 100 AS total, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (range-partitioned exchange + per-partition sort)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", fround(F.col("o_totalprice"), 2).alias("total"), "o_orderdate"
    ).orderBy(F.col("total").desc(), F.col("o_orderkey"))


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, floor(o_totalprice * 100) / 100 AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — compiles to TakeOrderedAndProject (per-partition
    heap, no full sort)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    projected = orders.select(
        "o_orderkey", fround(F.col("o_totalprice"), 2).alias("total")
    )
    return top_k(projected, [F.col("total").desc(), F.col("o_orderkey")], 10)


@query(
    "q_topk_pergroup",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, c_custkey,
               floor(c_acctbal * 100) / 100 AS acctbal,
               CAST(row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
    headline=True,
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (row_number pattern over the group window)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", fround(F.col("c_acctbal"), 2).alias("acctbal")
    )
    return top_k_per_group(
        cust,
        partition_by=["c_mktsegment"],
        order_by=[F.col("acctbal").desc(), F.col("c_custkey")],
        k=5,
    )
