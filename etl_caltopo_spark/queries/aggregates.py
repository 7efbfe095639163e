"""Aggregation queries (SURVEY §2.3 "Aggregations", all [EXT]).

The reference has no aggregations; these are the standard completion.
Catalyst plans all of them as partial (map-side) + final aggregates —
the shuffle carries only group keys + partial states, which is why the
shapes below stay cheap at 100 TB.

Float-precision note (SURVEY §7.4 risk table): the source columns sit
exactly on a 2-decimal grid, so ``round(sum(x), grid_dp)`` recovers the
true decimal sum identically in both engines regardless of summation
order (error << half-grid).  Averages are expressed as
``round(sum)/count`` — an IEEE-exact division of identical doubles —
instead of ``avg()``, whose raw result is order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_quantity), 2) / count(*) AS avg_qty,
           round(sum(l_extendedprice), 2) / count(*) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sum/avg/count with an arithmetic
    expression inside the aggregate."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — Catalyst expands to a two-phase aggregate."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q_agg_approx",
    oracle=None,
    note="HLL sketch values are engine-specific; driver records rows-only.",
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the sketch path that
    replaces exact distinct at 100 TB (no exact oracle by design)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotal rows carry nulls in the grouping
    columns; both group columns are non-null in the data so the null
    encoding is unambiguous).

    EMPTY-INPUT portability (empty-tables sweep r13): Spark expands
    grouping sets via Expand + one keyed groupBy, so ROLLUP over an
    EMPTY table emits 0 rows — SQL semantics (and DuckDB) emit the
    global () row with count 0.  The portable form keeps the rollup
    for the keyed sets (grouping_id != 3) and UNIONS an explicit
    global aggregate for the () set, which yields its one row on
    empty input in both engines; on non-empty data the union is
    row-for-row identical to the plain rollup (same partial-agg
    shuffle shape — the global branch adds one map-side-combined
    scalar aggregate)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    keyed = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping_id().alias("_gid"),
        )
        # _gid 3 = both columns aggregated = the () grouping set;
        # a data-NULL l_returnflag group keeps _gid 0/1 (nullkeys r12)
        .filter(F.col("_gid") != 3)
        .drop("_gid")
    )
    global_row = li.agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "sum_qty",
        "n_rows",
    )
    return keyed.unionByName(global_row)


@query(
    "q_agg_global",
    oracle="""
    SELECT round(sum(o_totalprice), 2) AS total_revenue,
           round(sum(o_totalprice), 2) / count(*) AS avg_order,
           CAST(count(*) AS BIGINT) AS n_orders,
           min(o_totalprice) AS min_order,
           max(o_totalprice) AS max_order
    FROM orders
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate — partials combine to a single row."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_order"),
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_order"),
        F.max("o_totalprice").alias("max_order"),
    )
