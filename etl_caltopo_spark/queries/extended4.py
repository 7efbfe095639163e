"""Fourth extended wave: deterministic mode, boolean aggregates,
linear-regression aggregates, and a blocked fuzzy (edit-distance)
self-join — the entity-resolution building block.

Reference basis: the reference has no aggregates at all (SURVEY §2.1
— the only join is the folder lookup, task.ts:142-152); these widen
the standard-relational completion ([EXT+]) so a reference user finds
every aggregate family a complete engine implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import (
    fround,
    sql_variance_safe,
    variance_safe,
)
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderstatus
            ORDER BY n DESC, o_orderpriority) AS rn
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n_rows
    FROM r WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties broken
    by lexicographic min) as count + row_number — the builtin mode()
    is tie-nondeterministic in both engines, so the composed form IS
    the portable implementation.  One shuffle: the count groupBy; the
    window repartitions on the (narrower) group key."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("bigint").alias("n_rows"),
        )
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_low_discount,
           bool_or(l_tax > 0.07) AS any_high_tax,
           bool_and(l_quantity < 50) AS all_qty_lt50
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or == SQL EVERY / ANY) —
    predicate summaries over groups; exact (no floats)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_discount"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bool_and(F.col("l_quantity") < 50).alias("all_qty_lt50"),
    )


@query(
    "q_agg_regr",
    oracle=f"""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pts,
           floor(regr_slope(l_extendedprice, l_quantity) * 10000) / 10000
               AS price_per_qty,
           floor(regr_intercept(l_extendedprice, l_quantity) * 10000) / 10000
               AS base_price,
           floor(regr_r2(l_extendedprice, l_quantity) * 10000) / 10000
               AS r2
    FROM lineitem
    WHERE {sql_variance_safe("l_extendedprice")}
      AND {sql_variance_safe("l_quantity")}
    GROUP BY l_returnflag
    """,
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope / intercept / r2 /
    count) — the SQL:2003 bivariate fitting family, one shuffle with
    partial aggregation.  4-dp floor-scaling absorbs the sub-1e-10
    summation-order difference (same policy as q_agg_corr, including
    the variance-domain bound: DuckDB's regr accumulators raise
    OutOfRange past |x| ~1e100 where Spark yields NaN — extremes r11
    wave 2)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        variance_safe(F.col("l_extendedprice"))
        & variance_safe(F.col("l_quantity"))
    )
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n_pts"),
        fround(F.regr_slope(y, x), 4).alias("price_per_qty"),
        fround(F.regr_intercept(y, x), 4).alias("base_price"),
        fround(F.regr_r2(y, x), 4).alias("r2"),
    )


@query(
    "q_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a, part b
    WHERE a.p_brand = b.p_brand
      AND a.p_partkey < b.p_partkey
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    headline=True,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: equi-join on the blocking key
    (p_brand) with an edit-distance post-filter — the canonical
    entity-resolution / fuzzy-dedup shape.

    Scale design (8.5x over the naive row-level join at sf0.1):
    the quadratic distance computation runs on DISTINCT (brand, name)
    pairs only — real catalogs repeat names heavily, so this shrinks
    the Levenshtein fan-in from |rows|^2 to |distinct names|^2 per
    block — then the verdicts are expanded back to row pairs with
    equi-joins.  Two safe prunes keep even the distinct stage cheap: a
    length-difference band (|len(a)-len(b)| <= 3 is implied by edit
    distance <= 3) short-circuits before the DP, and the thresholded
    levenshtein(l, r, 3) early-terminates its band.  The block key
    keeps every join a hash join (never a cartesian product); at
    100 TB only the distinct-name table rides the quadratic term.

    Broadcast policy: only ``name_pairs`` — the thresholded survivors,
    tiny by construction — carries an explicit broadcast hint.  The
    part-sized sides (distinct names, the part table itself) shuffle
    as brand-keyed hash joins / get AQE-promoted when small; hinting
    them would be a broadcast OOM at 100x scale."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name"
    )
    names = part.select("p_brand", "p_name").distinct()
    na = names.select(
        F.col("p_brand").alias("brand"), F.col("p_name").alias("name_a")
    )
    nb = names.select(
        F.col("p_brand").alias("brand_b"), F.col("p_name").alias("name_b")
    )
    d3 = F.levenshtein(F.col("name_a"), F.col("name_b"), 3)
    name_pairs = (
        na.join(nb, F.col("brand") == F.col("brand_b"))
        .filter(
            (F.abs(F.length("name_a") - F.length("name_b")) <= 3) & (d3 >= 0)
        )
        .select("brand", "name_a", "name_b", d3.cast("int").alias("edit_dist"))
    )
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(F.broadcast(name_pairs), ["brand", "name_a"])
        .join(b, ["brand", "name_b"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


@query(
    "q_skyline",
    oracle="""
    SELECT a.p_partkey, a.p_name, a.p_retailprice, CAST(a.p_size AS INTEGER) AS p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) on (price ↓, size ↓): parts no other
    part weakly dominates with one strict improvement — multi-objective
    top-k.  Graded plan is the sort-based sweep (see q_skyline_sweep's
    docstring for the shape) — the non-equi anti-join formulation is
    retained only as the test-only baseline skyline_nested_loop; it is
    a BroadcastNestedLoopJoin and must never be the plan you'd run at
    100×."""
    apply_runtime_conf(spark)
    return _skyline_sweep(load_table(spark, sf_dir, "part"))


def skyline_nested_loop(part: DataFrame) -> DataFrame:
    """Test-only exact baseline: dominance as a non-equi anti-join
    (BroadcastNestedLoopJoin, O(n²)).  tests/test_extended_ops.py
    asserts _skyline_sweep matches it row-for-row."""
    a, b = part.alias("a"), part.alias("b")
    dominated = (
        (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
        & (F.col("b.p_size") <= F.col("a.p_size"))
        & (
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            | (F.col("b.p_size") < F.col("a.p_size"))
        )
    )
    return a.join(b, dominated, "left_anti").select(
        F.col("a.p_partkey").alias("p_partkey"),
        F.col("a.p_name").alias("p_name"),
        F.col("a.p_retailprice").alias("p_retailprice"),
        F.col("a.p_size").cast("int").alias("p_size"),
    )


def _skyline_sweep(part: DataFrame) -> DataFrame:
    """Shared sweep implementation — see q_skyline_sweep docstring."""
    part = part.withColumn(
        "price_cents", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    prices = part.groupBy("price_cents").agg(F.min("p_size").alias("_gmin"))
    w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    prices = prices.withColumn("_prefix_lt", F.min("_gmin").over(w))
    joined = part.join(prices, "price_cents")
    dominated = (F.col("_prefix_lt") <= F.col("p_size")) | (
        F.col("_gmin") < F.col("p_size")
    )
    return joined.filter(~F.coalesce(dominated, F.lit(False))).select(
        "p_partkey",
        "p_name",
        "p_retailprice",
        F.col("p_size").cast("int").alias("p_size"),
    )


@query(
    "q_skyline_sweep",
    oracle="""
    SELECT a.p_partkey, a.p_name, a.p_retailprice, CAST(a.p_size AS INTEGER) AS p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
)
def q_skyline_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB skyline path — same answer as q_skyline (identical
    oracle), sweep-based instead of the O(n²) nested-loop anti-join.

    A point is dominated iff (a) some strictly-cheaper point has size
    <= its size, or (b) some same-price point has size strictly
    smaller.  Both predicates reduce to per-price minima: one
    aggregation shuffled on the exact price key produces (price,
    group-min); a prefix-min window over that DISTINCT-price table
    (bounded by price cardinality — cents on a bounded range — never
    by |part|) yields the strictly-cheaper min; the verdict joins
    back as a price-keyed equi-join.  The fact table is never
    window-sorted into one partition and never nested-looped —
    O(n log n) total, one fact shuffle."""
    apply_runtime_conf(spark)
    return _skyline_sweep(load_table(spark, sf_dir, "part"))


@query(
    "q_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity), 2) / sum(l_quantity)
               AS wavg_price,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_quantity IS NULL
       OR (isfinite(l_quantity)
           AND abs(l_quantity) < 9.223372036854776e18)
    GROUP BY l_returnflag
    """,
)
def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price (the VWAP shape): sum of
    grid-exact products over sum of integral weights, one partial-
    aggregating shuffle.  round(sum, 2) recovers the exact grid sum
    before the division, so the quotient is bit-identical.

    The weight total is an exact int64 by contract, so weights OFF
    the int64 grid (NaN/±inf/huge — extremes r11 wave 2: the BIGINT
    cast raises in BOTH engines on them) are excluded."""
    apply_runtime_conf(spark)
    qty_ok = F.col("l_quantity").isNull() | (
        ~F.isnan("l_quantity")
        & (F.abs("l_quantity") < F.lit(9.223372036854776e18))
    )
    li = load_table(spark, sf_dir, "lineitem").where(qty_ok)
    return li.groupBy("l_returnflag").agg(
        (
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
            / F.sum("l_quantity")
        ).alias("wavg_price"),
        F.sum("l_quantity").cast("bigint").alias("total_qty"),
    )
