"""Second extended wave: the remaining standard-SQL surface — outer/
cross joins, INTERSECT ALL / UNION DISTINCT, first/last/nth window
values, string/bitwise/math families, HAVING, explicit GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import (
    finite,
    fround,
    sql_variance_safe,
    variance_safe,
)
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_join_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, -1) AS custkey,
           c.c_name,
           agg.n_orders
    FROM customer c
    FULL OUTER JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_totalprice > 90000 GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: customers without big orders keep null counts,
    (hypothetical) orphan order groups keep null names."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    agg = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 90000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    joined = cust.join(agg, cust["c_custkey"] == agg["o_custkey"], "full_outer")
    return joined.select(
        F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("custkey"),
        "c_name",
        "n_orders",
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of a dimension with itself (route matrix)."""
    apply_runtime_conf(spark)
    region = load_table(spark, sf_dir, "region")
    a = region.select(F.col("r_regionkey").alias("ka"), F.col("r_name").alias("from_region"))
    b = region.select(F.col("r_regionkey").alias("kb"), F.col("r_name").alias("to_region"))
    return (
        a.crossJoin(b)
        .filter(F.col("ka") != F.col("kb"))
        .select("from_region", "to_region")
    )


_RICH_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
_BUILDING_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@query("q_set_intersect_all", oracle=f"{_RICH_SQL} INTERSECT ALL {_BUILDING_SQL}")
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return rich.intersectAll(bld)


@query("q_set_union_distinct", oracle=f"{_RICH_SQL} UNION {_BUILDING_SQL}")
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dropDuplicates collapse."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return rich.unionByName(bld).distinct()


@query(
    "q_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a column pair."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "q_window_firstlast",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order,
           nth_value(o_orderkey, 2) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over per-customer timelines
    (full-partition frames so last/nth are well-defined)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@query(
    "q_string_pad",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(c_mktsegment, 12, '.') AS padded_seg,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           reverse(c_mktsegment) AS rev_seg,
           repeat('-', 5) AS dashes
    FROM customer
    """,
)
def q_string_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/replace/reverse/repeat."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.repeat(F.lit("-"), 5).alias("dashes"),
    )


@query(
    "q_bitwise",
    oracle="""
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           (user_id % 1099511627776) << 2 AS shifted_l,
           user_id >> 1 AS shifted_r
    FROM events
    """,
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shifts.

    The left-shift operand is bounded mod 2^40 on BOTH sides (bigids
    r14): at snowflake-scale ids `id << 2` is an ENGINE DIVERGENCE —
    Spark's shiftleft wraps bits out silently (Java << semantics)
    where DuckDB raises Out of Range — so the portable form shifts a
    bounded operand; a no-op below 2^40 (HANDOFF knowledge #35)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("mixed"),
        F.shiftleft(F.col("user_id") % F.lit(1099511627776), 2).alias(
            "shifted_l"
        ),
        F.shiftright("user_id", 1).alias("shifted_r"),
    )


@query(
    "q_math_advanced",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(exp(l_discount) * 10000) / 10000 AS e_disc,
           floor(log10(l_extendedprice) * 10000) / 10000 AS log10_price,
           floor(pow(l_quantity, 2) * 100) / 100 AS qty_sq,
           CASE WHEN isfinite(l_discount)
                THEN CAST(sign(l_discount - 0.05) AS INTEGER) END AS disc_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def q_math_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exp/log10/pow/sign/mod (transcendentals floor-scaled — libm
    results can differ by ulps across engines).  disc_sign is NULL
    for a non-finite discount (extremes r11 wave 2: sign(NaN) = NaN,
    whose INT cast ANSI-raises in Spark and raises in DuckDB); the
    transcendental columns propagate inf/NaN identically through the
    guarded fround."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fround(F.exp("l_discount"), 4).alias("e_disc"),
        fround(F.log10("l_extendedprice"), 4).alias("log10_price"),
        fround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.when(
            finite(F.col("l_discount")),
            F.signum(F.col("l_discount") - 0.05).cast("int"),
        ).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "q_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100, 5.0) AS hi,
           least(l_quantity, l_tax * 100, 50.0) AS lo
    FROM lineitem
    """,
)
def q_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary greatest/least (IEEE-exact comparisons of shared inputs)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100, F.lit(5.0)).alias("hi"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100, F.lit(50.0)).alias("lo"),
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(o_totalprice) > 100000
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("total_spend") > 100000))
    )


@query(
    "q_higher_order",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           CASE WHEN len(list_filter(words, x -> length(x) > 4)) > 0
                THEN TRUE ELSE FALSE END AS has_long,
           CASE WHEN len(list_filter(words, x -> length(x) > 1)) = len(words)
                THEN TRUE ELSE FALSE END AS all_multichar,
           list_transform(words, x -> length(x)) AS word_lens,
           CAST(list_reduce(list_transform(words, x -> length(x)), (a, b) -> a + b)
                AS INTEGER) AS total_chars,
           words[1] AS first_word_again
    FROM w
    """,
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: exists/forall/filter/transform/
    aggregate/zip_with — all lambda evaluation stays in codegen."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    lens = F.transform(words, lambda x: F.length(x))
    return part.select(
        "p_partkey",
        F.exists(words, lambda x: F.length(x) > 4).alias("has_long"),
        F.forall(words, lambda x: F.length(x) > 1).alias("all_multichar"),
        lens.alias("word_lens"),
        F.aggregate(lens, F.lit(0), lambda a, b: a + b).alias("total_chars"),
        F.element_at(
            F.zip_with(words, lens, lambda w, l: w), 1
        ).alias("first_word_again"),
    )


@query(
    "q_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS median_rank_ok,
           TRUE AS p99_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (approx_percentile) — the scale path
    that replaces exact percentile sorting at 100 TB (pairs with
    q_agg_approx's HLL).

    The sketch VALUES are engine-specific (Greenwald-Khanna vs
    t-digest), so the graded output is a rank-error CERTIFICATE: the
    returned quantile's empirical rank interval [count(<v)+1,
    count(<=v)] must sit within eps=0.005 of the requested rank p*n
    (the sketch guarantees 1/accuracy = 0.001; the slack covers
    duplicate-value rank spread).  The oracle asserts the certificate
    holds (TRUE per group) — a broken sketch flips the boolean and
    fails the hash gate.  Raw approx values stay available via the
    ungraded path in tests (test_extended_ops: quantile tolerance vs
    DuckDB exact).  Two passes over lineitem, both codegen; the
    sketch build is the same single shuffle as before."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    appx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("m"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99"),
    )
    # NULL-SAFE join back (nullkeys sweep r12): groupBy keeps a NULL
    # flag group in both engines, but a plain equi-join re-drops it —
    # the certificate must cover every group the oracle GROUP BY sees
    appx2 = appx.select(
        F.col("l_returnflag").alias("_rf"), "m", "p99"
    )
    j = li.join(
        F.broadcast(appx2),
        li["l_returnflag"].eqNullSafe(appx2["_rf"]),
    ).drop("_rf")
    eps = 0.005

    def rank_ok(v: str, p: float):
        # ROW-space certificate (onerow probe r13): the returned
        # value's rank interval [lo, hi] must intersect
        # [ceil(p*n) - eps*n, ceil(p*n) + eps*n].  The previous
        # FRACTION-space form (lo/n - eps <= p <= hi/n + eps) is
        # unsatisfiable at n = 1: the single element has rank
        # fraction 1.0 against p = 0.5 even though the median of one
        # element IS that element.  ceil(p*n) is the standard
        # quantile target rank; at bench n (~20k/group) the two forms
        # differ by under one row of slack, and every sweep mode and
        # scale re-reads identically under the row form.
        lo = F.sum((F.col("l_extendedprice") < F.col(v)).cast("long")) + 1
        hi = F.sum((F.col("l_extendedprice") <= F.col(v)).cast("long"))
        n = F.count("*")
        target = F.ceil(F.lit(p) * n).cast("double")
        slack = F.lit(eps) * n
        return (lo.cast("double") <= target + slack) & (
            hi.cast("double") >= target - slack
        )

    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        rank_ok("m", 0.5).alias("median_rank_ok"),
        rank_ok("p99", 0.99).alias("p99_rank_ok"),
    )


@query(
    "q_agg_corr",
    oracle=f"""
    SELECT l_returnflag,
           floor(corr(l_quantity, l_extendedprice) * 10000) / 10000 AS qty_price_corr,
           floor(covar_samp(l_quantity, l_extendedprice) * 100) / 100 AS qty_price_cov
    FROM lineitem
    WHERE {sql_variance_safe("l_quantity")}
      AND {sql_variance_safe("l_extendedprice")}
    GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (Pearson correlation, sample covariance).

    Pearson is computed as guarded covar_pop/(stddev_pop*stddev_pop)
    — algebraically identical to corr() (the n factors cancel) — NOT
    F.corr: Corr's own evaluateExpression divides by the variance
    product, so a zero-variance group raises DIVIDE_BY_ZERO under
    ANSI Spark even inside a CASE branch (aggregates evaluate before
    the projection applies the guard; r8 degenerate full-registry
    sweep).  DuckDB's corr yields NULL there — the when() matches it.
    covar_samp itself returns NULL/0.0 on degenerate groups in both
    engines (probed), so it stays native.

    PAIRWISE DELETION: the stddevs run over values masked to the rows
    where BOTH columns are non-null — corr() excludes a pair when
    either side is NULL, and a plain stddev_pop(x) would include
    x-values whose partner is NULL (caught by the r8 NULL-injection
    sweep: the naive form diverged from DuckDB corr at the 4-dp floor
    with 2% nulls).

    Variance-domain bound (extremes r11 wave 2): observations with
    |x| ≥ 1e100 on either side are excluded — DuckDB's corr/stddev
    accumulator raises OutOfRange once a squared deviation overflows,
    Spark yields NaN; NaN/±inf order above the bound in both engines
    so the same comparison excludes them too."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        variance_safe(F.col("l_quantity"))
        & variance_safe(F.col("l_extendedprice"))
    )
    both = F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    sx = F.stddev_pop(F.when(both, F.col("l_quantity")))
    sy = F.stddev_pop(F.when(both, F.col("l_extendedprice")))
    pearson = F.when(
        (sx > 0) & (sy > 0),
        F.covar_pop("l_quantity", "l_extendedprice") / (sx * sy),
    )
    return li.groupBy("l_returnflag").agg(
        fround(pearson, 4).alias("qty_price_corr"),
        fround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
    )


@query(
    "q_udaf_geomean",
    oracle="""
    SELECT l_returnflag,
           floor(exp(avg(ln(l_extendedprice))) * (1 + 1e-9) * 100) / 100
               AS geo_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface: Arrow GROUPED_AGG pandas UDF (geometric mean),
    oracle-checked against the exp(avg(ln)) identity.  2-dp floor
    absorbs the sub-1e-10 summation-order difference.

    GRID-ATTRACTOR NUDGE (clones sweep r13): a CONSTANT group's true
    geomean sits EXACTLY on the cent grid (exp(ln v) = v, v a money
    value), so flooring the ±ulp exp/ln round-trip was a per-engine
    coin flip — one engine landed 1e-9 below the boundary, the other
    above.  Both sides scale by (1 + 1e-9) before the floor: on-grid
    true values floor to themselves on both engines, and interior
    values (every non-degenerate group — an irrational mean never
    sits within rel-1e-9 of the grid) are untouched."""
    from etl_caltopo_spark.functions.udfs import geomean

    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(geomean("l_extendedprice") * (1 + 1e-9), 2).alias("geo_price")
    )


@query(
    "q_grouped_map_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)
def q_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map surface: applyInPandas per-group ranking validated
    against the row_number window oracle (integer-exact)."""
    from etl_caltopo_spark.functions.udfs import rank_group_pandas

    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ranked = rank_group_pandas(
        orders,
        group_col="o_custkey",
        order_col="o_totalprice",
        tiebreak_col="o_orderkey",
        out_schema="o_orderkey long, o_custkey long, o_totalprice double, rn long",
    )
    return ranked.select("o_orderkey", "o_custkey", "rn")


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers disambiguating
    subtotal nulls from data nulls.

    The () set is an explicit unioned global aggregate (empty-tables
    sweep r13): Spark's Expand-based grouping sets emit 0 rows on an
    EMPTY table where SQL emits the global row with count 0 — see
    q_agg_rollup for the full note.  The union's grouping() markers
    are the () set's constants (1, 1)."""
    apply_runtime_conf(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        UNION ALL
        SELECT CAST(NULL AS STRING), CAST(NULL AS STRING),
               count(*), 1, 1
        FROM orders
        """
    )
