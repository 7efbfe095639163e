"""Extended relational coverage ([EXT] completion beyond SURVEY §2's
minimum): TPC-H-shaped multi-table queries through the SQL API,
subqueries, pivot, statistical/positional aggregates, regex, date
arithmetic, explode, percentiles.

A user of a complete engine expects these on day one; each is
oracle-checked like the core waves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import (
    finite_or_null,
    fround,
    sql_variance_safe,
    variance_safe,
)
from etl_caltopo_spark.io import TABLES, load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


def _register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_sql_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 20
    """,
    headline=True,
)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through spark.sql — the SQL front-end over the
    same Catalyst plans the DataFrame queries compile to."""
    apply_runtime_conf(spark)
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT l.l_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 20
        """
    )


@query(
    "q_sql_tpch_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    headline=True,
)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join (fact + two chained facts + three
    broadcast dims), region-filtered revenue per nation."""
    apply_runtime_conf(spark)
    _register_views(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return spark.sql(
        """
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """
    )


@query(
    "q_sql_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — the pushdown
    showcase (all four predicates reach the parquet scan)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT round(sum(o_totalprice), 2) / count(*) FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (avg built as exact-grid
    round(sum)/count so the threshold double is identical in both
    engines — boundary rows can't flip)."""
    apply_runtime_conf(spark)
    _register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT round(sum(o_totalprice), 2) / count(*) FROM orders)
        """
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 60000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst rewrites to semi/anti
    joins (the de-correlation the reference's Map lookup never needed)."""
    apply_runtime_conf(spark)
    _register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 60000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS qty_A,
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2) AS qty_N,
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation); the oracle is the equivalent FILTER
    aggregation — same grid-sum discipline per cell."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_totalprice > 50000) AS BIGINT) AS n_big,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) AS BIGINT) AS n_all
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 50000).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count("*").alias("n_all"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey)
               AS richest_cust,
           arg_min(c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 - c_custkey)
               AS poorest_cust
    FROM customer
    WHERE c_acctbal IS NULL
       OR (isfinite(c_acctbal) AND abs(c_acctbal) <= 9.0e8)
    GROUP BY c_mktsegment
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional aggregates max_by/min_by (arg_max/arg_min).  The
    ordering key is an exact integer composite (2-dp balance grid
    scaled + custkey tiebreak) so ties resolve identically across
    engines — struct ordering keys aren't portable to DuckDB.

    Balances OFF the composite-key grid are excluded (extremes sweep
    r11): the key is cents·10^8 ± custkey, so it is exact int64 only
    for |balance| ≤ ~9·10^8 (cents·10^8 < 2^63 with tiebreak
    headroom) — beyond that, NaN/±inf included, the cents cast or the
    scale multiply overflows in BOTH engines.  NULL balances were
    already ignored by both engines' NULL-key skipping."""
    apply_runtime_conf(spark)
    bal_ok = F.col("c_acctbal").isNull() | (
        ~F.isnan("c_acctbal") & (F.abs("c_acctbal") <= F.lit(9.0e8))
    )
    cust = load_table(spark, sf_dir, "customer").where(bal_ok)
    key_hi = F.round(F.col("c_acctbal") * 100).cast("long") * F.lit(100000000)
    return cust.groupBy("c_mktsegment").agg(
        F.max_by("c_custkey", key_hi + F.col("c_custkey")).alias("richest_cust"),
        F.min_by("c_custkey", key_hi - F.col("c_custkey")).alias("poorest_cust"),
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           floor(stddev_samp(l_quantity) * 10000) / 10000 AS qty_stddev,
           floor(var_samp(l_quantity) * 10000) / 10000 AS qty_var
    FROM lineitem
    WHERE {sql_variance_safe("l_quantity")}
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance).  Observations
    outside the portable variance domain (|x| ≥ 1e100, NaN/±inf) are
    excluded (extremes r11 wave 2): DuckDB's accumulator raises
    OutOfRange the moment a squared deviation overflows, where Spark
    yields NaN — there is no shared answer out there."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        variance_safe(F.col("l_quantity"))
    )
    return li.groupBy("l_returnflag").agg(
        fround(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        fround(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect + sort + join — the
    deterministic form of listagg/string_agg)."""
    apply_runtime_conf(spark)
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
           regexp_replace(c_name, '^Customer#0*', 'C-') AS short_name,
           CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$')
                THEN TRUE ELSE FALSE END AS well_formed
    FROM customer
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match (Java and RE2-compatible
    patterns only — both engines agree on this subset)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("cust_num"),
        F.regexp_replace("c_name", r"^Customer#0*", "C-").alias("short_name"),
        F.col("c_name").rlike(r"^Customer#[0-9]+$").alias("well_formed"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS due_date,
           o_orderdate - INTERVAL 7 DAY AS week_before,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INTEGER) AS days_since_95,
           CAST(last_day(o_orderdate) AS TIMESTAMP) + INTERVAL 0 DAY AS month_end
    FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic, day difference, month-end."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAYS")).alias("week_before"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        # NTZ, not LTZ (hostile-session probe r14): an LTZ output
        # renders in the driver's local timezone at collect
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT p_partkey, t.word
    FROM part, unnest(string_split(p_name, ' ')) AS t(word)
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating explode (UNNEST): one row per word of p_name."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    WHERE l_quantity IS NULL OR isfinite(l_quantity)
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same
    linear interpolation over sorted values; quantity is integral so
    results land on .0/.5 grid points).  Non-finite observations are
    excluded (extremes r11 wave 2): Spark's percentile ranks NaN as
    the largest value while DuckDB's quantile_cont SKIPS it, shifting
    every upper percentile by one position."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        finite_or_null(F.col("l_quantity"))
    )
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@query(
    "q_window_dist",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey)
    """,
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) over a deterministic global order.  percent_rank and
    cume_dist are exact ratios of identical ints — bit-equal doubles.

    Runs on the distributed two-pass rank (operators/rank.py — VERDICT
    r6 #1): the raw orders frame is never pulled into one window task;
    ntile/percent_rank/cume_dist derive from the exact global row
    number + frame count by the same row arithmetic both engines use.

    TIE SEMANTICS (clones probe r13): percent_rank and cume_dist are
    defined over RANK and PEER GROUPS, not row position — rows equal
    on the whole ORDER BY key share (min rn - 1)/(n - 1) and
    (max rn)/n.  On the seeded data (o_orderkey unique) every peer
    group is a singleton and the bounds collapse to rn, but duplicate
    full rows (a stuck-producer feed) made the old row-position form
    diverge from SQL.  The peer bounds come from ONE window hash-
    partitioned by the full order key (tiny groups, no global sort);
    ntile stays on the row number — SQL's ntile is position-based and
    splits ties across tiles in both engines."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    from etl_caltopo_spark.operators.rank import (
        cume_dist_from_rank,
        global_row_number,
        ntile_from_rank,
        percent_rank_from_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    r = global_row_number(
        orders.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        [F.col("o_totalprice"), F.col("o_orderkey")],
        rn_col="_grn",
        total_col="_n",
        tiebreak="o_orderkey",
    )
    w_peer = Window.partitionBy("o_totalprice", "o_orderkey")
    r = r.withColumn("_rank", F.min("_grn").over(w_peer)).withColumn(
        "_peer_hi", F.max("_grn").over(w_peer)
    )
    return r.select(
        "o_orderkey",
        ntile_from_rank(F.col("_grn"), F.col("_n"), 4).alias("quartile"),
        percent_rank_from_rank(F.col("_rank"), F.col("_n")).alias("pct_rank"),
        cume_dist_from_rank(F.col("_peer_hi"), F.col("_n")).alias("cume"),
    )


@query(
    "q_null_safe_eq",
    oracle="""
    SELECT e.event_id,
           CASE WHEN (CASE WHEN e.value > 0.5 THEN e.event_type END)
                     IS NOT DISTINCT FROM 'click'
                THEN TRUE ELSE FALSE END AS is_big_click,
           CASE WHEN (CASE WHEN e.value > 0.5 THEN e.event_type END)
                     IS NOT DISTINCT FROM NULL
                THEN TRUE ELSE FALSE END AS is_small
    FROM events e
    """,
)
def q_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    maybe = F.when(F.col("value") > 0.5, F.col("event_type"))
    return ev.select(
        "event_id",
        maybe.eqNullSafe(F.lit("click")).alias("is_big_click"),
        maybe.eqNullSafe(F.lit(None).cast("string")).alias("is_small"),
    )


@query(
    "q_sample",
    oracle="""
    WITH h AS (
        SELECT l_orderkey, l_linenumber,
               ((((CAST(l_orderkey AS BIGINT) % 2147483648) * 8 + l_linenumber)
                 % 2147483648)
                * 1113114113) % 2147483648 AS h1
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber
    FROM h WHERE ((h1 // 65536) % 10) = 0
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via key hashing — invariant to
    partitioning, cluster size and run order (unlike rand()-based
    TABLESAMPLE, which is only reproducible for a fixed partition
    layout).  This is the reproducible-sampling form a training-data
    pipeline needs; rand()-based .sample() is exercised in tests.

    The draw is an engine-portable Knuth multiplicative hash (odd
    constant, mod 2^31 so the product stays under 2^62 for ANSI
    arithmetic at any SF); the sample decision reads the HIGH bits
    (bits 16-30) because a multiplicative hash mixes upward — the low
    bits of key*odd retain the key's parity.

    The orderkey is pre-reduced mod 2^31 BEFORE the *8 fold (bigids
    sweep r14): ((k % 2^31) * 8 + ln) % 2^31 == (k * 8 + ln) % 2^31
    for nonnegative k — identical draw, but the raw product overflows
    int64 at snowflake-scale ids (HANDOFF knowledge #35)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    combined = (
        F.col("l_orderkey").cast("long") % F.lit(2147483648)
    ) * F.lit(8) + F.col("l_linenumber")
    h1 = (combined % F.lit(2147483648)) * F.lit(1113114113) % F.lit(2147483648)
    return li.filter(
        F.pmod(F.floor(h1 / F.lit(65536)), F.lit(10)) == 0
    ).select("l_orderkey", "l_linenumber")


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations).

    The () set is an explicit unioned global aggregate (empty-tables
    sweep r13): Spark's Expand-based CUBE emits 0 rows on an EMPTY
    table where SQL emits the global row with count 0 — see
    q_agg_rollup for the full note."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    keyed = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping_id().alias("_gid"),
        )
        .filter(F.col("_gid") != 3)
        .drop("_gid")
    )
    global_row = orders.agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n",
        "total",
    )
    return keyed.unionByName(global_row)


@query(
    "q_array_funcs",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           CAST(len(words) AS INTEGER) AS n_words,
           array_to_string(list_sort(words), '|') AS sorted_words,
           CASE WHEN list_contains(words, 'spark') THEN TRUE ELSE FALSE END AS has_spark,
           CAST(list_position(words, 'data') AS INTEGER) AS data_pos,
           list_sort(words)[1] AS first_word,
           array_to_string(list_reverse(list_sort(words)), '|') AS rev_words
    FROM w
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: size/sort/contains/position/element_at/
    reverse ([EXT] completion of the reference's array handling,
    task.ts:124-126)."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    srt = F.array_sort(words)
    return part.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(srt, "|").alias("sorted_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_position(words, "data").cast("int").alias("data_pos"),
        F.element_at(srt, 1).alias("first_word"),
        F.array_join(F.reverse(srt), "|").alias("rev_words"),
    )


@query(
    "q_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink roundtrip: write the nation table as CSV, read
    it back with an explicit schema ([EXT] scan completion, SURVEY
    §2.3).  Graded against the nation parquet directly — the roundtrip
    must be lossless, so the oracle is the source table itself.

    The read-back schema is DERIVED from the source table (bigids
    probe r13): the previous hardcoded ``int`` id columns silently
    nulled any id past int32 on the CSV read — a lossy roundtrip the
    moment ids are realistic 64-bit identifiers."""
    import tempfile

    apply_runtime_conf(spark)
    from etl_caltopo_spark.io import read_csv

    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = tempfile.mkdtemp(prefix="csv_roundtrip_") + "/nation"
    src.write.mode("overwrite").option("header", "true").csv(path)
    schema = ", ".join(f"{n} {t}" for n, t in src.dtypes)
    return read_csv(spark, path, schema=schema)
