"""Fifth extended wave: forensic / distributional analytics (Benford
first-digit, Gini, Herfindahl concentration), calendar gap
interpolation, co-purchase graph statistics (degree distribution,
triangle count), and corpus growth laws (Heaps, Zipf).

Reference basis: all [EXT+] — the reference (task.ts:1-167) has no
aggregates; these complete the analytics families a reference user
migrating a full pipeline would expect.  Numeric policy follows
HANDOFF.md: money is moved to exact integer cents before any
order-dependent sum; final ratios are double expressions over exact
integer operands (IEEE-identical cross-engine) truncated with
``fround``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

# cents(col) — exact integer money; o_totalprice sits on a 2-dp grid
# so round(x*100) is exactly the true integer (never a .5 tie).


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# log10(1 + 1/d) for d=1..9, pre-rounded to 4 dp and inlined as
# literals on BOTH sides so no cross-engine libm call is compared.
_BENFORD_PCT = [30.103, 17.6091, 12.4939, 9.691, 7.9181, 6.6947, 5.7992, 5.115, 4.5757]


@query(
    "q_benford",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INTEGER) AS digit
        FROM orders
    )
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n_obs,
           floor(count(*) * 100.0 / sum(count(*)) OVER () * 10000) / 10000
               AS share_pct,
           CAST(CASE digit WHEN 1 THEN 30.103 WHEN 2 THEN 17.6091
                WHEN 3 THEN 12.4939 WHEN 4 THEN 9.691 WHEN 5 THEN 7.9181
                WHEN 6 THEN 6.6947 WHEN 7 THEN 5.7992 WHEN 8 THEN 5.115
                ELSE 4.5757 END AS DOUBLE) AS benford_pct
    FROM d GROUP BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals — the
    classic fraud/forensics screen.  First digit is taken textually
    from the exact integer part (no log10: floor(log10(x)) flips at
    power-of-ten boundaries under double rounding).  One shuffle on a
    9-value key with map-side partial counts; the share is a
    9-row unpartitioned window (driver-trivial)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = orders.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    benford = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_PCT]), F.col("digit")
    )
    return counts.select(
        "digit",
        F.col("n").cast("bigint").alias("n_obs"),
        fround(F.col("n") * 100.0 / total, 4).alias("share_pct"),
        benford.alias("benford_pct"),
    )


@query(
    "q_gini",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1
    ), r AS (
        SELECT rev_c,
               row_number() OVER (ORDER BY rev_c, o_custkey) AS rn
        FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           floor((2.0 * sum(rn * rev_c) / (count(*) * sum(rev_c))
                  - (count(*) + 1.0) / count(*)) * 1000000) / 1000000 AS gini
    FROM r
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue via the exact rank
    formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over cents (all
    integer until the final division, so the double result is
    IEEE-identical cross-engine; 6-dp floor).  Rank ties broken by
    custkey for determinism.  The global row_number is a single-
    partition sort — fine for n_customers rows (already one row per
    customer); at 100 TB the scale path is a two-pass distributed
    rank (per-partition count + prefix-sum offsets, as in
    operators/topk.py).  Integer products stay < 2^53 up to ~sf10;
    beyond that cast s1 to DECIMAL(38,0)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("rev_c")
    )
    w = Window.orderBy("rev_c", "o_custkey")
    r = rev.withColumn("rn", F.row_number().over(w))
    n = F.count("*")
    return r.agg(
        n.cast("bigint").alias("n_customers"),
        fround(
            F.lit(2.0) * F.sum(F.col("rn") * F.col("rev_c")) / (n * F.sum("rev_c"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@query(
    "q_hhi",
    oracle="""
    WITH rev AS (
        SELECT n_name,
               p_brand,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_c
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    ), share AS (
        SELECT n_name,
               (rev_c * 10000) // SUM(rev_c) OVER (PARTITION BY n_name)
                   AS share_bp
        FROM rev
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_brands,
           CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi_bp2
    FROM share GROUP BY n_name
    """,
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per supplier
    nation, with p_brand as the firm unit.  Shares are integer basis
    points via floor division, so the whole pipeline is exact integer
    arithmetic — no float policy needed.  Plan: lineitem joins
    part/supplier/nation (all broadcast dims), ONE shuffle for the
    (nation, brand) partial-agg; the share window repartitions the
    25x25-row aggregate only."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(F.sum(_cents("l_extendedprice")).alias("rev_c"))
    )
    tot = F.sum("rev_c").over(Window.partitionBy("n_name"))
    share = rev.select(
        "n_name", F.expr("rev_c * 10000").alias("num"), tot.alias("tot_c")
    ).select("n_name", F.expr("num div tot_c").alias("share_bp"))
    return share.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_brands"),
        F.sum(F.col("share_bp") * F.col("share_bp")).cast("bigint").alias("hhi_bp2"),
    )


@query(
    "q_interpolate_linear",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v_c
        FROM orders
        GROUP BY 1
        HAVING day(o_orderdate) % 3 <> 0
    ), cal AS (
        SELECT unnest(generate_series((SELECT min(d) FROM daily),
                                      (SELECT max(d) FROM daily),
                                      INTERVAL 1 DAY))::DATE AS d
    ), j AS (
        SELECT cal.d, daily.v_c,
            last_value(daily.v_c IGNORE NULLS) OVER
                (ORDER BY cal.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
            last_value(CASE WHEN daily.v_c IS NOT NULL THEN cal.d END IGNORE NULLS) OVER
                (ORDER BY cal.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d0,
            first_value(daily.v_c IGNORE NULLS) OVER
                (ORDER BY cal.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
            first_value(CASE WHEN daily.v_c IS NOT NULL THEN cal.d END IGNORE NULLS) OVER
                (ORDER BY cal.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d1
        FROM cal LEFT JOIN daily ON cal.d = daily.d
    )
    SELECT d,
           floor((v_c / 100.0) * 100) / 100 AS v_obs,
           CASE WHEN v_c IS NOT NULL THEN floor((v_c / 100.0) * 100) / 100
                WHEN v0 IS NULL OR v1 IS NULL THEN NULL
                ELSE floor(((v0 + (v1 - v0) * datediff('day', d0, d)
                             / CAST(datediff('day', d0, d1) AS DOUBLE)) / 100.0)
                           * 100) / 100
           END AS v_filled
    FROM j
    """,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + linear gap interpolation: daily order
    revenue with a deterministic dropout (every day-of-month % 3 == 0
    is 'missing'), densified over a generated date spine, and missing
    days filled as v0 + (v1-v0)*(t-t0)/(t1-t0) from the nearest known
    neighbors (ignore-nulls window scans both directions).  Values
    are integer cents; the interpolation expression divides exact
    integers, so 2-dp floor is stable.  The spine window is a single
    partition (one row per day — ~2.4k rows at any SF; at true scale
    partition by year and stitch boundary rows)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("v_c"))
        .filter(F.dayofmonth("d") % 3 != 0)
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    j = cal.join(daily, "d", "left")
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    known_d = F.when(F.col("v_c").isNotNull(), F.col("d"))
    j = (
        j.withColumn("v0", F.last("v_c", ignorenulls=True).over(w_prev))
        .withColumn("d0", F.last(known_d, ignorenulls=True).over(w_prev))
        .withColumn("v1", F.first("v_c", ignorenulls=True).over(w_next))
        .withColumn("d1", F.first(known_d, ignorenulls=True).over(w_next))
    )
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * F.datediff(
        "d", "d0"
    ) / F.datediff("d1", "d0").cast("double")
    v_filled = (
        F.when(F.col("v_c").isNotNull(), fround(F.col("v_c") / 100.0, 2))
        .when(F.col("v0").isNull() | F.col("v1").isNull(), F.lit(None))
        .otherwise(fround(interp / 100.0, 2))
    )
    return j.select(
        "d",
        fround(F.col("v_c") / 100.0, 2).alias("v_obs"),
        v_filled.alias("v_filled"),
    )


@query(
    "q_graph_degree",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT pa AS node FROM edges
            UNION ALL
            SELECT pb AS node FROM edges
        ) GROUP BY node
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
    FROM deg GROUP BY degree
    """,
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph (edge =
    two parts appear in the same order).  The pair generation is an
    equi-self-join on l_orderkey — shuffle-bounded by order size
    (avg ~4 lines/order, so ~6 pairs/order); DISTINCT dedups repeat
    co-purchases.  At 100 TB the guard is capping per-order fanout
    (orders with k lines emit k(k-1)/2 pairs — filter or sample
    k > ~100 before the join, as operators/skew.py does)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    nodes = edges.select(F.col("pa").alias("node")).unionAll(
        edges.select(F.col("pb").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_parts"))


@query(
    "q_triangle_count",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.pb = e2.pa
    JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph via the two-join
    wedge-close pattern over ID-oriented edges (a < b < c counts each
    triangle exactly once).  Both joins are shuffle hash joins on a
    single node key; wedge fanout is bounded by per-node degree — at
    scale, re-orient edges by (degree, id) instead of raw id so
    high-degree hubs sit on the closing side (standard distributed
    triangle-count trick), and count per-partition before the final
    1-row agg."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = e1.join(e2, F.col("e1.pb") == F.col("e2.pa")).join(
        e3,
        (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
    )
    n_edges = edges.count()
    return tri.agg(
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.count("*").cast("bigint").alias("n_triangles"),
    )


@query(
    "q_vocab_growth",
    oracle="""
    WITH words AS (
        SELECT doc_id, w
        FROM documents, unnest(string_split(text, ' ')) AS t(w)
        WHERE w <> ''
    ), firsts AS (
        SELECT w, min(doc_id) AS first_doc FROM words GROUP BY w
    ), new_per_bucket AS (
        SELECT first_doc // 100 AS bucket, count(*) AS new_words
        FROM firsts GROUP BY 1
    ), tok_per_bucket AS (
        SELECT doc_id // 100 AS bucket, count(*) AS n_tokens
        FROM words GROUP BY 1
    )
    SELECT t.bucket,
           CAST(coalesce(n.new_words, 0) AS BIGINT) AS new_words,
           CAST(sum(coalesce(n.new_words, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
               AS vocab_size,
           CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT) AS tokens_cum
    FROM tok_per_bucket t LEFT JOIN new_per_bucket n ON t.bucket = n.bucket
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-vocabulary size
    as a function of corpus position, computed with the first-
    occurrence trick (min(doc_id) per word, then a cumulative sum of
    per-bucket first-occurrence counts) — NO cumulative count-
    distinct window, which neither engine can do distributed.  All
    integer counts; two word-keyed shuffles with partial aggs, then a
    tiny bucket-level window."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    new_per_bucket = firsts.groupBy(
        F.expr("first_doc div 100").alias("bucket")
    ).agg(F.count("*").alias("new_words"))
    tok_per_bucket = words.groupBy(
        F.expr("doc_id div 100").alias("bucket")
    ).agg(F.count("*").alias("n_tokens"))
    j = tok_per_bucket.join(new_per_bucket, "bucket", "left").withColumn(
        "new_words", F.coalesce("new_words", F.lit(0))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "bucket",
        F.col("new_words").cast("bigint").alias("new_words"),
        F.sum("new_words").over(w).cast("bigint").alias("vocab_size"),
        F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
    )


@query(
    "q_zipf_slope",
    oracle="""
    WITH wc AS (
        SELECT w, count(*) AS n
        FROM documents, unnest(string_split(text, ' ')) AS t(w)
        WHERE w <> ''
        GROUP BY w
    ), ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rank
        FROM wc
    ), top AS (
        SELECT * FROM ranked WHERE rank <= 1000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           floor(regr_slope(ln(n), ln(rank)) * 10000) / 10000 AS zipf_slope,
           floor(regr_r2(ln(n), ln(rank)) * 10000) / 10000 AS zipf_r2
    FROM top
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: regr_slope/r2 of ln(frequency) on ln(rank)
    over the top-1000 vocabulary (slope near -1 for natural text —
    a corpus-health diagnostic).  Rank is deterministic (freq desc,
    word asc).  4-dp floor absorbs libm-ulp + summation-order drift
    (q_agg_regr policy).  The global top-1000 is a rank-limit over
    the word-count agg — at scale swap for operators/topk.py's
    per-partition pre-top-k."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("w"))
    top = wc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 1000)
    ln_n = F.log(F.col("n"))
    ln_r = F.log(F.col("rank"))
    return top.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        fround(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        fround(F.regr_r2(ln_n, ln_r), 4).alias("zipf_r2"),
    )
