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

from etl_caltopo_spark.functions.numeric import (
    cents,
    fround,
    sql_cents as _sql_cents,
)
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

# cents(col) — exact integer money; o_totalprice sits on a 2-dp grid
# so round(x*100) is exactly the true integer (never a .5 tie).


def _cents(col: str) -> F.Column:
    # off-int64-grid values (NaN/±inf/huge) yield NULL cents on both
    # engines — numeric.cents / sql_cents (extremes r11 wave 2)
    return cents(F.col(col))


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
        WHERE o_totalprice >= 1 AND o_totalprice < 9.223372036854776e18
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
    9-row unpartitioned window (driver-trivial).

    Benford's domain is positive int64-grid magnitudes — the WHERE
    bound excludes NaN/±inf/huge (extremes r11 wave 2: Spark's
    saturated floor stringifies to '-92233…' whose first char '-'
    ANSI-crashes the digit cast; DuckDB's BIGINT cast raises first).
    NaN falls out of ``x < limit`` in both engines (NaN-is-largest),
    sub-1 values are out of audit scope (seeded totals are ≥ 900)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_totalprice") >= 1)
        & (F.col("o_totalprice") < F.lit(9.223372036854776e18))
    )
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
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey,
               SUM({_sql_cents("o_totalprice")}) AS rev_c
        FROM orders GROUP BY 1
        HAVING SUM({_sql_cents("o_totalprice")}) IS NOT NULL
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
    custkey for determinism.  The global row_number runs on the
    distributed two-pass rank (operators/rank.py global_row_number —
    VERDICT r6 #1): value-bucketed, one hash shuffle, broadcast
    prefix-count offsets — the customer frame never sorts into one
    task.  Integer products stay < 2^53 up to ~sf10; beyond that
    cast s1 to DECIMAL(38,0)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import global_row_number, pin_frame

    orders = load_table(spark, sf_dir, "orders")
    # pinned so the rank probe scans the customer-cardinality
    # aggregate instead of re-shuffling all of orders (rank.pin_frame)
    # a customer whose EVERY total is off the cents grid (extremes
    # r11 wave 2) has a NULL revenue — excluded on both sides, else
    # its rank position diverges (Spark sorts ASC NULLS FIRST, DuckDB
    # NULLS LAST) and shifts every rn after it
    rev = pin_frame(
        orders.groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
        .where(F.col("rev_c").isNotNull())
    )
    r = global_row_number(
        rev,
        "rev_c",
        [F.col("rev_c"), F.col("o_custkey")],
        rn_col="rn",
        tiebreak="o_custkey",
    )
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
    oracle=f"""
    WITH rev AS (
        SELECT n_name,
               p_brand,
               SUM({_sql_cents("l_extendedprice")}) AS rev_c
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
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               SUM({_sql_cents("o_totalprice")}) AS v_c
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
    # dedup to (order, part) BEFORE the self-join (r14, the
    # q_market_basket bound): repeat lines never change the DISTINCT
    # edge set
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
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
    # explode, NOT a self-union (r14, the q_graph_2hop lesson): a
    # union makes `edges` a two-consumer subtree and runs the pair
    # distinct TWICE; explode emits both endpoints in one pass
    nodes = edges.select(F.explode(F.array("pa", "pb")).alias("node"))
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
    """Triangle count of the co-purchase graph via
    operators.graph.triangle_count — degree-oriented compact-forward
    (edges re-oriented low-(degree, id) → high, wedges built only at
    the low end), which caps wedge fan-out at O(sqrt(|E|))² on any
    hub distribution and bounds total work at O(|E|^1.5).  The count
    is orientation-invariant, so the id-oriented 3-join stays the
    oracle."""
    from etl_caltopo_spark.operators.graph import triangle_count

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
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    return triangle_count(edges).select(
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.col("n_triangles"),
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
    integer counts; two word-keyed shuffles with partial aggs, then
    both cumulative sums ride the distributed two-pass machinery
    (operators/rank.py global_running_sums — review wave r7: the
    bucket frame is corpus-size / 100, data-proportional, so the old
    unpartitioned cumsum window was a scale leak)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import global_running_sums

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
    # pin the bucket frame: the running-sum operator's eager cut probe
    # is a separate job — unpinned, it re-runs BOTH corpus tokenizes
    # (words feeds firsts and tok_per_bucket) to sketch the cuts;
    # pinned, the probe scans corpus_size/100 rows (rank.pin_frame)
    from etl_caltopo_spark.operators.rank import pin_frame

    j = pin_frame(
        tok_per_bucket.join(new_per_bucket, "bucket", "left").withColumn(
            "new_words", F.coalesce("new_words", F.lit(0))
        )
    )
    cum = global_running_sums(
        j,
        "bucket",
        [F.col("bucket")],
        {"_cum_new": "new_words", "_cum_tok": "n_tokens"},
    )
    return cum.select(
        "bucket",
        F.col("new_words").cast("bigint").alias("new_words"),
        F.col("_cum_new").cast("bigint").alias("vocab_size"),
        F.col("_cum_tok").cast("bigint").alias("tokens_cum"),
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
    (q_agg_regr policy).  The top-1000 selection is a distributed
    heap (orderBy+limit → TakeOrderedAndProject, per-partition heaps
    merged on the driver); the rank window then orders only the
    1000 surviving rows — a limit-bounded frame, not the
    data-proportional vocabulary (review wave r7: the old form ran
    row_number over the FULL word-count agg, which grows with the
    corpus under Heaps' law)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    survivors = wc.orderBy(F.col("n").desc(), F.col("w")).limit(1000)
    w = Window.orderBy(F.col("n").desc(), F.col("w"))
    top = survivors.withColumn("rank", F.row_number().over(w))
    ln_n = F.log(F.col("n"))
    ln_r = F.log(F.col("rank"))
    return top.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        fround(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        fround(F.regr_r2(ln_n, ln_r), 4).alias("zipf_r2"),
    )


# Deterministic synthetic coordinates for geo operators: the synthetic
# tables carry no lat/lon, so a fixed multiplicative-hash projection of
# the entity key onto the globe stands in (same derivation on both
# engines — the geo MATH is what's under test, mirroring the
# reference's geometry handling in caltopo/geometry.py and
# task.ts:102-140 where features carry Point coordinates).
#
# The key is pre-reduced mod the grid BEFORE the multiply (bigids
# sweep r14): (k * 37) % 18000 == ((k % 18000) * 37) % 18000 for any
# nonnegative k — same value bit-for-bit — but the left form's
# intermediate overflows int64 the moment keys are realistic
# snowflake-scale (2^62) identifiers, ANSI-raising in Spark and
# Out-of-Range-raising in DuckDB.  HANDOFF knowledge #35.
def _lat_c(key: str) -> F.Column:
    return ((F.col(key) % 18000) * 37) % 18000 - 9000


def _lon_c(key: str) -> F.Column:
    return ((F.col(key) % 36000) * 91) % 36000 - 18000


_SQL_LAT = "(((({k}) % 18000) * 37) % 18000 - 9000)"
_SQL_LON = "(((({k}) % 36000) * 91) % 36000 - 18000)"


@query(
    "q_geo_bbox",
    oracle=f"""
    WITH pts AS (
        SELECT c_nationkey,
               {_SQL_LAT.format(k='c_custkey')} AS lat_c,
               {_SQL_LON.format(k='c_custkey')} AS lon_c
        FROM customer
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_points,
           min(lat_c) / 100.0 AS min_lat,
           max(lat_c) / 100.0 AS max_lat,
           min(lon_c) / 100.0 AS min_lon,
           max(lon_c) / 100.0 AS max_lon,
           floor(sum(lat_c) / (count(*) * 100.0) * 10000) / 10000
               AS centroid_lat,
           floor(sum(lon_c) / (count(*) * 100.0) * 10000) / 10000
               AS centroid_lon
    FROM pts JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def q_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group bounding box + centroid over point sets — the map-
    extent aggregation the reference's folder/map UI implies (features
    are grouped into folders, task.ts:142-152; an extent is the
    min/max over their coordinates).  Coordinates are integer
    centidegrees until the final division, so min/max are exact and
    the centroid is a double over exact integer sums (4-dp floor).
    One partial-agg shuffle on nationkey; nation is broadcast."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pts = cust.select(
        "c_nationkey",
        _lat_c("c_custkey").alias("lat_c"),
        _lon_c("c_custkey").alias("lon_c"),
    )
    n = F.count("*")
    return (
        pts.join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            n.cast("bigint").alias("n_points"),
            (F.min("lat_c") / 100.0).alias("min_lat"),
            (F.max("lat_c") / 100.0).alias("max_lat"),
            (F.min("lon_c") / 100.0).alias("min_lon"),
            (F.max("lon_c") / 100.0).alias("max_lon"),
            fround(F.sum("lat_c") / (n * 100.0), 4).alias("centroid_lat"),
            fround(F.sum("lon_c") / (n * 100.0), 4).alias("centroid_lon"),
        )
    )


@query(
    "q_geo_haversine",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey, l_suppkey
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), pts AS (
        SELECT o_custkey, l_suppkey,
               radians({_SQL_LAT.format(k='o_custkey')} / 100.0) AS la1,
               radians({_SQL_LON.format(k='o_custkey')} / 100.0) AS lo1,
               radians({_SQL_LAT.format(k='l_suppkey')} / 100.0) AS la2,
               radians({_SQL_LON.format(k='l_suppkey')} / 100.0) AS lo2
        FROM pairs
    ), d AS (
        SELECT o_custkey, l_suppkey,
               floor(2.0 * 6371.0 * asin(sqrt(
                   sin((la2 - la1) / 2) * sin((la2 - la1) / 2)
                   + cos(la1) * cos(la2)
                     * sin((lo2 - lo1) / 2) * sin((lo2 - lo1) / 2)
               )) * 10000) / 10000 AS dist_km
        FROM pts
    )
    SELECT o_custkey, l_suppkey, dist_km
    FROM d
    ORDER BY dist_km DESC, o_custkey, l_suppkey
    LIMIT 20
    """,
)
def q_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance over customer->supplier
    trade links, top-20 longest — the geodesic primitive under any
    track-length / proximity query on the reference's Point features
    (task.ts:81, geometry passthrough).  Trig runs row-level on both
    engines; 4-dp floor absorbs libm ulps, and the top-k orders by
    the TRUNCATED value with full key tie-breaks so rank flips
    can't change the selected set.  Plan: one shuffle for the
    distinct pair projection, then TakeOrderedAndProject (heap
    top-k, no global sort)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    la1 = F.radians(_lat_c("o_custkey") / 100.0)
    lo1 = F.radians(_lon_c("o_custkey") / 100.0)
    la2 = F.radians(_lat_c("l_suppkey") / 100.0)
    lo2 = F.radians(_lon_c("l_suppkey") / 100.0)
    hav = (
        F.sin((la2 - la1) / 2) * F.sin((la2 - la1) / 2)
        + F.cos(la1) * F.cos(la2) * F.sin((lo2 - lo1) / 2) * F.sin((lo2 - lo1) / 2)
    )
    dist = fround(F.lit(2.0) * 6371.0 * F.asin(F.sqrt(hav)), 4)
    return (
        pairs.select("o_custkey", "l_suppkey", dist.alias("dist_km"))
        .orderBy(F.col("dist_km").desc(), "o_custkey", "l_suppkey")
        .limit(20)
    )


@query(
    "q_corr_matrix",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{a}' AS col_x, '{b}' AS col_y,
           floor(corr(
               CASE WHEN abs({a}) < 1e+100 AND abs({b}) < 1e+100
                    THEN {a} END,
               CASE WHEN abs({a}) < 1e+100 AND abs({b}) < 1e+100
                    THEN {b} END) * 10000) / 10000 AS pearson_r
    FROM lineitem"""
        for a, b in [
            ("l_quantity", "l_extendedprice"),
            ("l_quantity", "l_discount"),
            ("l_quantity", "l_tax"),
            ("l_extendedprice", "l_discount"),
            ("l_extendedprice", "l_tax"),
            ("l_discount", "l_tax"),
        ]
    ),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    measures, unpivoted to (col_x, col_y, r) rows — the feature-
    profiling step of a training-data pipeline.  ONE scan and ONE
    partial-agg shuffle computes all six coefficients (a single agg
    node), then the 1x6 row is exploded driver-side-free via stack;
    4-dp floor (q_agg_corr policy)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def pearson(a: str, b: str):
        # guarded covar_pop/(stddev_pop*stddev_pop), not F.corr: a
        # zero-variance column ANSI-crashes Corr's internal division
        # even under a CASE guard (aggregates evaluate before the
        # projection; r8 degenerate sweep) — DuckDB yields NULL.
        # stddevs masked to pairwise-complete rows: corr() drops a
        # pair when EITHER side is NULL (r8 NULL-injection sweep).
        # The mask also bounds the pair to the portable variance
        # domain |x| < 1e100 (extremes r11 wave 2 — NULL and NaN both
        # fail the abs() comparison, NaN because it orders largest),
        # and covar_pop consumes the SAME masked pair so all three
        # moments see identical observations.
        both = (F.abs(F.col(a)) < F.lit(1e100)) & (
            F.abs(F.col(b)) < F.lit(1e100)
        )
        sa = F.stddev_pop(F.when(both, F.col(a)))
        sb = F.stddev_pop(F.when(both, F.col(b)))
        cov = F.covar_pop(F.when(both, F.col(a)), F.when(both, F.col(b)))
        return F.when((sa > 0) & (sb > 0), cov / (sa * sb))

    aggs = [
        fround(pearson(a, b), 4).alias(f"r_{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    wide = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{a}', '{b}', r_{i}" for i, (a, b) in enumerate(pairs)
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_expr}) AS (col_x, col_y, pearson_r)"
    )


@query(
    "q_readability",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               greatest(len(list_filter(string_split(text, ' '),
                                        x -> x <> '')), 1) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_sylls
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_sylls AS BIGINT) AS n_sylls,
           floor((206.835 - 1.015 * (n_words / CAST(n_sents AS DOUBLE))
                  - 84.6 * (n_sylls / CAST(n_words AS DOUBLE))) * 100) / 100
               AS flesch
    FROM m
    """,
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring per document (vowel-group syllable
    heuristic) — a standard corpus-quality feature next to
    q_quality_score / q_repetition_score.  All three counts are
    integers from engine-portable regexes ([aeiouy]+ and [.!?]+ mean
    the same in Java regex and RE2); the score is a double over exact
    ints, 2-dp floor.  Narrow projection, zero shuffles — a pure map
    stage that scales embarrassingly."""
    from etl_caltopo_spark.llm import text

    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.greatest(
        F.size(F.filter(F.split("text", " "), lambda x: x != "")), F.lit(1)
    )
    n_sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    # portable_lower: the U+0130 rule (llm/text.py, r8) — a Turkish
    # dotted I would otherwise add a combining mark that splits an
    # [aeiouy]+ group in Spark but not DuckDB
    n_sylls = F.size(
        F.regexp_extract_all(
            text.portable_lower(F.col("text")), F.lit(r"[aeiouy]+"), 0
        )
    )
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_sylls.alias("n_sylls"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words") / F.col("n_sents").cast("double"))
        - F.lit(84.6) * (F.col("n_sylls") / F.col("n_words").cast("double"))
    )
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sents").cast("bigint").alias("n_sents"),
        F.col("n_sylls").cast("bigint").alias("n_sylls"),
        fround(flesch, 2).alias("flesch"),
    )
