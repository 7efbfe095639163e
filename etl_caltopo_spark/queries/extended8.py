"""Eighth extended wave: training-sequence packing, BM25 retrieval
scoring, and the banded interval-overlap join.

Reference basis: all [EXT+] — q_seq_pack and q_bm25 extend the
LLM-data-pipeline family (sequence construction for a fixed context
window; lexical retrieval scoring for data curation / dedup triage),
and q_range_join_banded is the scale rewrite of the theta/range join
family (q_join_range): bucketized candidate generation turns an
O(n²) time-overlap predicate into an equi-join.

Numeric policy (HANDOFF.md): integer token counts and day numbers
keep the window arithmetic exact; the single floating output
(BM25 score) is floor-scaled at 4 dp over IEEE-identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import cents, fround, sql_cents
from etl_caltopo_spark.io import fan_out, load_table
from etl_caltopo_spark.llm import text
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

SEQ_LEN = 2048


@query(
    "q_seq_pack",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), c AS (
        SELECT *,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start
        FROM d
    )
    SELECT doc_id, source, n_tokens,
           CAST(start // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(start % {SEQ_LEN} AS BIGINT) AS offset_in_seq
    FROM c
    """,
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (GPT-style concat-and-chunk): within
    each source, documents are concatenated in doc_id order into a
    token stream and cut into fixed 2048-token sequences; each
    doc gets its sequence id and offset (docs may straddle a cut —
    exactly what concat-and-chunk does).  One shuffle on the source
    key; the running sum is integer-exact.  At 100 TB the partition
    key is (source, shard) so no single source serializes a
    partition."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = docs.select(
        "doc_id", "source", text.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    c = d.withColumn("start", start)
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"start div {SEQ_LEN}").alias("seq_id"),
        (F.col("start") % SEQ_LEN).alias("offset_in_seq"),
    )


_BM25_TERMS = ("join", "vector", "stream")
_K1, _B = 1.2, 0.75


def _duck_tf(term: str) -> str:
    return (
        rf"len(list_filter(string_split_regex(trim(lower(text)), '\s+'),"
        rf" x -> x = '{term}'))"
    )


@query(
    "q_bm25",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS dl,
               {", ".join(f"CAST({_duck_tf(t)} AS BIGINT) AS tf_{i}" for i, t in enumerate(_BM25_TERMS))}
        FROM documents
    ), g AS (
        SELECT count(*) AS n,
               avg(dl) AS avgdl,
               {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(_BM25_TERMS)))}
        FROM d
    ), scored AS (
        SELECT doc_id,
               {" + ".join(
                   f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
                   f" * (tf_{i} * ({_K1} + 1.0))"
                   f" / (tf_{i} + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))"
                   for i in range(len(_BM25_TERMS)))}
               AS raw
        FROM d, g
        WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
    )
    SELECT doc_id, floor(raw * 10000) / 10000 AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval scoring for the fixed query
    ("join", "vector", "stream") — the standard relevance ranking used in
    training-data curation (retrieval-based filtering, dedup triage,
    eval-set mining).  Per-doc term frequencies and length are a pure
    map stage; N/avgdl/df are one tiny global aggregate broadcast
    back; top-20 is a TakeOrderedAndProject heap.  Operands are exact
    integers over a shared double avgdl, so Spark and DuckDB agree
    bit-for-bit before the 4-dp floor."""
    apply_runtime_conf(spark)
    # fan_out (r14): the per-term HOF filters + token_count are
    # interpreted folds, and the one-row-group source evaluated the
    # whole projection twice (stats aggregate + scoring side) on
    # single tasks (measured 0.7 + 0.4 s; no-op at scale)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = text.tokens(F.col("text"))

    def term_freq(term: str):
        # factory closure: a 2-param lambda would receive the array
        # INDEX as its second argument (HANDOFF gotcha #3)
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("bigint")

    d = docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("dl"),
        *[term_freq(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    g = d.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = d.crossJoin(F.broadcast(g))
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        tf = F.col(f"tf_{i}")
        part = idf * (tf * (_K1 + 1.0)) / (
            tf + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    any_tf = sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS)))
    return (
        j.filter(any_tf > 0)
        .select("doc_id", fround(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "q_range_join_banded",
    oracle="""
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b, a.o_custkey
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate <= b.o_orderdate + INTERVAL 6 DAY
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 6 DAY
    """,
)
def q_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join, banded: same-customer order pairs
    placed within 6 days of each other.  The oracle states the naive
    theta join; the Spark plan is the SCALE shape — each order's
    6-day window explodes to the 1-2 week buckets it covers, pair
    candidates come from an EQUI-join on (custkey, bucket), the exact
    overlap predicate verifies, and a distinct collapses double-bucket
    matches.  Any overlapping pair shares a covered bucket (the
    overlap instant's bucket), so banding loses nothing; cost rides
    bucket co-occupancy, never |orders|² — the standard rewrite that
    keeps range joins off BroadcastNestedLoop at 100 TB."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    with_buckets = orders.withColumn(
        "_buckets",
        F.array_distinct(
            F.array(
                F.expr("floor(unix_timestamp(o_orderdate) / 86400) div 7"),
                F.expr("(floor(unix_timestamp(o_orderdate) / 86400) + 6) div 7"),
            )
        ),
    )
    a = with_buckets.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_orderdate").alias("_ts_a"),
        F.explode("_buckets").alias("_bucket"),
    )
    b = with_buckets.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_custkey").alias("_ck_b"),
        F.col("o_orderdate").alias("_ts_b"),
        F.explode("_buckets").alias("_bucket_b"),
    )
    pairs = a.join(
        b,
        (F.col("o_custkey") == F.col("_ck_b"))
        & (F.col("_bucket") == F.col("_bucket_b"))
        & (F.col("key_a") < F.col("key_b")),
    ).filter(
        (F.col("_ts_a") <= F.col("_ts_b") + F.expr("INTERVAL 6 DAYS"))
        & (F.col("_ts_b") <= F.col("_ts_a") + F.expr("INTERVAL 6 DAYS"))
    )
    return pairs.select("key_a", "key_b", "o_custkey").distinct()


@query(
    "q_hll_mergeable",
    oracle=None,
    note="Apache DataSketches HLL binary sketches are engine-specific "
    "(DuckDB has no compatible sketch type); rows-only.  Exact "
    "distinct counting is graded by q_agg_distinct.",
)
def q_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB distinct-counting pattern: per-day HLL sketches of
    active users (partial, mergeable state — what a warehouse stores
    per partition) unioned into a weekly estimate WITHOUT rescanning
    events.  Spark 3.5+ DataSketches builtins keep everything
    JVM-side; sketch bytes shuffle instead of user ids, so the merge
    cost is O(days x sketch_size), independent of |events|.  Output:
    one row per week with the merged estimate and the day count it
    covers."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("day")).alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    return weekly.select(
        F.col("week").cast("timestamp_ntz").alias("week"),
        "approx_users",
        "n_days",
    ).orderBy("week")


@query(
    "q_pagerank",
    # headline ADDITION (optimization r15): the iterative-join graph
    # path (co-partitioned checkpoint + SHJ) — heavy-tail coverage.
    headline=True,
    oracle="""
    WITH edges0 AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
        SELECT pa AS src, pb AS dst FROM edges0
        UNION ALL
        SELECT pb AS src, pa AS dst FROM edges0
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
    ), c AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM deg
    ), p0 AS (
        SELECT node, d, CAST(1000000000000 // n AS BIGINT) AS p FROM deg, c
    ), s1 AS (
        SELECT e.dst AS node, CAST(sum((85 * i.p // 100) // i.d) AS BIGINT) AS s
        FROM edges e JOIN p0 i ON e.src = i.node GROUP BY e.dst
    ), p1 AS (
        SELECT i.node, i.d,
               CAST((15 * (1000000000000 // (SELECT n FROM c))) // 100
                    + COALESCE(s1.s, 0) AS BIGINT) AS p
        FROM p0 i LEFT JOIN s1 ON i.node = s1.node
    ), s2 AS (
        SELECT e.dst AS node, CAST(sum((85 * i.p // 100) // i.d) AS BIGINT) AS s
        FROM edges e JOIN p1 i ON e.src = i.node GROUP BY e.dst
    ), p2 AS (
        SELECT i.node, i.d,
               CAST((15 * (1000000000000 // (SELECT n FROM c))) // 100
                    + COALESCE(s2.s, 0) AS BIGINT) AS p
        FROM p1 i LEFT JOIN s2 ON i.node = s2.node
    ), s3 AS (
        SELECT e.dst AS node, CAST(sum((85 * i.p // 100) // i.d) AS BIGINT) AS s
        FROM edges e JOIN p2 i ON e.src = i.node GROUP BY e.dst
    ), p3 AS (
        SELECT i.node,
               CAST((15 * (1000000000000 // (SELECT n FROM c))) // 100
                    + COALESCE(s3.s, 0) AS BIGINT) AS p
        FROM p2 i LEFT JOIN s3 ON i.node = s3.node
    )
    SELECT node AS part_id, p AS rank_fp
    FROM p3 ORDER BY rank_fp DESC, node LIMIT 20
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 power iterations, damping 0.85) over
    the part co-purchase graph — iterative graph analytics under an
    EXACT oracle: all mass is integer micro-units (1e12 total) with
    floor division at every step, so per-node sums are
    order-independent and both engines produce identical bits
    (floating PageRank would hash-mismatch on summation order).

    Scale shape: each iteration is one equi-join of the edge list
    with the rank vector (shuffled on the node key, the same
    partitioning every round — a real deployment co-partitions edges
    and ranks once) plus a partial-aggregated sum; the teleport term
    is a literal.  Driver holds only the node count (one scalar)."""
    apply_runtime_conf(spark)
    # dedup to (order, part) BEFORE the self-join (r14, same bound as
    # q_market_basket): repeat lines of one part in one order multiply
    # the k² pair explosion but never change the DISTINCT edge set
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a, b = li.alias("a"), li.alias("b")
    edges0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    edges = (
        edges0.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(edges0.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        # partitioned on src ONCE before the checkpoint (r14, guide
        # §2.4): the iteration joins' exchange then reads an
        # already-clustered edge list (one cheap map side, reused by
        # all three rounds) — measured 4.1 s vs 4.7 s without; with
        # the per-round SMJ sorts also gone (shuffle_hash below) the
        # query fell 8.1 → 4.1 s
        .repartition(F.col("src"))
        .localCheckpoint()  # edge list reused every iteration
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).withColumnRenamed(
        "src", "node"
    )
    n = deg.count()
    if n == 0:
        # empty-graph guard (empty sweep r13): 1/n is undefined on a
        # node-less graph; the oracle's p0 CTE (FROM deg, c) is
        # likewise empty, so both engines emit 0 rows
        return deg.select(
            F.col("node").alias("part_id"),
            F.lit(None).cast("long").alias("rank_fp"),
        )
    p_init = 1_000_000_000_000 // n
    base = (15 * p_init) // 100
    p = deg.withColumn("p", F.lit(p_init).cast("long"))
    for _ in range(3):
        # shuffle_hash build on the node-count-sized rank side (the
        # q_triangle_count recipe, guide §3.1): no sort of the edge
        # stream, and the edge side's checkpointed partitioning on src
        # satisfies the join's distribution outright
        contrib = edges.join(
            p.hint("shuffle_hash"), edges["src"] == p["node"]
        ).select(F.col("dst"), F.expr("(85 * p div 100) div d").alias("c"))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        p = (
            deg.join(sums, deg["node"] == sums["dst"], "left")
            .select(
                "node",
                "d",
                (F.lit(base).cast("long") + F.coalesce(F.col("s"), F.lit(0).cast("long"))).alias("p"),
            )
        )
    return (
        p.select(F.col("node").alias("part_id"), F.col("p").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "part_id")
        .limit(20)
    )


@query(
    "q_rolling_active_users",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM pairs GROUP BY day
    ), covers AS (
        SELECT DISTINCT
               unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS day,
               user_id
        FROM pairs
    ), wau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS wau FROM covers GROUP BY day
    )
    SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau,
           floor(CAST(COALESCE(d.dau, 0) AS DOUBLE) / w.wau * 10000) / 10000
               AS stickiness
    FROM wau w LEFT JOIN dau d ON w.day = d.day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) with same-day actives
    (DAU) and the DAU/WAU stickiness ratio — the product-analytics
    staple that Spark windows cannot express directly (COUNT(DISTINCT)
    OVER is unsupported): each distinct (day, user) pair EXPLODES to
    the 7 report days it covers, a second distinct collapses
    multi-visit users, and a plain count per day finishes.  Work is
    bounded by 7x the distinct pair count (never |events|); every
    shuffle is keyed by day or (day, user).  Trailing days past the
    last event keep reporting the users still inside their 7-day
    window — same convention in both engines."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    # day in TIMESTAMP_NTZ (hostile-session probe r14): LTZ output
    # renders in the driver's local timezone at collect; the 7-day
    # cover sequence below walks NTZ + day intervals identically
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"),
        "user_id",
    ).distinct()
    dau = pairs.groupBy("day").agg(F.count("*").alias("dau"))
    covers = pairs.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    ).distinct()
    wau = covers.groupBy("day").agg(F.count("*").alias("wau"))
    out = wau.join(dau, "day", "left")
    return out.select(
        "day",
        F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        fround(
            F.coalesce(F.col("dau"), F.lit(0)).cast("double") / F.col("wau"), 4
        ).alias("stickiness"),
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
                THEN c.ts END AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: each purchase takes the
    latest same-user click at-or-before it ONLY if that click is
    within 1 hour — the variant every feature store needs (a stale
    feature is worse than none).  The nearest match is the only one
    that could satisfy the bound, so the tolerance is a post-pass
    null-out over the standard union+window as-of machinery: still
    one user_id shuffle, no extra join.  Microsecond integer
    arithmetic keeps the bound exact cross-engine."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.functions.temporal import epoch_us
    from etl_caltopo_spark.operators.joins import asof_join

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
    fresh = (epoch_us("ts") - epoch_us(F.col("last_click_ts"))) <= 3_600_000_000
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(F.col("last_click_ts").isNotNull() & fresh, F.col("last_click_ts")).alias(
            "last_click_ts"
        ),
    )


@query(
    "q_window_median",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           median({sql_cents("o_totalprice")})
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
               AS trailing_median_price
    FROM orders
    """,
)
def q_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-order median price per customer — an exact
    order-statistic over a sliding frame (the robust alternative to a
    moving average).  Spark rejects ``median`` with a window frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the 3-row frame is
    materialized explicitly: two lags + the current row into a sorted
    compact array, middle element (odd) or mean of the middles (even)
    — all codegen'd Column expressions, one o_custkey shuffle.  Money
    moves to exact cents first so both engines interpolate from
    identical integers; the final /100 is one deterministic double
    division."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w0 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # off-grid totals take NULL cents (numeric.cents, extremes r11
    # wave 2) and fall out of the frame via array_compact, exactly
    # like NULL totals — DuckDB's median skips them the same way
    d = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        cents(F.col("o_totalprice")).alias("c"),
    )
    d = d.withColumn(
        "arr",
        F.array_sort(
            F.array_compact(
                F.array(F.lag("c", 2).over(w0), F.lag("c", 1).over(w0), F.col("c"))
            )
        ),
    )
    # size 0 (every price in the frame NULL — array_compact dropped
    # them all) must yield NULL, not element_at(arr, 0), which raises
    # INVALID_INDEX_OF_ZERO (r8 NULL-injection sweep); DuckDB's
    # median over an all-NULL frame is NULL
    med = F.expr(
        "CASE WHEN size(arr) = 0 THEN NULL"
        " WHEN size(arr) % 2 = 1"
        " THEN CAST(element_at(arr, CAST((size(arr) + 1) div 2 AS INT)) AS DOUBLE)"
        " ELSE (element_at(arr, CAST(size(arr) div 2 AS INT))"
        "       + element_at(arr, CAST(size(arr) div 2 + 1 AS INT))) / 2.0 END"
    )
    return d.select(
        "o_orderkey", "o_custkey", (med / 100.0).alias("trailing_median_price")
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH existing AS (
        SELECT DISTINCT sha256(text) AS h FROM documents
        WHERE source < 'src5'
    ), incoming AS (
        SELECT doc_id, source, sha256(text) AS h FROM documents
        WHERE source >= 'src5'
    )
    SELECT i.doc_id, i.source
    FROM incoming i LEFT JOIN existing e ON i.h = e.h
    WHERE e.h IS NULL
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus update: admit only incoming documents whose
    content hash is unseen in the existing snapshot — the dedup shape
    every periodically-refreshed training corpus runs (new crawl vs
    the accumulated store).  Digests shuffle, never text; the
    existing side reduces to DISTINCT hashes before the anti-join, so
    at 100 TB the store contributes one 32-byte digest per unique doc
    (and in production that digest set is a bucketed table the
    anti-join co-locates with)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("source") < "src5")
        .select(F.sha2(F.col("text"), 256).alias("h"))
        .distinct()
    )
    incoming = docs.filter(F.col("source") >= "src5").select(
        "doc_id", "source", F.sha2(F.col("text"), 256).alias("h")
    )
    return incoming.join(existing, "h", "left_anti").select("doc_id", "source")


@query(
    "q_dup_matrix",
    oracle=r"""
    WITH toks AS (
        SELECT source, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT source,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 7, 1) + 1),
                   i -> array_to_string(t[i:i+7], ' ')
               ))) AS span
        FROM toks
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_spans
    FROM sh a JOIN sh b ON a.span = b.span AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct 8-token spans they share verbatim — the provenance
    diagnostic run before mixing corpora (a hot cell means two
    'sources' sampled the same upstream crawl or template).  Spans
    dedup per source map-side; one span-keyed shuffle joins the
    per-source span sets, and the pair aggregate is tiny (|sources|²
    cells).  Fan-out is bounded by span multiplicity across sources,
    never |docs|² — same inverted-index shape as q_decontaminate."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.io import fan_out
    from etl_caltopo_spark.llm import dedup as _dedup

    # fan_out (r14): one-row-group source ran the 8-token shingle
    # explode on a single scan task (measured 1.0 s stage; no-op at
    # scale)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("source", "text")
    )
    sh = docs.select(
        "source", F.explode(_dedup.shingles(F.col("text"), n=8)).alias("span")
    ).distinct()
    a = sh.select(F.col("source").alias("source_a"), "span")
    b = sh.select(F.col("source").alias("source_b"), F.col("span").alias("span_b"))
    return (
        a.join(
            b,
            (F.col("span") == F.col("span_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_spans"))
    )
