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

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
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
    token stream and cut into fixed {SEQ_LEN}-token sequences; each
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
    {_BM25_TERMS} — the standard relevance ranking used in
    training-data curation (retrieval-based filtering, dedup triage,
    eval-set mining).  Per-doc term frequencies and length are a pure
    map stage; N/avgdl/df are one tiny global aggregate broadcast
    back; top-20 is a TakeOrderedAndProject heap.  Operands are exact
    integers over a shared double avgdl, so Spark and DuckDB agree
    bit-for-bit before the 4-dp floor."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
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
