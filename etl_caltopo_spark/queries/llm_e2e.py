"""The LLM curation pipeline graded END-TO-END as query ids
(VERDICT r11 #2): the LLM-side analog of queries/caltopo_e2e.py —
operators that each pass in isolation (q_dedup_exact, q_dedup_jaccard,
q_decontaminate, q_corpus_filter, q_quality_score, q_seq_pack) can
still disagree on interface columns; one composed plan now exercises
the whole chain against a single DuckDB replay:

- exact dedup (min-doc_id keeper per sha256)        q_dedup_exact
- near-dup drop (banded MinHash + exact Jaccard)    q_dedup_jaccard
- decontamination (4-shingle inverted-index hit)    q_decontaminate
- C4-style corpus filter + quality carry            q_corpus_filter/
                                                    q_quality_score
- per-source domain cap                             q_corpus_mix's
                                                    concern, hard form
- training-sequence packing                         q_seq_pack

Two graded forms:

- ``q_llm_curation_pipeline``: the batch composition over documents.
- ``q_llm_curation_stream``: the same composition fed by STREAMED
  ingestion — documents arrive over the two-phase availableNow
  protocol into the epoch-keyed-overwrite staging sink WITH deliberate
  final-epoch redelivery (the q_stream_foreachbatch_exactly_once
  at-least-once crash model), and curation runs over the staged table.
  Sequence packing is order-sensitive and NOT incrementalizable (one
  new doc shifts every later offset in its source), so the streaming
  form is the standard rematerialize-from-exactly-once-log pattern,
  not a stateful incremental pack; the grade proves staging loses
  nothing, duplicates nothing, and composes into the same curated
  sequences byte for byte.

Both ids share ONE oracle string (the staged set must equal the table
— that is the exactly-once claim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.portable import (
    MH_P,
    minhash_signature_sql,
    portable_string_hash_sql,
)
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.llm import curation, text
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

_STOP_SQL = "['" + "','".join(text.STOPWORDS) + "']"

#: 4-token shingle list over the tokenized text `ts` (q_decontaminate)
_SH4 = (
    "list_distinct(list_transform("
    "range(1, greatest(len(ts) - 3, 1) + 1), "
    "i -> array_to_string(ts[i:i+3], ' ')))"
)

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def _curation_oracle() -> str:
    band_case = (
        f"CASE b.band_idx WHEN 0 THEN h0 * {MH_P} + h1 "
        f"WHEN 1 THEN h2 * {MH_P} + h3 "
        f"WHEN 2 THEN h4 * {MH_P} + h5 "
        f"ELSE h6 * {MH_P} + h7 END"
    )
    jac = (
        "floor(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(sa.sh, sb.sh))) * 10000) / 10000"
    )
    stop_ratio = (
        f"CAST(len(list_filter(ts, x -> list_contains({_STOP_SQL}, x)))"
        f" AS DOUBLE) / len(ts)"
    )
    return rf"""
    WITH d0 AS (
        SELECT doc_id, text, lang, source, n_chars
        FROM documents WHERE text IS NOT NULL
    ), s1 AS (
        -- stage 1: exact dedup, min-doc_id keeper per content digest
        SELECT doc_id, text, lang, source, n_chars FROM (
            SELECT *, row_number() OVER (
                PARTITION BY sha256(text) ORDER BY doc_id) AS rn
            FROM d0
        ) WHERE rn = 1
    ), t1 AS (
        SELECT doc_id, {_TOKS} AS ts FROM s1
    ), sh3 AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(ts) - 2, 1) + 1),
                   i -> array_to_string(ts[i:i+2], ' '))) AS strs
        FROM t1
    ), fp AS (
        SELECT doc_id, {portable_string_hash_sql("shingle")} AS x
        FROM (SELECT doc_id, unnest(strs) AS shingle FROM sh3)
    ), sets AS (
        SELECT doc_id, list(DISTINCT x) AS sh FROM fp GROUP BY doc_id
    ), sig AS (
        SELECT doc_id, {minhash_signature_sql("x")} FROM fp GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band_idx, {band_case} AS band_val
        FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c
          ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    ), near_drops AS (
        -- stage 2: a doc drops when ANY lower-id doc verifies >= THR
        SELECT DISTINCT id_b
        FROM cand
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b
        WHERE {jac} >= {curation.NEAR_DUP_THRESHOLD}
    ), s2 AS (
        SELECT * FROM s1
        WHERE NOT EXISTS (SELECT 1 FROM near_drops d WHERE d.id_b = s1.doc_id)
    ), bench AS (
        -- stage 3: bench shingles from the FULL corpus's src0 docs
        SELECT DISTINCT shingle FROM (
            SELECT unnest({_SH4}) AS shingle
            FROM (SELECT {_TOKS} AS ts FROM d0
                  WHERE source = '{curation.BENCH_SOURCE}')
        )
    ), train AS (
        SELECT * FROM s2 WHERE source <> '{curation.BENCH_SOURCE}'
    ), contaminated AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest({_SH4}) AS shingle
            FROM (SELECT doc_id, {_TOKS} AS ts FROM train)
        ) t JOIN bench b ON t.shingle = b.shingle
    ), s3 AS (
        SELECT * FROM train
        WHERE NOT EXISTS
            (SELECT 1 FROM contaminated c WHERE c.doc_id = train.doc_id)
    ), s4 AS (
        -- stage 4: corpus filter + 4-dp quality carry
        SELECT doc_id, source,
               CAST(len(ts) AS BIGINT) AS n_tokens,
               floor((least(1.0, len(ts) / 50.0) * 0.5
                     + (1.0 - {stop_ratio}) * 0.3
                     + least(1.0, length(text) / 200.0) * 0.2) * 10000)
                   / 10000 AS quality
        FROM (SELECT *, {_TOKS} AS ts FROM s3)
        WHERE lang = 'en'
          AND len(ts) BETWEEN 10 AND 1000
          AND n_chars >= 50
          AND {stop_ratio} < 0.5
    ), capped AS (
        -- stage 5: per-source domain cap in doc_id order
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY doc_id) AS rn
            FROM s4
        ) WHERE rn <= {curation.PER_SOURCE_CAP}
    ), packed AS (
        -- stage 6: concat-and-chunk sequence packing
        SELECT doc_id, source, n_tokens, quality,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start
        FROM capped
    )
    SELECT doc_id, source, n_tokens, quality,
           CAST(start // {curation.SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(start % {curation.SEQ_LEN} AS BIGINT) AS offset_in_seq
    FROM packed
    """


@query("q_llm_curation_pipeline", oracle=_curation_oracle())
def q_llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed batch curation dataflow — see the module and
    llm/curation.py docstrings for stage semantics and the 100 TB
    plan shape.

    Not a bench headliner: the near-dup stage deliberately rides the
    ORACLE-REPLAYABLE portable-MinHash machinery (q_dedup_jaccard),
    whose per-character portable hash is the documented constant the
    hash grade costs; the production pipeline swaps in the xxhash64
    LSH (dedup.near_duplicates, the q_dedup_near headliner) for a
    ~6x cheaper pair stage with identical plan shape."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return curation.curate_documents(docs)


@query("q_llm_curation_stream", oracle=_curation_oracle())
def q_llm_curation_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed-ingestion twin: documents arrive over the two-phase
    availableNow protocol (doc_id-split halves, checkpoint-resumed
    restart between phases) into the epoch-keyed-overwrite staging
    sink, the FINAL epoch is deliberately re-delivered (the
    at-least-once crash model of q_stream_foreachbatch_exactly_once),
    and the batch curation runs over the staged table.  Hash-graded
    against the SAME oracle as the batch form — a lost batch, a
    doubled epoch, or a schema drift in staging all fail the grade."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.ingest import run_two_phase

    docs = load_table(spark, sf_dir, "documents")
    p0 = docs.filter(F.pmod(F.hash("doc_id"), F.lit(2)) == 0)
    p1 = docs.filter(F.pmod(F.hash("doc_id"), F.lit(2)) != 0)
    staged = run_two_phase(
        spark,
        [p0, p1],
        lambda s: s,
        prefix="q_llm_cur_stream_",
        replay_last_epoch=True,
    )
    return curation.curate_documents(staged)
