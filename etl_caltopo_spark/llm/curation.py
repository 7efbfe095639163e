"""The composed LLM training-data curation pipeline (round 12,
VERDICT r11 #2) — the LLM-side analog of caltopo/pipeline.run_pipeline:
one dataflow chaining the individually-graded curation stages over
``documents``, end to end.

Stage order (the standard corpus-curation sequence — dedup before
filtering so filters never rescue a duplicate, decontamination before
quality so benchmark leakage can't survive on quality merit):

1. **Exact dedup** — keep the min doc_id per sha256(text) group
   (q_dedup_exact's keeper rule applied as a filter).
2. **Near-dup drop** — banded-MinHash candidates verified with exact
   3-gram Jaccard (dedup.minhash_banded_jaccard_pairs — the
   engine-portable q_dedup_jaccard machinery); a doc drops when ANY
   lower-id doc scores >= threshold against it.  Non-cascading by
   design: the witness itself may drop later for other reasons — the
   rule is a pure function of the pair set, deterministic and
   SQL-replayable, where a cascading rule would be order-dependent.
3. **Decontaminate** — source 'src0' stands in for the held-out
   benchmark: all src0 docs leave the training set, and any surviving
   training doc sharing a 4-token shingle with ANY src0 doc (from the
   full corpus, pre-dedup — a benchmark twin that lost stage 1 to a
   training copy must still contaminate that copy) drops
   (q_decontaminate's inverted-index join as a filter).
4. **Quality/corpus filter** — q_corpus_filter's four C4-style rules
   (lang, token-length window, raw size, stopword soup), carrying
   q_quality_score's 4-dp composite for downstream weighting.
5. **Domain cap** — at most ``per_source_cap`` docs per source in
   doc_id order (the mixture-balancing step, q_corpus_mix's concern
   as a hard cap).
6. **Sequence packing** — q_seq_pack's concat-and-chunk over the
   survivors: per-source running token offsets cut into fixed
   ``seq_len`` windows.

Scale shape (each stage is its graded twin's plan, composed):
digest-window shuffle (1) → banded equi-join candidates + set-verify
joins (2; pair work rides the band-collision tail, never |corpus|²) →
shingle-keyed semi-join against the vocabulary-bounded broadcast bench
index (3) → map-only flags (4) → ONE per-source shuffle shared by the
cap and pack windows (5+6; same partition key and sort order, so
Catalyst reuses the exchange and sort).  At 100 TB the per-source
windows become (source, shard)-keyed exactly as q_seq_pack documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.llm import dedup, text

#: near-dup drop threshold (q_dedup_near's default band)
NEAR_DUP_THRESHOLD = 0.4
#: per-source document cap (bites at sf >= 0.01: ~250 docs/source)
PER_SOURCE_CAP = 20
#: training sequence length (q_seq_pack's window)
SEQ_LEN = 2048
#: the held-out benchmark source (q_decontaminate's convention)
BENCH_SOURCE = "src0"


def curate_documents(
    docs: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    per_source_cap: int = PER_SOURCE_CAP,
    seq_len: int = SEQ_LEN,
    bench_source: str = BENCH_SOURCE,
    portable_neardup: bool = True,
) -> DataFrame:
    """Run the full curation chain over a ``documents``-shaped frame
    (doc_id, text, lang, source, n_chars).  Output: one row per
    curated doc — (doc_id, source, n_tokens, quality, seq_id,
    offset_in_seq), hash-gradeable (integers + 4-dp floored quality).

    ``portable_neardup`` is the grade-vs-throughput dial for stage 2:
    True (default, the graded form) uses the DuckDB-replayable banded
    portable MinHash (q_dedup_jaccard machinery — its per-character
    portable hash is the documented cost of the hash grade); False
    swaps in the production xxhash64 LSH (dedup.near_duplicates, the
    q_dedup_near headliner) — same plan shape, same exact-Jaccard
    verification, ~6x cheaper pair stage, but hash-family-specific
    candidates, so only the portable form is oracle-graded.
    """
    from etl_caltopo_spark.operators.rank import pin_frame

    # NULL documents carry no text to train on (r8 NULL policy)
    d0 = docs.where(F.col("text").isNotNull())

    # 1. exact dedup: min doc_id per content digest.  PINNED: the
    # survivor set feeds the near-dup fingerprint build (its own eager
    # job inside minhash_banded_jaccard_pairs) AND the anti-join left
    # side — unpinned, the scan + digest window re-runs per consumer
    # (pin_frame discipline, knowledge #16/#20; identity under
    # SPARK_GRAFT_LAZY_PLANS so dumps show the real stage plan)
    w_sha = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    s1 = pin_frame(
        d0.withColumn("_rn", F.row_number().over(w_sha))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 2. near-dup drop: lower-id witness wins
    if portable_neardup:
        pairs = dedup.minhash_banded_jaccard_pairs(
            s1, "text", "doc_id", threshold=threshold
        )
    else:
        pairs = dedup.near_duplicates(
            s1, "text", "doc_id", n_hashes=16, bands=4, threshold=threshold
        )
    near_drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    s2 = s1.join(near_drops, "doc_id", "left_anti")

    # 3. decontaminate: bench = ALL src0 docs (pre-dedup), training
    # docs sharing any 4-shingle drop; src0 itself leaves the set
    bench_idx = (
        d0.filter(F.col("source") == bench_source)
        .select(F.explode(dedup.shingles(F.col("text"), n=4)).alias("shingle"))
        .distinct()
    )
    # PINNED: both the contamination probe and the surviving-rows
    # anti-join consume the training set — unpinned, the whole
    # dedup chain upstream re-runs for each
    train = pin_frame(s2.filter(F.col("source") != bench_source))
    contaminated = (
        train.select(
            "doc_id", F.explode(dedup.shingles(F.col("text"), n=4)).alias("shingle")
        )
        .join(F.broadcast(bench_idx), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    s3 = train.join(contaminated, "doc_id", "left_anti")

    # 4. corpus filter (q_corpus_filter's rules) + quality carry
    toks = text.tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*text.STOPWORDS)))
    kept = (
        (F.col("lang") == "en")
        & n_tok.between(10, 1000)
        & (F.col("n_chars") >= 50)
        & ((n_stop.cast("double") / n_tok) < 0.5)
    )
    s4 = s3.filter(kept).select(
        "doc_id",
        "source",
        text.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        text.quality_score(F.col("text")).alias("quality"),
    )

    # 5 + 6. domain cap then seq-pack: same (source, doc_id) partition
    # and order — one exchange + sort feeds both window nodes
    w_cap = Window.partitionBy("source").orderBy("doc_id")
    capped = (
        s4.withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= per_source_cap)
        .drop("_rn")
    )
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_tokens").over(w_pack) - F.col("n_tokens")
    return (
        capped.withColumn("_start", start)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "quality",
            F.expr(f"_start div {seq_len}").alias("seq_id"),
            (F.col("_start") % seq_len).alias("offset_in_seq"),
        )
    )
