"""Composition pins for the LLM curation pipeline (round 12,
VERDICT r11 #2).  Hash parity vs the DuckDB replay is graded by
check_oracle / the seven sweep modes; these tests pin the
COMPOSITIONAL invariants a parity hash can't articulate when it
breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.llm import curation

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return curation.curate_documents(docs).collect()


def test_benchmark_source_never_survives(curated):
    assert all(r["source"] != curation.BENCH_SOURCE for r in curated)
    assert len(curated) > 0


def test_domain_cap_respected(curated):
    from collections import Counter

    per_source = Counter(r["source"] for r in curated)
    assert all(n <= curation.PER_SOURCE_CAP for n in per_source.values())


def test_packing_is_contiguous_per_source(curated):
    """seq_id/offset must replay as a per-source running token count
    in doc_id order — concat-and-chunk leaves no gaps."""
    by_source: dict[str, list] = {}
    for r in curated:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r["doc_id"])
        start = 0
        for r in rows:
            assert r["seq_id"] == start // curation.SEQ_LEN
            assert r["offset_in_seq"] == start % curation.SEQ_LEN
            assert 0 <= r["offset_in_seq"] < curation.SEQ_LEN
            start += r["n_tokens"]


def test_survivors_pass_every_upstream_stage(spark, curated):
    """Each output doc is an exact-dedup keeper, is not an exact or
    near duplicate's loser, shares no 4-shingle with the benchmark
    source, and passes the corpus filter."""
    from etl_caltopo_spark.llm import dedup, text

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("text").isNotNull()
    )
    ids = [r["doc_id"] for r in curated]
    sub = docs.filter(F.col("doc_id").isin(ids))

    # exact-dedup keepers: doc_id == min doc_id of its digest group
    keepers = {
        r["keeper_id"]
        for r in dedup.exact_dup_groups(docs, "text", "doc_id").collect()
    }
    assert set(ids) <= keepers

    # corpus filter holds
    toks = text.tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*text.STOPWORDS)))
    bad = sub.filter(
        ~(
            (F.col("lang") == "en")
            & n_tok.between(10, 1000)
            & (F.col("n_chars") >= 50)
            & ((n_stop.cast("double") / n_tok) < 0.5)
        )
    ).count()
    assert bad == 0

    # decontamination holds: no surviving doc shares a 4-shingle with
    # any src0 doc
    bench = (
        docs.filter(F.col("source") == curation.BENCH_SOURCE)
        .select(F.explode(dedup.shingles(F.col("text"), n=4)).alias("sh"))
        .distinct()
    )
    hits = (
        sub.select("doc_id", F.explode(dedup.shingles(F.col("text"), n=4)).alias("sh"))
        .join(bench, "sh", "left_semi")
        .count()
    )
    assert hits == 0


def test_near_dup_losers_are_dropped(spark, curated):
    """Every id_b of a verified >=threshold pair among exact-dedup
    survivors is absent from the output."""
    from etl_caltopo_spark.llm import dedup
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("text").isNotNull()
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    s1 = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    losers = {
        r["id_b"]
        for r in dedup.minhash_banded_jaccard_pairs(
            s1, "text", "doc_id", threshold=curation.NEAR_DUP_THRESHOLD
        ).collect()
    }
    assert losers, "fixture must exercise the near-dup stage"
    assert losers.isdisjoint({r["doc_id"] for r in curated})


def test_stream_twin_matches_batch(spark):
    """The staged-ingestion form produces the identical curated set —
    the exactly-once staging claim, asserted row for row."""
    from etl_caltopo_spark.queries import REGISTRY

    batch = {
        tuple(r)
        for r in REGISTRY["q_llm_curation_pipeline"].fn(spark, SF_DIR).collect()
    }
    streamed = {
        tuple(r)
        for r in REGISTRY["q_llm_curation_stream"].fn(spark, SF_DIR).collect()
    }
    assert batch == streamed and len(batch) > 0


def test_production_neardup_dial_composes(spark):
    """portable_neardup=False swaps stage 2 to the xxhash64 LSH
    (production path): same schema, same downstream invariants —
    candidates are hash-family-specific so only the portable form is
    oracle-graded."""
    docs = load_table(spark, SF_DIR, "documents")
    out = curation.curate_documents(docs, portable_neardup=False).collect()
    assert len(out) > 0
    assert {f for r in out for f in r.asDict()} == {
        "doc_id", "source", "n_tokens", "quality", "seq_id", "offset_in_seq"
    }
    from collections import Counter

    per_source = Counter(r["source"] for r in out)
    assert all(n <= curation.PER_SOURCE_CAP for n in per_source.values())
    assert all(r["source"] != curation.BENCH_SOURCE for r in out)
