"""Wide-values engine-side pins (round 14 PROBE — the axis is NOT yet
claimed; these pin the five ENGINE fixes the probe forced).

The probe injects multi-hundred-KB pathological documents (a 200KB
unbroken token, a 100k-tiny-token doc, shingle floods, punctuation
storms) — the shapes a real 100 TB corpus carries (base64 blobs, DNA
reads, minified JS, log spam).  Five engine-side superlinear seams
were found and fixed (HANDOFF knowledge #37):

1. ``shingles()`` captured the full tokenization EXPRESSION inside
   its per-shingle lambda — Spark re-evaluates captured outer
   expressions on EVERY lambda invocation, so one wide doc re-ran
   lower/translate/trim/split per shingle (10+ min in
   UTF8String.translate).  Fixed with :func:`bind_once`.
2. ``portable_string_hash_col`` walked characters positionally
   (``substr(jj, 1)``) — O(position) per access on UTF-8, so one
   200KB token cost O(n²).  Now ``split('')`` + indexed transform,
   value-identical at O(n) (same on the DuckDB mirror).
3. ``q_bpe_pairs`` extracted pairs with ``substring(tok, i, 2)`` —
   the same positional-walk quadratic (measured 523 s → 5.6 s).
4. ``q_bpe_merge``'s per-symbol rows carried the full WORD STRING as
   their partition key — one 200KB token exploded to 200k rows ×
   200KB ≈ 40 GB in a single task (executor OOM).  Symbols now key
   on a compact xxhash64 word id.
5. The PII email rule's greedy local-part class made Java's regex
   retry from every position of a long alphanumeric run (O(n²)
   rescans; 10 min in Matcher.search).  A lookbehind start-guard
   rejects mid-run attempts in O(1); match spans are provably
   unchanged (the leftmost match always starts at the run start),
   so the RE2 oracle needs no mirror.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracle import row_hash  # noqa: E402

from etl_caltopo_spark.functions.portable import (  # noqa: E402
    MH_P,
    portable_string_hash_col,
)
from etl_caltopo_spark.llm.dedup import bind_once, shingles  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

#: generous wall bound: each fixed path runs in ~1-6 s here; the
#: pre-fix forms took 8-30+ MINUTES on the same inputs
WIDE_WALL_S = 120


def _one_table(spark, tmp_path, name: str, df):
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_t")
    part = next(f for f in os.listdir(f"{d}/_t") if f.endswith(".parquet"))
    os.replace(f"{d}/_t/{part}", f"{d}/{name}.parquet")
    return d


def py_portable_hash(s: str) -> int:
    """Reference implementation of the portable string hash (exact
    semantics of both engine forms, any length)."""
    if len(s) == 0:
        return 0
    total = 0
    for j, ch in enumerate(s, start=1):
        total += ord(ch) * ((j * 2654435761 + 40503) % 65536)
    return total % MH_P


def test_portable_hash_matches_reference_and_oracle(spark):
    """The linear split-based walk must equal the positional
    definition for every string shape — ascii, unicode, astral,
    empty, whitespace — on BOTH engines."""
    cases = ["abc", "", " ", "café", "😀x", "a b c", "x" * 500,
             "İstanbul ß", "ΟΔΟΣ ς"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select(
            "s", portable_string_hash_col(F.col("s")).alias("h")
        ).collect()
    }
    for s in cases:
        assert got[s] == py_portable_hash(s), repr(s)
    from etl_caltopo_spark.functions.portable import portable_string_hash_sql

    con = duckdb.connect()
    for s in cases:
        (dh,) = con.execute(
            f"SELECT {portable_string_hash_sql('s')} FROM (SELECT ? AS s)",
            [s],
        ).fetchone()
        assert dh == py_portable_hash(s), repr(s)


def test_shingles_linear_on_wide_token(spark):
    """One 100KB unbroken token: the capture fix makes this seconds;
    the pre-fix form re-tokenized per shingle (minutes)."""
    wide = "x" * 100_000
    flood = "lorem ipsum dolor sit amet " * 4000
    df = spark.createDataFrame(
        [(1, wide), (2, flood), (3, "small doc three words")],
        "id long, text string",
    )
    t0 = time.time()
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", F.size(shingles(F.col("text"))).alias("n")
        ).collect()
    }
    assert time.time() - t0 < WIDE_WALL_S
    assert out == {1: 1, 2: 5, 3: 2}  # 4-token doc → 2 trigrams


def test_bind_once_evaluates_argument_once(spark):
    """The mechanism pin: bind_once(expr, fn) must give fn a lambda
    VARIABLE — the inner lambda indexing it stays O(1) — and return
    fn's value unchanged."""
    df = spark.createDataFrame([([1, 2, 3],)], "xs array<long>")
    out = df.select(
        bind_once(
            F.col("xs"),
            lambda a: F.transform(a, lambda x: x * F.size(a)),
        ).alias("r")
    ).collect()[0]["r"]
    assert out == [3, 6, 9]


def test_bpe_pairs_wide_token_fast_and_correct(spark, tmp_path):
    """523 s → seconds on the 200KB token; pair values unchanged
    (the oracle runs the same linear recipe)."""
    docs = spark.createDataFrame(
        [(1, "x" * 100_000, 3, "s", "en"), (2, "ab ab ab", 8, "s", "en")],
        "doc_id long, text string, n_chars long, source string, lang string",
    )
    d = _one_table(spark, tmp_path, "documents", docs)
    spec = REGISTRY["q_bpe_pairs"]
    t0 = time.time()
    sdf = spec.fn(spark, d)
    s_rows = [tuple(r) for r in sdf.collect()]
    assert time.time() - t0 < WIDE_WALL_S
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    res = con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    assert row_hash(sdf.columns, s_rows) == row_hash(d_cols, res.fetchall())
    top = dict((r[0], r[1]) for r in s_rows)
    assert top["xx"] == 99_999  # every adjacent pair of the wide token


def test_bpe_merge_wide_token_no_oom(spark, tmp_path):
    """The 40 GB single-task blow-up pin: per-symbol rows key on the
    compact wid, so a 100KB single-token word streams through the
    windows without materializing word-string copies."""
    docs = spark.createDataFrame(
        [(1, "y" * 100_000, 3, "s", "en"), (2, "ab ab", 5, "s", "en")],
        "doc_id long, text string, n_chars long, source string, lang string",
    )
    d = _one_table(spark, tmp_path, "documents", docs)
    t0 = time.time()
    out = REGISTRY["q_bpe_merge"].fn(spark, d).collect()
    assert time.time() - t0 < WIDE_WALL_S
    assert len(out) == 3  # three merge rounds complete
    # round 1 must merge the dominant yy pair of the wide word
    assert (out[0]["pair_a"], out[0]["pair_b"]) == ("y", "y")


def test_pii_redact_wide_run_fast_and_span_identical(spark, tmp_path):
    """The lookbehind is performance-only: an email embedded at the
    END of a long alphanumeric run still redacts from the run start
    on both engines, and the 200KB no-match run costs O(n)."""
    long_run = "a" * 100_000
    docs = spark.createDataFrame(
        [
            (1, long_run, 6, "s", "en"),  # no email: O(n) scan
            (2, "zzzuser@x.com ok", 16, "s", "en"),  # run-start match
        ],
        "doc_id long, text string, n_chars long, source string, lang string",
    )
    d = _one_table(spark, tmp_path, "documents", docs)
    spec = REGISTRY["q_pii_redact"]
    t0 = time.time()
    sdf = spec.fn(spark, d)
    s_rows = [tuple(r) for r in sdf.collect()]
    assert time.time() - t0 < WIDE_WALL_S
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    res = con.execute(spec.oracle)
    assert row_hash(sdf.columns, s_rows) == row_hash(
        [x[0] for x in res.description], res.fetchall()
    )
    clean2 = next(r for r in s_rows if r[0] == 2)[1]
    assert clean2.startswith("<EMAIL> ok")  # zzzuser@x.com fully redacted
