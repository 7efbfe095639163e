"""Tests for the round-4 rows-only → hash-graded conversions: the
portable-hash sample draw, the md5-based rolling fingerprint, and the
approx-quantile rank certificate (VERDICT r3 item 1)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.queries.extended import q_csv_roundtrip, q_sample
from etl_caltopo_spark.queries.extended2 import q_percentile_approx
from etl_caltopo_spark.queries.llm_pipeline import q_doc_rolling_hash


def test_sample_rate_and_partition_invariance(spark, sf_dir):
    """The multiplicative-hash draw lands near 10% and is bitwise
    identical under any partition layout (the property rand()-based
    TABLESAMPLE lacks)."""
    out = q_sample(spark, sf_dir)
    from etl_caltopo_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n, total = out.count(), li.count()
    assert 0.07 <= n / total <= 0.13, (n, total)

    base = {tuple(r) for r in out.collect()}
    combined = F.col("l_orderkey").cast("long") * F.lit(8) + F.col("l_linenumber")
    h1 = (combined % F.lit(2147483648)) * F.lit(1113114113) % F.lit(2147483648)
    reparted = (
        li.repartition(7, "l_partkey")
        .filter(F.pmod(F.floor(h1 / F.lit(65536)), F.lit(10)) == 0)
        .select("l_orderkey", "l_linenumber")
    )
    assert {tuple(r) for r in reparted.collect()} == base


def test_rolling_hash_is_order_sensitive_and_portable(spark, sf_dir):
    """The fingerprint distinguishes reordered token streams (a
    bag-of-words digest would collapse them) and matches a pure-python
    replay of the md5-prefix polynomial — the portability contract the
    DuckDB oracle relies on."""
    import hashlib

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("_rh_docs")

    token_hashes = F.transform(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    rolling = F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(2_147_483_647),
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", rolling.alias("fp")).collect()}
    assert got[1] != got[2] and got[1] == got[3]

    def replay(text: str) -> int:
        acc = 0
        for tok in text.strip().lower().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            acc = (acc * 31 + h) % 2_147_483_647
        return acc

    assert got[1] == replay("alpha beta gamma")
    assert got[2] == replay("gamma beta alpha")


def test_percentile_certificate_and_value_tolerance(spark, sf_dir):
    """The graded certificate holds (every group TRUE) and the raw
    approx quantiles sit within sketch tolerance of DuckDB's exact
    quantiles — the bounded-error check behind the certificate."""
    cert = {r["l_returnflag"]: r.asDict() for r in q_percentile_approx(spark, sf_dir).collect()}
    assert cert and all(v["median_rank_ok"] and v["p99_rank_ok"] for v in cert.values())

    from etl_caltopo_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    appx = {
        r["l_returnflag"]: (r["m"], r["p99"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("m"),
            F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99"),
        )
        .collect()
    }
    con = duckdb.connect()
    exact = {
        flag: (m, p)
        for flag, m, p in con.sql(
            f"""
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5),
                   quantile_cont(l_extendedprice, 0.99)
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY l_returnflag
            """
        ).fetchall()
    }
    for flag, (m, p) in appx.items():
        em, ep = exact[flag]
        # rank error <= eps translates to a value band; on this data a
        # 2% relative band comfortably covers eps=0.005 of rank mass
        assert abs(m - em) / em < 0.02, (flag, m, em)
        assert abs(p - ep) / ep < 0.02, (flag, p, ep)


def test_csv_roundtrip_is_lossless(spark, sf_dir):
    """CSV write → read returns exactly the nation table."""
    from etl_caltopo_spark.io import load_table

    got = {tuple(r) for r in q_csv_roundtrip(spark, sf_dir).collect()}
    want = {
        tuple(r)
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    }
    assert got == want and got


def test_portable_string_hash_matches_duckdb(spark):
    """The shared fingerprint behind every graded sketch/LSH id
    (_portable_string_hash) must agree byte-for-byte with its DuckDB
    mirror on adversarial strings: unicode, long runs, single chars,
    anagram pairs (the position weighting must separate them)."""
    import duckdb

    from etl_caltopo_spark.queries.extended10 import _portable_string_hash

    samples = [
        "hello", "olleh", "a", "zz", "the quick brown fox", "café",
        "écaf", "x" * 200, "na" * 50, "an" * 50, "join vector stream",
        "0123456789", "9876543210",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", _portable_string_hash("s").alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            """
            SELECT CAST(list_sum(list_transform(range(1, length(?) + 1),
                j -> ascii(?[CAST(j AS INT)])
                     * (((j * 2654435761) + 40503) % 65536))) % 2147483647
                AS BIGINT)
            """,
            [s, s],
        ).fetchone()[0]
        assert got[s] == want, (s, got[s], want)
    # anagrams must hash differently (position weighting)
    assert got["hello"] != got["olleh"]
    assert got["na" * 50] != got["an" * 50]


def test_cdc_hash_no_int64_overflow_on_megatoken(spark):
    """ADVICE r4: the q_cdc_chunk/q_hash_embed fingerprint must reduce
    the code-point sum mod 2^31-1 BEFORE multiplying by 2654435761 —
    unreduced, a single multi-thousand-char high-codepoint token
    (unsegmented CJK) silently wraps int64 in Spark while DuckDB
    promotes to HUGEINT, so engines diverge.  Pin Spark against an
    arbitrary-precision Python replay."""
    tok = "鿿" * 5000  # code-point sum 5000 * 0x9fff ≈ 2.04e8; the
    # unreduced product with a second such token would differ from the
    # reduced one — use a sum that crosses 2^31 to exercise the mod
    tok_big = "\U0010fffd" * 4000  # sum ≈ 4.46e9 > 2^31-1
    df = spark.createDataFrame([(1, tok), (2, tok_big)], "doc_id int, tok string")
    code_sum = F.aggregate(
        F.transform(F.split(F.col("tok"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    fp = (
        (code_sum % 2147483647) * 2654435761
        + F.length("tok").cast("long") * 1000003
    ) % 4294967296
    got = {r["doc_id"]: (r["cs"], r["fp"]) for r in
           df.select("doc_id", code_sum.alias("cs"), fp.alias("fp")).collect()}

    for doc_id, text in [(1, tok), (2, tok_big)]:
        cs = sum(ord(c) for c in text)
        expect = ((cs % 2147483647) * 2654435761 + len(text) * 1000003) % 4294967296
        assert got[doc_id][0] == cs, (doc_id, got[doc_id][0], cs)
        assert got[doc_id][1] == expect, (doc_id, got[doc_id][1], expect)
        assert 0 <= got[doc_id][1] < 4294967296
    # the big token's UNREDUCED product exceeds int64 — the reduction is
    # what keeps Spark's long arithmetic exact
    assert sum(ord(c) for c in tok_big) * 2654435761 > 2**63


def test_empty_string_hash_pinned_zero(spark):
    """hash('') is DEFINED as 0 in both engines (code-review r6):
    Spark's sequence(1,0) yields a descending [1,0] while DuckDB's
    range(1,1) is [] (list_sum NULL) — without the explicit pin an
    empty shingle from a whitespace-only document silently splits the
    engines in every shingle-based graded id."""
    import duckdb

    from etl_caltopo_spark.functions.portable import (
        portable_string_hash,
        portable_string_hash_sql,
    )

    df = spark.createDataFrame([("",), ("a",), ("xy",)], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_string_hash("s").alias("h")).collect()
    }
    want = {
        s: h
        for s, h in duckdb.connect()
        .execute(
            f"SELECT s, {portable_string_hash_sql('s')} AS h "
            "FROM (VALUES (''), ('a'), ('xy')) t(s)"
        )
        .fetchall()
    }
    assert got == want and got[""] == 0


def test_vertical_tab_tokenization_parity(spark):
    """Java's \\s matches vertical tab (\\x0B); RE2's (DuckDB's) does
    not.  tokens() spells RE2's class out explicitly so a \\x0B
    document tokenizes identically in both engines (code-review r6)."""
    import duckdb

    from pyspark.sql import functions as F

    from etl_caltopo_spark.llm import text

    doc = "hello\x0bworld foo\tbar\nbaz"
    got = (
        spark.createDataFrame([(doc,)], "text string")
        .select(text.tokens(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    want = (
        duckdb.connect()
        .execute(r"SELECT string_split_regex(trim(lower(?)), '\s+')", [doc])
        .fetchall()[0][0]
    )
    assert got == want
    assert "hello\x0bworld" in got  # \x0B is NOT a separator
