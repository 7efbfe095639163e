"""Permanent adversarial-Unicode text fixture (VERDICT r8 #5).

The r8 unitext sweep lives in tools/degenerate_sweep.py — a replica-mode
TOOL, so the U+0130 / Final_Sigma class of cross-engine case-folding
bugs could silently regress if the tool rots.  This test pins a small
COMMITTED adversarial corpus (CJK / emoji / combining marks / ZWSP /
control whitespace / Turkish İ / Greek Final_Sigma) and routes three
existing graded text ids through it with the full Spark-vs-DuckDB hash
compare inline, so a portable_lower regression fails pytest directly.

The Greek rows pin the r9 advisor finding: Java toLowerCase applies the
conditional Final_Sigma rule (word-final Σ → ς) while DuckDB's utf8proc
always yields σ; portable_lower (llm/text.py) pre-maps Σ → σ so the
rule never fires, and a literal ς passes through both engines 1:1.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_oracle import row_hash  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: The committed corpus — each class the r8/r9 sweeps probed, pinned.
#: Order matters only for doc_id assignment; content is the contract.
ADVERSARIAL_DOCS: tuple[str, ...] = (
    "",
    "   \t  ",
    "café naïve résumé über",      # precomposed + combining
    "你好世界 中文 tokens here",
    "emoji \U0001F600 \U0001F680 mixed with words",
    "tab\tsep\nnewline\r\nCRLF vertical\x0btab form\x0cfeed",
    "zero​width​space joined words",
    "UPPER lower MiXeD İstanbul İİ ß sharp",   # U+0130 unconditional
    "ΟΔΟΣ ΣΟΦΙΑΣ",                             # word-final Σ (Final_Sigma)
    "σΣ ΣΙΓΜΑ trailing Σ",                     # Σ after cased letter
    "already ς final sigma literal ς here",    # literal ς must pass 1:1
    "mixed ΕΛΛΑΣ and english the and of",      # Σ + stopwords interplay
)


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    """sf0.001 with documents.text overwritten for the first
    len(ADVERSARIAL_DOCS) doc_ids (one row per corpus entry, the rest
    of the table untouched so aggregates keep realistic mass)."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("advsf"))
    for t in TABLES:
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{d}/{t}.parquet")
    docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    expr = F.col("text")
    for i, s in enumerate(ADVERSARIAL_DOCS):
        expr = F.when(F.col("doc_id") == i, F.lit(s)).otherwise(expr)
    docs = docs.withColumn("text", expr)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/_docs")
    part = next(f for f in os.listdir(f"{d}/_docs") if f.endswith(".parquet"))
    os.replace(f"{d}/_docs/{part}", f"{d}/documents.parquet")
    shutil.rmtree(f"{d}/_docs")
    return d


#: tokens()-derived, fingerprint-derived, and syllable-regex-derived —
#: the three distinct consumers of portable_lower.
ADVERSARIAL_IDS = ["q_text_stats", "q_doc_fingerprint", "q_readability"]


@pytest.mark.parametrize("qid", ADVERSARIAL_IDS)
def test_adversarial_text_parity(spark, adversarial_sf, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, adversarial_sf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adversarial_sf}/{t}.parquet')"
        )
    res = con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows)


def test_portable_lower_pins_both_special_casings(spark):
    """Direct unit pin: portable_lower output equals DuckDB lower()
    for the two SpecialCasing code points and a literal ς."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.llm.text import portable_lower

    samples = ["ΟΔΟΣ", "ΟΔΟΣ ΣΟΦΙΑΣ", "σΣ", "ς stays ς", "İstanbul İİ", "Mixed ΑΣΚΗΣΙΣ End"]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r[0] for r in sdf.select(portable_lower(F.col("s"))).collect()]
    con = duckdb.connect()
    want = [con.execute("select lower(?)", [s]).fetchone()[0] for s in samples]
    assert got == want
