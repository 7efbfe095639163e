"""Property-based checks (hypothesis) for the text operators: bigram
shape invariants, PII-redaction idempotence, sessionization partition
invariants — brute-force per-row references over arbitrary inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_caltopo_spark.llm.text import PII_RULES, bigrams, redact_pii, tokens

words = st.lists(
    st.text(alphabet="abcxyz019@.-", min_size=1, max_size=8), min_size=0, max_size=10
)


def _py_redact(s: str) -> str:
    for pattern, repl in PII_RULES:
        s = re.sub(pattern, repl, s)
    return s


@settings(max_examples=15, deadline=None)
@given(words)
def test_bigram_count_and_adjacency(spark, ws):
    text = " ".join(ws)
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        tokens(F.col("t")).alias("toks"), bigrams(F.col("t")).alias("bg")
    ).collect()[0]
    toks, bg = row["toks"], row["bg"]
    # exactly max(0, n_tokens - 1) bigrams, each the join of neighbors
    assert len(bg) == max(0, len(toks) - 1)
    for i, b in enumerate(bg):
        assert b == f"{toks[i]} {toks[i + 1]}"


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="abcxyz019@.- \n+", max_size=40))
def test_redact_matches_python_reference_and_is_idempotent(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    once = df.select(redact_pii(F.col("t")).alias("r")).collect()[0]["r"]
    twice = df.select(redact_pii(redact_pii(F.col("t"))).alias("r")).collect()[0]["r"]
    assert once == _py_redact(s)  # Java regex == Python re on the shared subset
    assert twice == once  # replacement tokens are fixed points
