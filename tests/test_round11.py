"""Round-11 pins: the four ADVICE r10 findings, each fixed and
regression-tested here.

1. NULL block keys must emit NOTHING from the per-block GEMM helpers
   (`near_pairs_within_blocks`, `semdedup_drop_within_blocks`,
   `clusters_within_blocks`) — the expression-form equi-joins they
   claim hash-identity with never match NULL = NULL, whereas a bare
   groupBy keeps ONE NULL-key group and would pair rows inside it.
2. The clamped string tiebreak proxy must map a NULL input to a NULL
   proxy (not _PROXY_HIGH) so approx_percentile keeps IGNORING NULL
   tiebreaks in the hot-value sub-cut probe.
3. `tools.bench_ab.adjudicate` must exclude NaN ratios (zero old
   median) from the field multiplier and flag those queries
   explicitly instead of silently emptying FLAGGED.
4. `asof_join` / `asof_join_nearest` must ignore right rows with a
   NULL timestamp (the oracle ASOF inequality is NULL for them).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_null_block_keys_emit_no_pairs(spark):
    """ADVICE r10 #1: a NULL block must behave like the equi-join —
    no pairs, no drops, no cluster rows from the NULL-key group."""
    from etl_caltopo_spark.llm.dedup import (
        clusters_within_blocks,
        semdedup_drop_within_blocks,
    )
    from etl_caltopo_spark.llm.similarity import near_pairs_within_blocks

    rows = [
        (1, None, [1.0, 0.0]),   # NULL block: would pair with 2
        (2, None, [1.0, 0.0]),
        (3, "b", [0.0, 1.0]),    # real block: pairs with 4
        (4, "b", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, blk string, embedding array<double>"
    )

    pairs = near_pairs_within_blocks(df, "blk", 0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(3, 4)}

    drops = semdedup_drop_within_blocks(df, "blk", 0.9).collect()
    assert sorted(r["vec_id"] for r in drops) == [4]

    clusters = clusters_within_blocks(df, "blk", 0.5).collect()
    # clustering is VERTEX-COMPLETE: NULL-block rows contribute no
    # edges (equi-join semantics) but still come out as their own
    # singleton clusters, exactly as the oracle's recursive closure
    # emits them; in-block rows 3/4 merge onto the min id
    assert {(r["vec_id"], r["cluster_id"]) for r in clusters} == {
        (1, 1),
        (2, 2),
        (3, 3),
        (4, 3),
    }


def test_tiebreak_proxy_null_input_stays_null(spark):
    """ADVICE r10 #2: with the r10 clamp active (offset>0 + prefix), a
    NULL tiebreak string must yield a NULL proxy — previously it fell
    through both when() branches into the _PROXY_HIGH clamp."""
    from etl_caltopo_spark.operators.rank import _PROXY_HIGH, _tiebreak_proxy

    df = spark.createDataFrame(
        [("abXYZ",), ("aaQQQ",), ("acQQQ",), (None,)], "s string"
    )
    got = {
        r["s"]: r["p"]
        for r in df.select(
            "s", _tiebreak_proxy("s", "string", offset=2, prefix=b"ab").alias("p")
        ).collect()
    }
    assert got[None] is None
    assert got["aaQQQ"] == -1
    assert got["acQQQ"] == _PROXY_HIGH
    assert 0 < got["abXYZ"] < _PROXY_HIGH


def test_bench_ab_adjudicate_nan_guard():
    """ADVICE r10 #3: a zero old-median must not poison the field
    multiplier; the affected query is flagged, finite ratios still
    adjudicate normally."""
    import pytest

    from tools.bench_ab import adjudicate

    med_old = {"a": 1.0, "b": 2.0, "c": 0.0, "d": 1.0, "e": 1.0}
    med_new = {"a": 1.1, "b": 2.2, "c": 0.5, "d": 1.1, "e": 5.0}
    field, adjusted, flagged, unmeasurable = adjudicate(med_old, med_new)
    assert unmeasurable == ["c"]
    assert abs(field - 1.1) < 1e-12          # median of the FINITE ratios
    assert "c" in flagged and "e" in flagged  # zero-median + real mover
    assert "a" not in flagged and "b" not in flagged
    assert adjusted["c"] != adjusted["c"]     # NaN preserved, labeled

    with pytest.raises(ValueError):
        adjudicate({"x": 0.0}, {"x": 1.0})    # nothing finite → loud

    # even-length finite list: TRUE median (mean of the two middle
    # ratios), not the upper-middle element (r11 review)
    field_even, _, _, _ = adjudicate(
        {"a": 1.0, "b": 1.0}, {"a": 0.9, "b": 1.3}
    )
    assert abs(field_even - 1.1) < 1e-12


def test_asof_joins_ignore_null_right_ts(spark):
    """ADVICE r10 #4: a right row with a NULL timestamp satisfies
    neither ASOF inequality — it must never surface as a backward or
    forward candidate, in either operator."""
    from etl_caltopo_spark.operators.joins import asof_join, asof_join_nearest

    ts = lambda s: datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, ts(10)), (2, ts(10))], "k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, None, 99),       # NULL ts: must match nothing
            (2, None, 99),
            (2, ts(3), 7),       # real earlier row for k=2
        ],
        "k long, rts timestamp, v int",
    )

    back = {
        r["k"]: (r["asof_rts"], r["asof_v"])
        for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    }
    assert back[1] == (None, None)            # only a NULL-ts candidate
    assert back[2] == (ts(3), 7)

    near = {
        r["k"]: (r["nearest_rts"], r["nearest_v"])
        for r in asof_join_nearest(
            left, right, ["k"], "lts", "rts", ["v"]
        ).collect()
    }
    assert near[1] == (None, None)
    assert near[2] == (ts(3), 7)
