"""Round-12 pins: the four ADVICE r11 findings, each fixed and
regression-tested here.

1. `ivf_candidate_pairs` / `knn_candidate_pairs` must exclude
   non-finite vectors before array_to_vector (Spark ML Vectors raise
   on a NaN/inf component) — `ivf_topk` had the guard, the
   candidate-pair entry points did not, and the extremes sweep only
   poisoned vec_id 1-3 while these paths index vec_id >= 8.
2. RUNNING_TOTALS_STATE declares `total` nullable: the design stores
   a NaN total as NULL on the state round-trip (nan_as_null) and
   restores it — the schema must admit that NULL.
3. `fround` documents the -0.0 sign exception (value-level, not
   bitwise, parity at exactly -0.0) — doc-only, pinned by the value
   equality below.
4. `_split_value_for_sum` bounds FINITE summed observations at 1e100
   (the variance-family `_VAR_SAFE`): the skipna=False arrival-order
   fold is otherwise order-dependent at overflow magnitudes
   (1.7e308 + 1.7e308 - 1.7e308 = inf one way, 1.7e308 the other).
   NaN/±inf themselves stay in — they saturate identically in any
   order.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

INF = float("inf")
NAN = float("nan")


def _emb_with_poison(spark, n: int = 24):
    """n finite unit-ish vectors (ids 0..n-1) + poisoned ids n, n+1."""
    rows = [
        (i, f"c{i % 3}", [float(i % 7) + 0.25, float((i * 3) % 5) + 0.5])
        for i in range(n)
    ]
    rows.append((n, "c0", [INF, 1.0]))
    rows.append((n + 1, "c1", [1.0, NAN]))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_ivf_candidate_pairs_excludes_nonfinite_vectors(spark):
    """ADVICE r11 #1: a NaN/inf component must neither crash KMeans
    (array_to_vector raises USER_RAISED_EXCEPTION) nor appear in any
    candidate pair."""
    from etl_caltopo_spark.llm.similarity import ivf_candidate_pairs

    emb = _emb_with_poison(spark)
    pairs = ivf_candidate_pairs(emb, n_cells=4, n_probe=2).collect()
    ids = {r["qid"] for r in pairs} | {r["nid"] for r in pairs}
    assert len(pairs) > 0
    assert 24 not in ids and 25 not in ids


def test_knn_candidate_pairs_excludes_nonfinite_on_both_paths(spark):
    """Both dispatch paths (GEMM and IVF) filter non-finite vectors
    up front, and the dispatch row count is taken AFTER the filter."""
    from etl_caltopo_spark.llm.similarity import knn_candidate_pairs

    emb = _emb_with_poison(spark)
    for max_ref in (1000, 10):  # 1000 -> gemm path, 10 -> ivf path
        out = knn_candidate_pairs(emb, k=3, max_ref_rows=max_ref)
        expect = "gemm" if max_ref == 1000 else "ivf"
        assert out.knn_dispatch_path == expect
        rows = out.collect()
        ids = {r["qid"] for r in rows} | {r["nid"] for r in rows}
        assert len(rows) > 0
        assert 24 not in ids and 25 not in ids


def test_running_totals_state_total_is_nullable():
    """ADVICE r11 #2: the stored NaN->NULL round-trip requires a
    nullable total field."""
    from etl_caltopo_spark.streaming.stateful import RUNNING_TOTALS_STATE

    assert RUNNING_TOTALS_STATE["total"].nullable is True


def test_fround_negative_zero_value_parity(spark):
    """ADVICE r11 #3: fround(-0.0) yields a zero that compares equal
    to DuckDB's -0.0 result (sign-of-zero is the documented bitwise
    exception)."""
    import duckdb

    from etl_caltopo_spark.functions.numeric import fround, sql_fround

    got = (
        spark.createDataFrame([(-0.0,)], "x double")
        .select(fround(F.col("x"), 6).alias("r"))
        .first()["r"]
    )
    want = duckdb.sql(f"SELECT {sql_fround('-0.0', 6)} AS r").fetchone()[0]
    assert got == want == 0.0  # -0.0 == 0.0: value-level parity


def _fold(values):
    """The operator's skipna=False arrival-order fold."""
    total = 0.0
    for v in values:
        total += float(pd.Series(v, dtype="float64").sum(skipna=False))
    return total


def test_split_value_for_sum_bounds_finite_magnitudes(spark):
    """ADVICE r11 #4: finite |v| >= 1e100 folds as NULL (order-safe);
    NaN and ±inf stay in; NULLs keep the r11 contract."""
    from etl_caltopo_spark.streaming.stateful import _split_value_for_sum

    rows = [
        (1, 1.7976931348623157e308),  # oversized finite -> NULLed
        (1, -1.2e100),                # oversized finite -> NULLed
        (1, 5.0),                     # in-domain
        (1, None),                    # SQL NULL
        (1, NAN),                     # stays: saturates order-free
        (1, INF),                     # stays: saturates order-free
    ]
    out = (
        _split_value_for_sum(
            spark.createDataFrame(rows, "user_id long, value double")
        )
        .orderBy("_v_nonnull")
        .collect()
    )
    flags = sorted(r["_v_nonnull"] for r in out)
    assert flags == [0, 0, 0, 1, 1, 1]
    # the filled column carries 0.0 for every excluded row
    assert all(r["_v_filled"] == 0.0 for r in out if r["_v_nonnull"] == 0)
    kept = sorted(
        (r["_v_filled"] for r in out if r["_v_nonnull"] == 1),
        key=lambda v: (math.isnan(v), v),
    )
    assert kept[0] == 5.0 and kept[1] == INF and math.isnan(kept[2])


@pytest.mark.parametrize(
    "values",
    [
        [1.7976931348623157e308, 1.7976931348623157e308, -1.7976931348623157e308, 3.0],
        [1.2e308, 1.2e308, -1.2e308, 1.0],
    ],
)
def test_bounded_sum_is_order_independent(values):
    """The exact failure ADVICE r11 #4 names: unbounded, the fold
    overflows to inf in one arrival order and stays finite in the
    reverse; bounded at 1e100, both orders agree."""
    unbounded_fwd = _fold(values)
    unbounded_rev = _fold(values[::-1])
    assert unbounded_fwd == INF and math.isfinite(unbounded_rev)  # the hazard
    bounded = [v for v in values if not (math.isfinite(v) and abs(v) >= 1e100)]
    assert _fold(bounded) == _fold(bounded[::-1])


def test_bench_ab_artifact_supersedes_earlier_runs(tmp_path):
    """VERDICT r11 #4: re-running an adjudication into the same
    artifact marks earlier runs non-final with a superseded_by
    pointer; exactly one run stays final.  Legacy single-dict
    artifacts migrate into the runs list."""
    import json
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from bench_ab import write_artifact

    path = str(tmp_path / "ab.json")
    # legacy single-dict artifact on disk
    with open(path, "w") as f:
        json.dump({"old": "a", "new": "b", "flagged": ["q_x"]}, f)

    write_artifact(path, {"old": "a", "new": "b", "flagged": []})
    doc = json.load(open(path))
    assert len(doc["runs"]) == 2
    legacy, fresh = doc["runs"]
    assert legacy["final"] is False
    assert legacy["superseded_by"] == fresh["run_id"]
    assert fresh["final"] is True and fresh["flagged"] == []

    write_artifact(path, {"old": "a", "new": "b", "flagged": ["q_y"]})
    doc = json.load(open(path))
    finals = [r for r in doc["runs"] if r.get("final")]
    assert len(doc["runs"]) == 3 and len(finals) == 1
    assert finals[0]["flagged"] == ["q_y"]
    assert all(
        r["superseded_by"] == finals[0]["run_id"]
        for r in doc["runs"]
        if not r.get("final")
    )
