"""CDC merge, data-quality, schema-evolution operator unit tests."""

from __future__ import annotations

import pytest

from etl_caltopo_spark.operators.merge import merge_upsert
from etl_caltopo_spark.operators.quality import expect_no_nulls, quality_report


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "U", "b2", 21.0),   # update existing
            (3, "D", None, None),   # delete existing
            (9, "U", "new", 90.0),  # insert new key
        ],
        "k long, op string, name string, v double",
    )
    out = {r["k"]: (r["name"], r["v"])
           for r in merge_upsert(base, changes, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 9: ("new", 90.0)}


def test_merge_upsert_broadcast_variant(spark):
    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    changes = spark.createDataFrame([(1, "U", 2.0)], "k long, op string, v double")
    out = merge_upsert(base, changes, "k", broadcast_changes=True).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, 2.0)]


def test_quality_report_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], "id long, tag string"
    )
    rep = {r["column"]: r for r in quality_report(df, ["id", "tag"]).collect()}
    assert rep["id"]["n_rows"] == 3
    assert rep["id"]["n_nulls"] == 0 and rep["id"]["n_distinct"] == 3
    assert rep["tag"]["n_nulls"] == 1 and rep["tag"]["n_distinct"] == 1


def test_expect_no_nulls_raises(spark):
    df = spark.createDataFrame([(1, None)], "id long, tag string")
    expect_no_nulls(df, ["id"])
    with pytest.raises(ValueError, match="tag"):
        expect_no_nulls(df, ["tag"])


def test_observe_metrics_collected_during_action(spark):
    from pyspark.sql import Observation

    from etl_caltopo_spark.operators.quality import observe_metrics

    df = spark.createDataFrame([(1, "x"), (2, None), (3, "y")], "id long, tag string")
    obs = Observation("dq")
    observe_metrics(df, obs, ["tag"]).collect()
    assert obs.get["n_rows"] == 3
    assert obs.get["nulls_tag"] == 1


def test_union_by_name_schema_evolution(spark):
    """Schema evolution across batches: a newer batch adds a column;
    unionByName(allowMissingColumns) back-fills nulls for the old
    batch instead of failing."""
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame([(2, "b", "en")], "id long, name string, lang string")
    merged = old.unionByName(new, allowMissingColumns=True)
    rows = {r["id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


def test_rollup_merge_equals_full_recompute(spark):
    from etl_caltopo_spark.operators.rollup import merge_rollups, partial_rollup

    rows = [
        ("a", 1.0), ("a", 2.5), ("a", 4.0), ("b", 10.0), ("b", 0.5), ("c", 7.25),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    # split NOT aligned with groups: 'a' and 'b' span both halves
    part1 = partial_rollup(spark.createDataFrame(rows[:3], "k string, v double"), ["k"], "v")
    part2 = partial_rollup(spark.createDataFrame(rows[3:], "k string, v double"), ["k"], "v")
    merged = {r["k"]: (r["_psum"], r["_pcount"]) for r in merge_rollups(part1, part2).collect()}
    full = {r["k"]: (r["_psum"], r["_pcount"]) for r in partial_rollup(df, ["k"], "v").collect()}
    assert merged == full
    # three-way merge is associative too
    part3 = partial_rollup(spark.createDataFrame([("a", 1.0)], "k string, v double"), ["k"], "v")
    merged3 = {r["k"]: r["_pcount"] for r in merge_rollups(part1, part2, part3).collect()}
    assert merged3["a"] == 4


def test_cogroup_reconcile_matches_builtin(spark, sf_dir):
    from etl_caltopo_spark.io import load_table
    from etl_caltopo_spark.operators.reconcile import (
        reconcile_totals,
        reconcile_totals_cogroup,
    )

    orders = load_table(spark, sf_dir, "orders").limit(500)
    li = load_table(spark, sf_dir, "lineitem")
    a = {r["o_orderkey"]: r for r in reconcile_totals(orders, li).collect()}
    b = {r["o_orderkey"]: r for r in reconcile_totals_cogroup(orders, li).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n_lines"] == b[k]["n_lines"]
        if a[k]["li_total"] is None:
            assert b[k]["li_total"] is None
        else:
            assert abs(a[k]["li_total"] - b[k]["li_total"]) < 1e-6
