"""Unit tests for the operator library on tiny in-memory frames."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_caltopo_spark.operators.joins import asof_join, broadcast_lookup_join
from etl_caltopo_spark.operators.topk import top_k, top_k_per_group


def test_broadcast_lookup_join_left_semantics(spark):
    facts = spark.createDataFrame(
        [(1, "f1"), (2, "f2"), (3, None)], "id int, folder_id string"
    )
    dim = spark.createDataFrame([("f1", "Folder One")], "fid string, title string")
    out = broadcast_lookup_join(facts, dim, facts["folder_id"] == dim["fid"], "left")
    rows = {r["id"]: r["title"] for r in out.collect()}
    # matched row gets the dim value; dangling + null folder ids keep null
    assert rows == {1: "Folder One", 2: None, 3: None}


def test_asof_join_backward(spark):
    t = datetime
    left = spark.createDataFrame(
        [
            (1, 10, t(2024, 1, 1, 0, 30)),
            (2, 10, t(2024, 1, 1, 1, 0)),
            (3, 20, t(2024, 1, 1, 0, 10)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(2024, 1, 1, 0, 15), 1.0),
            (10, t(2024, 1, 1, 0, 45), 2.0),
            (10, t(2024, 1, 1, 1, 0), 3.0),  # simultaneous with event 2
            (20, t(2024, 1, 1, 0, 30), 4.0),  # after event 3 → no match
        ],
        "user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, ["user_id"], "ts", "ts", ["v"], prefix="last_"
    ).collect()
    got = {r["event_id"]: (r["last_ts"], r["last_v"]) for r in out}
    assert got[1] == (t(2024, 1, 1, 0, 15), 1.0)  # latest at-or-before 0:30
    assert got[2] == (t(2024, 1, 1, 1, 0), 3.0)  # ties included (<=)
    assert got[3] == (None, None)  # left join: no earlier right row


def test_top_k_global(spark):
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], "id int, v double")
    out = top_k(df, [F.col("v").desc(), F.col("id")], 3).collect()
    assert [(r["id"], r["v"]) for r in out] == [(6, 6.0), (13, 6.0), (20, 6.0)]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 9)]


def test_skyline_sweep_matches_nested_loop_baseline(spark, sf_dir):
    """The graded sweep skyline equals the test-only O(n²) anti-join
    baseline row-for-row (both also share the DuckDB oracle)."""
    from etl_caltopo_spark.queries import REGISTRY
    from etl_caltopo_spark.queries.extended4 import skyline_nested_loop
    from etl_caltopo_spark.io import load_table

    sweep = {
        tuple(r) for r in REGISTRY["q_skyline"].fn(spark, sf_dir).collect()
    }
    bnl = {
        tuple(r)
        for r in skyline_nested_loop(load_table(spark, sf_dir, "part")).collect()
    }
    assert sweep == bnl and len(sweep) > 0


def test_degree_oriented_triangle_count(spark):
    """operators.graph.triangle_count on known graphs: K4 has 4
    triangles; adding a star hub (no closing edges) adds none; the
    count must be orientation-invariant vs the naive id-oriented
    3-join."""
    from etl_caltopo_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    star = [(5, i) for i in range(6, 12)]  # hub 5, leaves 6..11
    bridge = [(4, 5)]
    edges = spark.createDataFrame(k4 + star + bridge, "u long, v long")
    got = triangle_count(edges).collect()[0]["n_triangles"]
    assert got == 4

    # naive id-oriented count agrees
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    naive = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    assert naive == got
