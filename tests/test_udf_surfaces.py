"""UDF/UDAF/UDTF extension surfaces (SURVEY §2.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.udfs import geomean, make_word_split_udtf, rank_group_pandas


def test_geomean_udaf(spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 8.0), ("b", 5.0)], "g string, v double")
    out = {r["g"]: r["gm"] for r in df.groupBy("g").agg(geomean("v").alias("gm")).collect()}
    assert out["a"] == pytest.approx(4.0)  # sqrt(2*8)
    assert out["b"] == pytest.approx(5.0)


def test_grouped_map_rank_matches_window(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 9.0), (3, 10, 9.0), (4, 20, 1.0)],
        "id long, g long, v double",
    )
    ranked = rank_group_pandas(df, "g", "v", "id", "id long, g long, v double, rn long")
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    # v desc, id asc tiebreak: 2 (9.0) < 3 (9.0) < 1 (5.0)
    assert got == {2: 1, 3: 2, 1: 3, 4: 1}


def test_word_split_udtf(spark):
    try:
        WordSplit = make_word_split_udtf()
    except ImportError:
        pytest.skip("Python UDTF not available in this Spark build")
    spark.udtf.register("word_split", WordSplit)
    out = spark.sql(
        "SELECT t.word, t.pos FROM (SELECT 'hello spark world' AS s), "
        "LATERAL word_split(s) t"
    ).collect()
    assert [(r["word"], r["pos"]) for r in out] == [
        ("hello", 0), ("spark", 1), ("world", 2)
    ]
