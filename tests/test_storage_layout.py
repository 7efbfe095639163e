"""Storage-layout scale features: partitioned writes with partition
pruning, bucketed tables with shuffle-free joins, salted skew joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table, write_parquet
from etl_caltopo_spark.operators.skew import salted_join


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Writing partitioned by a filter column turns the filter into
    partition pruning — the scan never opens other partitions."""
    path = str(tmp_path / "lineitem_by_flag")
    li = load_table(spark, sf_dir, "lineitem")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    plan = plan_of(back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    n_a = li.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == n_a


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge
    join needs no Exchange on either side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        # external tables: bucketed data lands under tmp_path, not the warehouse
        (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
               .sortBy("o_custkey").option("path", str(tmp_path / "orders_b"))
               .saveAsTable("orders_b"))
        (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
             .sortBy("c_custkey").option("path", str(tmp_path / "customer_b"))
             .saveAsTable("customer_b"))
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert "Arguments: hashpartitioning" not in plan, "bucketed join still shuffles"
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_matches_plain_join(spark):
    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)], "k int, payload int"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k int, name string")
    plain = {(r["k"], r["payload"], r["name"])
             for r in skewed.join(dim, "k").collect()}
    salted = {(r["k"], r["payload"], r["name"])
              for r in salted_join(skewed, dim, "k", n_salts=8).collect()}
    assert salted == plain
    assert len(salted) == 505


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Star-join runtime pruning: when the fact table is partitioned on
    the join key and the dimension side carries a selective filter,
    Catalyst injects a dynamic pruning subquery so the fact scan only
    opens partitions the filtered dim can reach — at 100 TB this is
    the difference between scanning one year and scanning all of them."""
    path = str(tmp_path / "orders_by_year")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_parquet(orders, path, partition_by=["o_year"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1995, "keep"), (1996, "keep"), (1997, "drop"), (1998, "drop")],
        "y int, tag string",
    )
    joined = (
        fact.join(dim.filter(F.col("tag") == "keep"), fact["o_year"] == dim["y"])
        .groupBy("o_year")
        .agg(F.count("*").alias("n"))
    )
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower(), plan
    rows = {r["o_year"]: r["n"] for r in joined.collect()}
    assert set(rows) == {1995, 1996}
