"""Set-operation queries (SURVEY §2.3, all [EXT]).

Spark's union() is UNION ALL, intersect() is set-INTERSECT (distinct),
exceptAll() is EXCEPT ALL — the oracles use the matching SQL forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


def _rich(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")


def _building(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")


_RICH_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
_BUILDING_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@query("q_set_union", oracle=f"{_RICH_SQL} UNION ALL {_BUILDING_SQL}")
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName = UNION ALL (map-only, no shuffle)."""
    apply_runtime_conf(spark)
    return _rich(spark, sf_dir).unionByName(_building(spark, sf_dir))


@query("q_set_intersect", oracle=f"{_RICH_SQL} INTERSECT {_BUILDING_SQL}")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect = set INTERSECT (distinct; plans as a semi-join)."""
    apply_runtime_conf(spark)
    return _rich(spark, sf_dir).intersect(_building(spark, sf_dir))


@query("q_set_except", oracle=f"{_RICH_SQL} EXCEPT ALL {_BUILDING_SQL}")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll = EXCEPT ALL (multiset difference)."""
    apply_runtime_conf(spark)
    return _rich(spark, sf_dir).exceptAll(_building(spark, sf_dir))
