"""Scalar function helpers shared across queries and operators."""

from etl_caltopo_spark.functions.numeric import fround

__all__ = ["fround"]
