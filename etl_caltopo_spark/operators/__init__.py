"""Relational operator library.

Reusable DataFrame→DataFrame operators that the declared queries (and
the CalTopo domain pipeline) compose.  Everything here is expressed
against the DataFrame API so Catalyst owns the physical strategy.
"""

from etl_caltopo_spark.operators.joins import asof_join, broadcast_lookup_join
from etl_caltopo_spark.operators.merge import merge_upsert
from etl_caltopo_spark.operators.quality import (
    expect_no_nulls,
    observe_metrics,
    quality_report,
)
from etl_caltopo_spark.operators.reconcile import (
    reconcile_totals,
    reconcile_totals_cogroup,
)
from etl_caltopo_spark.operators.rollup import merge_rollups, partial_rollup
from etl_caltopo_spark.operators.skew import salted_join
from etl_caltopo_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "asof_join",
    "broadcast_lookup_join",
    "merge_upsert",
    "quality_report",
    "observe_metrics",
    "expect_no_nulls",
    "salted_join",
    "top_k",
    "top_k_per_group",
    "reconcile_totals",
    "reconcile_totals_cogroup",
    "merge_rollups",
    "partial_rollup",
]
