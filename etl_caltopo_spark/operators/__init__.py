"""Relational operator library.

Reusable DataFrame→DataFrame operators that the declared queries (and
the CalTopo domain pipeline) compose.  Everything here is expressed
against the DataFrame API so Catalyst owns the physical strategy.
"""

from etl_caltopo_spark.operators.joins import asof_join, broadcast_lookup_join
from etl_caltopo_spark.operators.topk import top_k, top_k_per_group

__all__ = ["asof_join", "broadcast_lookup_join", "top_k", "top_k_per_group"]
