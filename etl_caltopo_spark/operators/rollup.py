"""Incremental rollup maintenance: partial aggregates that merge.

The scale pattern behind materialized-view refresh: keep a stored
rollup of decomposable partials (sum, count — never avg), aggregate
only the delta, and merge by re-aggregating the union.  At 100 TB the
delta is a day partition, so refresh cost is O(delta), not O(history);
the merge shuffle carries one row per (group, partial-set), not raw
events.  Derived measures (avg) are computed from merged partials at
read time.

Generalizes the reference's scheduled incremental fetch
(`/root/reference/task.ts:68` — the `since/-500` delta window) from
"re-fetch recent rows" to "re-aggregate recent rows".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame, group_cols: list[Column | str], value_col: Column | str
) -> DataFrame:
    """Decomposable partials per group: (sum, count).  Safe to store
    and re-merge; avg/ratios are intentionally absent (not mergeable)."""
    return df.groupBy(*group_cols).agg(
        F.sum(value_col).alias("_psum"), F.count("*").alias("_pcount")
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Merge any number of partial rollups by re-aggregating their
    union.  Associative/commutative, so stored + delta == full
    recompute (the invariant q_incr_rollup's oracle checks)."""
    merged = rollups[0]
    for r in rollups[1:]:
        merged = merged.unionByName(r)
    group_cols = [c for c in merged.columns if c not in ("_psum", "_pcount")]
    return merged.groupBy(*group_cols).agg(
        F.sum("_psum").alias("_psum"), F.sum("_pcount").alias("_pcount")
    )
