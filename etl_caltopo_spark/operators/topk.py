"""Top-k operators.

Global top-k compiles to ``TakeOrderedAndProject`` (per-partition heap
+ driver merge — no global sort, no full shuffle).  Per-group top-k
uses the ``row_number() <= k`` window pattern: one shuffle on the group
key, partial sort per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k.  ``order_by`` must be deterministic (add a unique
    tiebreaker column) or the boundary rows are engine-dependent."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
