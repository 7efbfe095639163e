"""Join operators.

- ``broadcast_lookup_join``: the reference's folder lookup
  (/root/reference/task.ts:90,142-152) — a small dimension joined to a
  large fact table.  The dim is explicitly broadcast: at 100 TB the
  fact side never shuffles for this join.
- ``asof_join``: nearest-earlier-event join ([EXT], SURVEY §2.3).
  Implemented as union + running ``last(..., ignorenulls)`` window
  instead of a range join: one shuffle on the partition keys, linear
  work per partition, no O(n·m) pair blow-up — the formulation that
  survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
) -> DataFrame:
    """Lookup join with an explicit broadcast hint on the dimension.

    Mirrors the reference semantics (quirk Q5, SURVEY §1.5): unmatched
    fact rows survive with nulls for dim columns when ``how='left'``.
    """
    return facts.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same partition keys (backward
    as-of join, ties included).

    Plan shape: UNION both sides (map-only) → one shuffle on
    ``partition_keys`` → per-partition sort + running ``last()`` —
    no range-join pair explosion regardless of row counts per key.
    Output: all left columns + ``{prefix}{right_ts}`` +
    ``{prefix}{col}`` for each right value column (null when no
    earlier right row exists — left-join semantics).
    """
    left_cols = left.columns
    # A right row with a NULL timestamp can never satisfy the ASOF
    # inequality (NULL <= ts is NULL), yet the NULLS-FIRST sort would
    # make it the running backward candidate for every left row with
    # no earlier real match — leaking its value columns where the SQL
    # formulation yields all-NULL (ADVICE r10).  Drop such rows.
    right = right.where(F.col(right_ts).isNotNull())
    # Likewise a right row with a NULL PARTITION KEY (nullkeys sweep
    # r12): the SQL ASOF equality never matches NULL = NULL, but the
    # union+window implementation groups NULL keys into ONE window
    # partition where such a row would become the running candidate
    # for every NULL-key left row.  Drop them; NULL-key left rows
    # then attach all-NULL, the left-join answer.
    for k in partition_keys:
        right = right.where(F.col(k).isNotNull())
    # _side: right rows sort before left rows at equal timestamps so an
    # exactly-simultaneous right row is visible (<=, not <).
    r = right.select(
        *partition_keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias(right_ts),
            *[F.col(c) for c in right_value_cols],
        ).alias("_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left_cols) + ">"
        ).alias("_l"),
    )
    l = left.select(
        *partition_keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
    )
    w = (
        Window.partitionBy(*partition_keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn("_r_last", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left_cols]
    out_cols.append(F.col(f"_r_last.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"_r_last.{c}").alias(f"{prefix}{c}") for c in right_value_cols]
    return merged.filter(F.col("_side") == 1).select(*out_cols)

def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    partition_keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    prefix: str = "nearest_",
) -> DataFrame:
    """For each left row, attach the NEAREST right row in EITHER
    direction within the same partition keys — ties on absolute
    distance resolve to the earlier (backward) right row, matching
    the two-ASOF-JOIN + CASE oracle formulation.

    Same scale shape as :func:`asof_join` (one shuffle, no range-join
    pair explosion), but ONE union'd pass computes BOTH candidates
    over the same exchange + sort: the backward candidate is the
    running ``last(..., ignorenulls)`` up to the current row, the
    forward one the ``first(..., ignorenulls)`` of the rows after it.
    A right row at exactly the left timestamp sorts BEFORE the left
    row (``_side`` 0 < 1), so the backward window sees it at distance
    zero — which wins every tie, keeping the inclusive-``<=`` forward
    semantics consistent.  Null-safe: a side with no candidate loses
    to the other; both-null yields nulls (left-join semantics).
    """
    left_cols = left.columns
    # NULL-right-timestamp rows satisfy neither ASOF inequality in the
    # oracle formulation — filtered out so a lone NULL-ts right row can
    # never surface as the when(_fwd.isNull(), _back) fallback
    # (ADVICE r10; same guard as asof_join above).
    right = right.where(F.col(right_ts).isNotNull())
    # NULL partition keys never match the SQL ASOF equality either
    # (nullkeys sweep r12; same reasoning as asof_join above).
    for k in partition_keys:
        right = right.where(F.col(k).isNotNull())
    r = right.select(
        *partition_keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias(right_ts),
            *[F.col(c) for c in right_value_cols],
        ).alias("_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left_cols) + ">"
        ).alias("_l"),
    )
    l = left.select(
        *partition_keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
    )
    order = Window.partitionBy(*partition_keys).orderBy(
        F.col("_ts"), F.col("_side")
    )
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(1, Window.unboundedFollowing)
    merged = (
        l.unionByName(r)
        .withColumn("_back", F.last("_r", ignorenulls=True).over(w_back))
        .withColumn("_fwd", F.first("_r", ignorenulls=True).over(w_fwd))
    )
    from ..functions.temporal import epoch_us

    d_back = epoch_us(F.col("_ts")) - epoch_us(F.col(f"_back.{right_ts}"))
    d_fwd = epoch_us(F.col(f"_fwd.{right_ts}")) - epoch_us(F.col("_ts"))
    nearest = (
        # a NULL left timestamp matches nothing (both ASOF inequalities
        # are NULL) — without this guard the NULLS-FIRST sort would hand
        # such a row the first real right row as a "forward" candidate
        F.when(F.col("_ts").isNull(), F.lit(None).cast(r.schema["_r"].dataType))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        .when(F.col("_back").isNull(), F.col("_fwd"))
        .when(d_back <= d_fwd, F.col("_back"))
        .otherwise(F.col("_fwd"))
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left_cols]
    out_cols.append(F.col(f"_nr.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"_nr.{c}").alias(f"{prefix}{c}") for c in right_value_cols]
    return (
        merged.filter(F.col("_side") == 1)
        .withColumn("_nr", nearest)
        .select(*out_cols)
    )
