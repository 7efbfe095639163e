"""CDC merge / upsert operator.

The reference's sink is last-write-wins per scheduled run (the whole
map delta is re-submitted, task.ts:154-159).  Generalized to batch
CDC semantics over keyed tables: apply a changes table (insert /
update / delete ops) onto a base table in one pass.

Plan shape: a single full-outer join on the key — both sides shuffle
once on the key (or the changes side broadcasts when small, the usual
CDC case).  No driver-side loops; 100 TB base tables merge with the
same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply ``changes`` onto ``base``.

    ``changes`` carries the base columns plus ``op_col`` in
    {'U' (upsert: update-or-insert), 'D' (delete)}.  Semantics:

    - key only in base                     → base row survives
    - key in changes with op='U'           → changes row wins (whether
      or not the key exists in base)
    - key in changes with op='D'           → row removed
    """
    value_cols = [c for c in base.columns if c != key]
    ch = changes.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in value_cols],
    )
    join_side = F.broadcast(ch) if broadcast_changes else ch
    joined = base.join(join_side, base[key] == F.col("_ck"), "full_outer")
    merged = joined.filter(
        (F.col("_op").isNull()) | (F.col("_op") != "D")
    ).select(
        F.coalesce(base[key], F.col("_ck")).alias(key),
        *[
            F.when(F.col("_op") == "U", F.col(f"_c_{c}"))
            .otherwise(base[c])
            .alias(c)
            for c in value_cols
        ],
    )
    return merged
