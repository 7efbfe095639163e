"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in the session factory) handles
most skew at runtime.  ``salted_join`` is the explicit fallback for
joins where one key dominates so heavily that even split partitions
overwhelm an executor: the skewed side gets a random salt in
[0, n_salts), the small side is replicated n_salts times, and the join
key becomes (key, salt) — spreading one hot key over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``key`` with salting.

    The salt on the skewed side is derived from a hash of the full row
    via ``monotonically_increasing_id`` modulo n_salts (cheap, no RNG
    state); the small side explodes a literal salt range — its row
    count multiplies by n_salts, so keep it dimension-sized.
    """
    salted = skewed.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
