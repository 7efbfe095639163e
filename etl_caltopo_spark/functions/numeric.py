"""Cross-engine-stable numeric rounding.

``round()`` on doubles is NOT portable between engines: Spark rounds
the shortest decimal representation (BigDecimal.valueOf) half-up,
while DuckDB rounds the exact binary value — e.g. the double nearest
37704.575 rounds to 37704.58 in Spark but 37704.57 in DuckDB.

``fround`` uses floor-scaling instead: ``floor(x * 10^dp) / 10^dp``.
Multiply and floor are IEEE-exact and identical across engines, so the
same input double always produces the same output double.  The SQL
mirror is ``floor((expr) * 10^dp) / 10^dp`` (see sql_fround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, dp: int) -> Column:
    """Engine-portable fixed-point truncation of a double column."""
    scale = float(10**dp)
    return F.floor(col * scale) / F.lit(scale)


def sql_fround(expr: str, dp: int) -> str:
    """The DuckDB-side mirror of :func:`fround`."""
    scale = 10**dp
    return f"floor(({expr}) * {scale}) / {scale}"
