"""Cross-engine-stable numeric rounding.

``round()`` on doubles is NOT portable between engines: Spark rounds
the shortest decimal representation (BigDecimal.valueOf) half-up,
while DuckDB rounds the exact binary value — e.g. the double nearest
37704.575 rounds to 37704.58 in Spark but 37704.57 in DuckDB.

``fround`` uses floor-scaling instead: ``floor(x * 10^dp) / 10^dp``.
Multiply and floor are IEEE-exact and identical across engines, so the
same input double always produces the same output double.  The SQL
mirror is ``floor((expr) * 10^dp) / 10^dp`` (see sql_fround).

Extreme-magnitude guard (round-11 extremes sweep): Spark's
``floor(double)`` returns LONG and SATURATES — ``floor(inf * 1e6)``
silently yields 9223372036854.775 and ``floor(nan)`` yields 0.0,
where DuckDB's double ``floor`` propagates inf/nan and stays exact
for any magnitude.  For ``|x * scale| >= 2^63`` every double is
already integral (the double grid is coarser than 1 past 2^53), so
DuckDB's floor there is an identity and the portable result is just
the ``(x * scale) / scale`` round-trip — which is what the guard
branch computes, bit-for-bit the DuckDB expression, with inf/nan
propagating through the same multiply/divide.  Spark's NaN-is-largest
comparison semantics route NaN into the guard branch.  Below the
threshold the long floor is exact, so finite normal data is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: float(2**63) — exactly representable; floor->long is exact strictly
#: below it (the largest double below is 2^63 - 1024, within long
#: range) and saturating at or above it.
_FLOOR_SAFE = 9.223372036854776e18


def fround(col: Column, dp: int) -> Column:
    """Engine-portable fixed-point truncation of a double column.

    Sign-of-zero exception (ADVICE r11): on -0.0 the long-floor
    branch returns integer 0, so fround yields +0.0 where DuckDB's
    double floor preserves -0.0.  The values compare EQUAL in both
    engines (and the oracle canon normalizes the sign), so parity is
    value-level everywhere but bitwise only away from -0.0 — don't
    build anything on the sign bit of a fround(0) output."""
    scale = float(10**dp)
    scaled = col * F.lit(scale)
    return F.when(
        F.abs(scaled) >= F.lit(_FLOOR_SAFE), scaled / F.lit(scale)
    ).otherwise(F.floor(scaled) / F.lit(scale))


def sql_fround(expr: str, dp: int) -> str:
    """The DuckDB-side mirror of :func:`fround`."""
    scale = 10**dp
    return f"floor(({expr}) * {scale}) / {scale}"


# ---------------------------------------------------------------------------
# Non-finite observation policy (round-11 extremes sweep).
#
# NaN/±inf observations are EXCLUDED from graded aggregations and
# NULLED in row-preserving transforms, mirroring the r8 NULL policy:
# one engine crashes where the other saturates (Spark double->long
# floor/cast saturates or ANSI-raises; DuckDB CAST raises
# ConversionException), and percentile/variance families place NaN
# differently — there is no portable answer ON non-finite inputs, so
# the portable contract is defined on the finite domain.  All guards
# are no-ops on finite data, so normal-data hashes are unchanged.
# ---------------------------------------------------------------------------


def finite(col: Column) -> Column:
    """True iff the double is finite; NULL on NULL input (so a
    ``F.when(finite(c), …)`` guard naturally yields NULL for both
    NULL and non-finite inputs).  Mirror: ``isfinite(expr)``."""
    return ~F.isnan(col) & (F.abs(col) != F.lit(float("inf")))


def finite_or_null(col: Column) -> Column:
    """Filter predicate that drops ONLY NaN/±inf rows, keeping NULLs
    (each id's established NULL policy is preserved).  Mirror:
    :func:`sql_finite_or_null`."""
    return col.isNull() | finite(col)


def sql_finite_or_null(expr: str) -> str:
    """The DuckDB-side mirror of :func:`finite_or_null`."""
    return f"(({expr}) IS NULL OR isfinite({expr}))"


#: variance-family observation bound: squared deviations and their
#: accumulated sum must stay finite in float64.  1e100 leaves 10^86
#: headroom over any physical row count (n × (2·10^100)² ≤ n·4e200,
#: finite past 10^107 rows), while DuckDB's Welford/stddev raises
#: OutOfRange the moment a deviation square overflows — Spark yields
#: NaN there, so the portable variance domain is bounded magnitudes.
_VAR_SAFE = 1e100


def variance_safe(col: Column) -> Column:
    """Filter predicate for variance/corr/regr observations: keeps
    NULLs (the aggregates skip them identically) and finite values
    with ``|x| < 1e100``; NaN/±inf order above the bound in both
    engines, so one comparison excludes them too.  Mirror:
    :func:`sql_variance_safe`."""
    return col.isNull() | (F.abs(col) < F.lit(_VAR_SAFE))


def sql_variance_safe(expr: str) -> str:
    """The DuckDB-side mirror of :func:`variance_safe`."""
    return f"(({expr}) IS NULL OR abs({expr}) < {_VAR_SAFE})"


def cents(col: Column) -> Column:
    """Exact-cents int64: ``round(col · 100)`` as long, NULL whenever
    the scaled value is off the int64 grid (NaN/±inf/|v·100| ≥ 2^63 —
    extremes r11 wave 2: the raw cast ANSI-raises in Spark and raises
    in DuckDB out there; NaN orders above the limit in both engines so
    one comparison covers everything).  Mirror: :func:`sql_cents`."""
    scaled = col * F.lit(100.0)
    return F.when(F.abs(scaled) < F.lit(_FLOOR_SAFE), F.round(scaled).cast("long"))


def sql_cents(expr: str) -> str:
    """The DuckDB-side mirror of :func:`cents`."""
    return (
        f"CASE WHEN abs(({expr}) * 100.0) < {_FLOOR_SAFE}"
        f" THEN CAST(round(({expr}) * 100.0) AS BIGINT) END"
    )


def bucket_long(col: Column, width: float) -> Column:
    """Portable equi-width bucket id: ``floor(col / width)`` as int64,
    NULL whenever the quotient is NOT representable on the int64 grid
    (non-finite, or |q| >= 2^63).  Off-grid and NULL inputs therefore
    share the NULL bucket, keeping bucketing ROW-COMPLETE — Spark's
    long floor silently saturates and DuckDB's CAST raises on the
    same inputs, so the raw form is portable only inside the grid.
    Mirror: :func:`sql_bucket_long`."""
    q = col / F.lit(float(width))
    return F.when(finite(q) & (F.abs(q) < F.lit(_FLOOR_SAFE)), F.floor(q))


def sql_bucket_long(expr: str, width: float) -> str:
    """The DuckDB-side mirror of :func:`bucket_long`."""
    w = float(width)
    return (
        f"CASE WHEN isfinite(({expr}) / {w})"
        f" AND abs(({expr}) / {w}) < {_FLOOR_SAFE}"
        f" THEN CAST(floor(({expr}) / {w}) AS BIGINT) END"
    )
