"""Timezone-independent temporal helpers.

The synthetic ``events.ts`` column is parquet TIMESTAMP(NANOS); Spark
4.1 reads it natively as TIMESTAMP_NTZ (the
``spark.sql.legacy.parquet.nanosAsLong`` conf is ignored), while DuckDB
reads it as a naive TIMESTAMP truncated to microseconds.  Both engines
therefore hold the same *wall-clock* value with no zone attached — the
only safe epoch arithmetic is NTZ-native.

``F.unix_micros`` / ``F.unix_timestamp`` are the wrong tools here:
they require TIMESTAMP (LTZ) input, so they either fail to analyze on
NTZ columns (the q_sessionize_batch round-1 incident) or, after an
implicit cast, shift the value by the session timezone and diverge
from DuckDB's ``epoch_us``/``epoch`` under any non-UTC driver.

Mapping used by every query id (oracle side in parentheses):
- ``epoch_us(ts_ntz)``      ↔ DuckDB ``epoch_us(ts)``
- ``date_epoch_seconds(d)`` ↔ DuckDB ``floor(epoch(d))``
- ``epoch_day(d)``          ↔ DuckDB ``floor(epoch(d) / 86400)``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _as_col(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _epoch_ntz() -> Column:
    # Built per-call: a module-level Column would bind to whichever
    # SparkSession existed at import time.
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_us(col: ColumnOrName) -> Column:
    """Microseconds since epoch of a wall-clock (NTZ) timestamp.

    ``timestamp_diff`` on two TIMESTAMP_NTZ operands is pure integer
    arithmetic — no session-timezone consultation — and matches
    DuckDB's ``epoch_us`` on the same naive value exactly.
    """
    return F.timestamp_diff(
        "MICROSECOND", _epoch_ntz(), _as_col(col).cast("timestamp_ntz")
    )


def date_epoch_seconds(col: ColumnOrName) -> Column:
    """Seconds since epoch of a calendar date, timezone-free.

    ``unix_date`` counts whole days since 1970-01-01 with no timezone
    input, unlike ``unix_timestamp(date)`` which resolves midnight in
    the session zone.  The synthetic date columns (o_orderdate) are
    midnight-aligned TIMESTAMP_NTZ in parquet; NTZ→DATE cast takes the
    wall-clock date part, so this matches DuckDB ``floor(epoch(d))``
    exactly.
    """
    return (
        F.unix_date(_as_col(col).cast("date")).cast("long")
        * F.lit(86400).cast("long")
    )


def epoch_day(col: ColumnOrName) -> Column:
    """Whole days since epoch of a date (DuckDB ``epoch(d)/86400``)."""
    return F.unix_date(_as_col(col).cast("date")).cast("long")
