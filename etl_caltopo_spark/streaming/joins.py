"""Stream-stream joins (SURVEY §2 streaming surface).

The click-attribution shape: two unbounded inputs joined on a key
within an event-time interval.  Watermarks on BOTH sides plus the
time-range join condition are what let Spark bound the join state —
each side keeps only rows younger than (watermark - interval), so
state is O(rate x window), not O(stream).  Without them a
stream-stream join is unbounded-state and Spark rejects it.

Batch-first rule (SURVEY §2.9): the identical function works on static
DataFrames (withWatermark is a no-op in batch), which is what the
equivalence test asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join rows sharing ``key`` where the right event happens in
    ``[left_ts, left_ts + max_delay]``.  Columns must already be
    disambiguated (no shared names besides ``key``)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, "_rkey")
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop("_rkey")
