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

from etl_caltopo_spark.streaming.ingest import as_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where the right event happens in
    ``[left_ts, left_ts + max_delay]``.  Columns must already be
    disambiguated (no shared names besides ``key``).

    ``how="left_outer"`` adds null-padded rows for unmatched left
    events.  In streaming mode Spark emits an outer null only once
    the watermark proves the join window can no longer match — so at
    stream end the outer rows are the subset of the batch outer rows
    whose window expired under the final watermark (asserted in
    tests/test_streaming.py); matched rows are identical to batch.

    Event-time dtype: the engine's canonical ``ts`` is TIMESTAMP_NTZ
    (io.py), which Spark rejects as an event-time column.  Both sides
    are cast NTZ→TIMESTAMP at this boundary (wall-clock-preserving
    under the pinned UTC session tz).  BATCH outputs cast back to NTZ
    so the oracles stay timezone-free; STREAMING outputs keep
    TIMESTAMP — re-casting would shed the event-time watermark
    designation and break any downstream stateful operator chained
    on the join."""
    left, l_ntz = as_event_time(left, left_ts)
    right, r_ntz = as_event_time(right, right_ts)
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, "_rkey")
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    out = lw.join(rw, cond, how).drop("_rkey")
    if not out.isStreaming:
        if l_ntz:
            out = out.withColumn(left_ts, F.col(left_ts).cast("timestamp_ntz"))
        if r_ntz:
            out = out.withColumn(right_ts, F.col(right_ts).cast("timestamp_ntz"))
    return out
