"""Structured Streaming ingestion helpers ([EXT], SURVEY §2.3).

The reference's incremental model — scheduled re-fetch of a
``since/-500`` delta window (task.ts:46,68) — maps to Spark's
``availableNow`` trigger: process everything new since the last
checkpoint, then stop.  These helpers wire file-source streams with
watermarks and stream-dedup so the batch operators in
``streaming.windows`` run unchanged on a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_from_parquet_dir(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """File-source stream (schema must be declared for streams)."""
    return spark.readStream.schema(schema).parquet(path)


def as_event_time(df: DataFrame, ts_col: str) -> tuple[DataFrame, bool]:
    """Watermark-boundary dtype adapter.

    Spark requires event-time columns to be TIMESTAMP (LTZ) —
    ``withWatermark`` on TIMESTAMP_NTZ raises
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — while the engine's canonical
    ``ts`` dtype is NTZ (io.py, so batch oracles stay timezone-free).
    The session timezone is pinned UTC (session.py), so a plain cast is
    wall-clock-preserving in both directions.  Returns the adapted
    frame and whether the caller should cast back to NTZ afterwards.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp")), True
    return df, False


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound: rows later than ``delay`` behind the max seen
    event time are dropped from stateful operators.

    NTZ event-time columns are cast to TIMESTAMP first (see
    ``as_event_time``) and stay TIMESTAMP downstream — re-casting here
    would shed the event-time watermark designation; callers cast back
    after their stateful operator if NTZ output is wanted.
    """
    df, _ = as_event_time(df, ts_col)
    return df.withWatermark(ts_col, delay)


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (dropDuplicates + watermark bounds the dedup state).  Batch
    outputs restore NTZ for the oracles; streaming outputs keep
    TIMESTAMP so the event-time watermark survives into downstream
    stateful operators."""
    df, was_ntz = as_event_time(df, ts_col)
    out = df.withWatermark(ts_col, delay).dropDuplicates([*keys, ts_col])
    if was_ntz and not out.isStreaming:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
    return out


def stream_dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Stream dedup WITHOUT the event-time column in the key set:
    ``dropDuplicatesWithinWatermark`` guarantees records whose event
    times fall within ``delay`` of the first arrival are deduplicated,
    and evicts key state once the watermark passes — the operator to
    reach for when duplicates share a business key but not necessarily
    an identical timestamp (retries, at-least-once sources).  Late
    input older than the watermark is dropped before the operator."""
    df, _ = as_event_time(df, ts_col)
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def run_available_now_to_memory(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "complete"
) -> None:
    """Drain everything available through the plan into an in-memory
    table (test harness for batch/stream equivalence), then stop."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Exactly-once file sink via foreachBatch: each micro-batch is
    written transactionally keyed by epoch id (re-delivered batches
    overwrite their own epoch directory instead of duplicating)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_high_watermark(df: DataFrame, updated_col: str = "updated") -> int:
    """Batch-mode incremental state: the max change stamp of this run
    (persisted via caltopo.source.save_watermark between runs)."""
    row = df.agg(F.max(updated_col).alias("hw")).collect()[0]
    return int(row["hw"]) if row["hw"] is not None else 0
