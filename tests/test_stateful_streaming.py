"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

from datetime import datetime

from etl_caltopo_spark.streaming.ingest import stream_from_parquet_dir
from etl_caltopo_spark.streaming.stateful import running_user_totals


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    t = datetime
    batch1 = [(1, t(2024, 1, 1, 0, 0), 10, "click", 1.0),
              (2, t(2024, 1, 1, 0, 1), 10, "click", 2.0),
              (3, t(2024, 1, 1, 0, 2), 20, "view", 5.0)]
    batch2 = [(4, t(2024, 1, 1, 0, 3), 10, "click", 4.0)]
    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        # one file per micro-batch → state must survive between batches
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_state").collect()
    # update mode emits one row per key per batch it appeared in;
    # the LAST emission per user carries the accumulated totals
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_events"], r["total_value"])
    assert last[10] == (3, 7.0)  # 2 events in batch1 + 1 in batch2
    assert last[20] == (1, 5.0)