"""Time-window queries over the events table (SURVEY §2.3 "Streaming").

Each runs the batch form of a streaming aggregation (batch-first rule);
tests/test_streaming.py re-runs the identical operator as a real
Structured Streaming job and asserts equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf
from etl_caltopo_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT))
                AT TIME ZONE 'UTC' AS TIMESTAMP) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts per event type.  Spark's
    window() aligns to the 1970 epoch; the oracle reproduces that with
    epoch arithmetic."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    return out.drop("window_end")


@query(
    "q_stream_sliding",
    oracle="""
    WITH b AS (
        SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))
                    AT TIME ZONE 'UTC' AS TIMESTAMP) AS b5,
               event_type, value
        FROM events
    ), expanded AS (
        SELECT b5 AS window_start, event_type, value FROM b
        UNION ALL
        SELECT b5 - INTERVAL '5 minutes' AS window_start, event_type, value FROM b
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes — each event lands in
    two windows; the oracle expands the two bucket assignments with a
    UNION ALL."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        "10 minutes",
        "5 minutes",
        ["event_type"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    return out.drop("window_end")


@query(
    "q_stream_session",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT *, sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM seq
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap; the
    oracle is the classic gaps-and-islands formulation (new session
    when the gap is >= 30min, matching Spark's exclusive session end)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return session_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
