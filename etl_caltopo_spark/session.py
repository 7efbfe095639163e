"""SparkSession factory.

Replaces the reference's runtime envelope — one single-threaded AWS
Lambda container holding the whole dataset in memory
(/root/reference/Dockerfile:1-8, /root/reference/task.ts:92) — with a
Spark session configured for multi-executor scale:

- AQE on: runtime partition coalescing, skew-join splitting, and join
  strategy re-planning — the knobs that matter most at 100 TB.
- UTC session timezone everywhere (the reference deals in epoch millis,
  /root/reference/task.ts:23).
- Arrow-accelerated Python interop for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf that must be set at session build time.
BUILD_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.showConsoleProgress": "false",
}

#: Conf that is safe to (re-)apply on an already-running session.  The
#: driver hands our queries an externally built SparkSession, so every
#: query path calls :func:`apply_runtime_conf` defensively.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def build_spark(
    app_name: str = "etl-caltopo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``shuffle_partitions`` defaults to the core count of the local
    master; on a real cluster it should be set to ~2-3x total cores (or
    left to AQE's coalescing with a high initial value).
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    for k, v in BUILD_CONF.items():
        builder = builder.config(k, v)
    # local mode: driver == executor, and Spark's 1g default is far too
    # small for broadcast builds + cached signatures on a large box.
    # Only effective at first JVM start; harmless afterwards.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_conf(spark)
    return spark


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an externally provided session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - read-only conf on some builds
            pass
    return spark
