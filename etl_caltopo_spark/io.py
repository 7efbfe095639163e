"""Source / sink adapters.

The reference's sources and sinks are an HTTP GET of a CalTopo map
(/root/reference/task.ts:68-70) and an HTTP POST of the transformed
FeatureCollection (/root/reference/task.ts:154-159).  Here those
generalize to Spark's columnar sources, plus the HTTP pair in
``caltopo.source`` / ``caltopo.sink``.

Scale notes (100 TB posture):
- parquet scans go through Spark's vectorized reader; filters and
  column pruning push down automatically when expressed declaratively.
- ``load_table`` never caches or collects; callers compose lazily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the driver-materialized synthetic tables (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one synthetic table.

    events.parquet carries TIMESTAMP(NANOS).  Spark 4.1 reads that
    natively as TIMESTAMP_NTZ truncated to microseconds — the same
    naive wall-clock value DuckDB's TIMESTAMP holds — so NTZ is the
    canonical ``ts`` dtype engine-wide and all epoch arithmetic goes
    through functions/temporal.py (timezone-free in any session).

    Requires Spark >= 4.1 for the native NANOS read; a pre-4.1 session
    must set ``spark.sql.legacy.parquet.nanosAsLong=true`` before
    reading, which lands in the bigint fallback branch below.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanosAsLong fallback: nanos → NTZ µs.  Integer DIV, not
            # '/': long '/' is double division and nano epochs
            # (~1.7e18) exceed double's 53-bit mantissa.
            df = df.withColumn(
                "ts",
                F.timestamp_add(
                    "MICROSECOND",
                    F.expr("ts DIV 1000"),
                    F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                ),
            )
        elif ts_type == "timestamp":
            # A session configured to read parquet as LTZ: rebuild the
            # NTZ wall-clock from the instant's epoch micros —
            # session-timezone-independent, unlike a plain NTZ cast.
            df = df.withColumn(
                "ts",
                F.timestamp_add(
                    "MICROSECOND",
                    F.unix_micros(F.col("ts")),
                    F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                ),
            )
        return df
    return spark.read.parquet(path)


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition a source to core count when it arrives in fewer
    splits than cores — used immediately before compute-bound per-row
    stages (Python codecs via mapInPandas, heavy string shingling)
    where one unsplittable parquet row group would otherwise serialize
    the whole stage onto one task.  At scale, sources have >= cores
    splits and this is a no-op; the repartition only ever pays for
    shuffling the narrow projected input, not the computed output."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_json(spark: SparkSession, path: str, schema=None, mode: str = "FAILFAST") -> DataFrame:
    """JSON-lines scan with schema enforcement.

    ``FAILFAST`` mirrors the reference's typed decode, which throws on a
    schema mismatch (/root/reference/task.ts:71-88); ``PERMISSIVE`` is
    the lenient mode with a ``_corrupt_record`` column.
    """
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile scan — the multimodal ingestion source: one row per
    file with (path, modificationTime, length, content bytes), feeding
    decode_images / decode_audio (llm/multimodal.py) without any
    driver-side file handling.  Partition-parallel: Spark splits the
    file listing across executors; pushdown prunes on path/length."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row", schema=None) -> DataFrame:
    """Native XML scan (Spark 4 bundles spark-xml).  Relevant to the
    reference's ecosystem: the CloudTAK side converts submitted
    features to Cursor-on-Target XML downstream of the submit
    boundary (/root/reference/package-lock.json:1553) — this is the
    engine-side completion for XML-shaped interchange."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).format("xml").option("rootTag", root_tag).option(
        "rowTag", row_tag
    ).save(path)
