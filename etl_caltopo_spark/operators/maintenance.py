"""Storage maintenance operators: small-file compaction and
range-clustered writes.

At 100 TB the death-by-small-files problem (per-file scheduling +
footer overhead) and unclustered row groups (no min/max pruning) cost
more than most query-side choices.  These operators are the
housekeeping pass an ingestion pipeline schedules between batches.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite a parquet directory into ~target-sized files.

    Reads fully, writes to a sibling temp dir, then swaps — never
    overwrites the directory it is lazily reading from (the classic
    self-overwrite footgun).  Returns the new file count.
    """
    n_files = max(1, math.ceil(_dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return n_files


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str | Column],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by the clustering columns before
    writing: each output file covers a disjoint key range, so parquet
    min/max stats prune whole files for range predicates (the poor
    man's Z-order for a single dimension chain)."""
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
