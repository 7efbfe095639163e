"""Compaction + clustered-write maintenance operators."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.operators.maintenance import clustered_write, compact_parquet


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.parquet(path)  # the small-file mess
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 32
    total_before = spark.read.parquet(path).count()
    sum_before = spark.read.parquet(path).agg(F.sum("l_quantity")).collect()[0][0]

    compact_parquet(spark, path, target_file_mb=128)

    after = len(glob.glob(f"{path}/*.parquet"))
    assert after < before and after >= 1
    assert spark.read.parquet(path).count() == total_before
    assert spark.read.parquet(path).agg(F.sum("l_quantity")).collect()[0][0] == sum_before


def test_clustered_write_disjoint_file_ranges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "clustered")
    li = load_table(spark, sf_dir, "lineitem")
    clustered_write(li, path, ["l_shipdate"], n_files=4)

    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col_idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        ranges.append((min(mins), max(maxs)))

    assert len(ranges) == 4
    # files cover disjoint key ranges → min/max stats prune whole files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"
    # round trip intact
    assert spark.read.parquet(path).count() == li.count()
