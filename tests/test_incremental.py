"""Incremental batch semantics (ref task.ts:68 `since/-500` window):
high-watermark state between runs + JSON-lines source modes."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.caltopo.source import load_watermark, save_watermark
from etl_caltopo_spark.io import read_json
from etl_caltopo_spark.streaming.ingest import incremental_high_watermark


def test_watermark_roundtrip_and_delta_filter(spark, tmp_path):
    wm_path = str(tmp_path / "wm.json")
    assert load_watermark(wm_path) == 0  # first run: everything is new

    run1 = spark.createDataFrame(
        [("a", 100), ("b", 200), ("c", 300)], "id string, updated long"
    )
    hw = incremental_high_watermark(run1)
    assert hw == 300
    save_watermark(wm_path, hw)

    # second run: only rows newer than the stored watermark survive
    run2 = spark.createDataFrame(
        [("b", 200), ("c", 300), ("d", 400), ("e", 500)], "id string, updated long"
    )
    delta = run2.filter(F.col("updated") > load_watermark(wm_path))
    assert {r["id"] for r in delta.collect()} == {"d", "e"}
    save_watermark(wm_path, incremental_high_watermark(delta))
    assert load_watermark(wm_path) == 500


def test_jsonl_scan_with_schema(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text("\n".join(json.dumps({"id": i, "name": f"n{i}"}) for i in range(5)))
    df = read_json(spark, str(p), schema="id long, name string")
    assert df.count() == 5
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"


def test_jsonl_failfast_vs_permissive(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{broken\n{"id": 2, "name": "ok2"}')
    with pytest.raises(Exception):
        read_json(spark, str(p), schema="id long, name string", mode="FAILFAST").collect()
    lenient = read_json(
        spark,
        str(p),
        schema="id long, name string, _corrupt_record string",
        mode="PERMISSIVE",
    )
    rows = lenient.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["id"] is None
