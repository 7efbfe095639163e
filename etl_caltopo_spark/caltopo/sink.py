"""Sinks (ref task.ts:154-159: POST the FeatureCollection to the
CloudTAK ETL API).

The POST itself is driver-side and injectable, mirroring the
reference's single submit per invocation; the parquet sink is the
test/archive path.  For very large outputs, ``foreach_partition_post``
ships batches from executors instead of collecting to the driver.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame

Poster = Callable[[str, str], None]


def _row_to_feature(row) -> dict:
    props = {
        "callsign": row["callsign"],
        "remarks": row["remarks"],
        "archived": row["archived"],
        "metadata": dict(row["metadata"]) if row["metadata"] is not None else {},
    }
    for src, dst in [
        ("cot_type", "type"),
        ("marker_color", "marker-color"),
        ("marker_opacity", "marker-opacity"),
        ("fill", "fill"),
        ("fill_opacity", "fill-opacity"),
        ("stroke", "stroke"),
        ("stroke_opacity", "stroke-opacity"),
        ("stroke_width", "stroke-width"),
        ("icon", "icon"),
    ]:
        if row[src] is not None:
            props[dst] = row[src]
    if row["path"] is not None:
        props["path"] = row["path"]
    geometry = None
    if row["geometry_type"] is not None:
        geometry = {
            "type": row["geometry_type"],
            "coordinates": json.loads(row["geometry_json"]),
        }
    return {
        "id": row["id"],
        "type": "Feature",
        "properties": props,
        "geometry": geometry,
    }


def to_feature_collection(df: DataFrame) -> dict:
    """Collect transformed rows into a GeoJSON FeatureCollection dict
    (the reference's submit payload shape, task.ts:154-157).  Only for
    reference-scale outputs — O(10^2..10^4) features per map."""
    return {
        "type": "FeatureCollection",
        "features": [_row_to_feature(r) for r in df.collect()],
    }


def post_feature_collection(df: DataFrame, url: str, poster: Poster) -> int:
    """Driver-side submit (R16).  Returns the feature count."""
    fc = to_feature_collection(df)
    poster(url, json.dumps(fc))
    return len(fc["features"])


def foreach_partition_post(df: DataFrame, url: str, poster: Poster) -> None:
    """Executor-side batched submit for large outputs: each partition
    POSTs its own FeatureCollection chunk — no driver collect."""

    def handle(rows) -> None:
        feats = [_row_to_feature(r) for r in rows]
        if feats:
            poster(url, json.dumps({"type": "FeatureCollection", "features": feats}))

    df.foreachPartition(handle)
