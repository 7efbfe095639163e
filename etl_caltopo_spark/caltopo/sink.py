"""Sinks (ref task.ts:154-159: POST the FeatureCollection to the
CloudTAK ETL API).

The default entry point is :func:`submit`, which dispatches on output
size: at reference scale (a map layer is O(10^2..10^4) features) it
mirrors the Lambda's single driver-side POST; beyond
``DRIVER_COLLECT_MAX`` features it switches to executor-side
per-partition POSTs (``foreach_partition_post``) so nothing large is
ever collected to the driver.  The parquet sink is the test/archive
path.
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


DRIVER_COLLECT_MAX = 10_000


def submit(
    df: DataFrame,
    url: str,
    poster: Poster,
    driver_collect_max: int = DRIVER_COLLECT_MAX,
) -> int:
    """Default sink (R16, task.ts:154-159).  One count pass decides
    the path: at-or-below ``driver_collect_max`` features, a single
    driver-side POST (reference-faithful — the Lambda also submits the
    whole collection at once); above it, executor-side per-partition
    POSTs so the payload never materializes on the driver.  Returns
    the feature count either way."""
    n = df.count()
    if n <= driver_collect_max:
        post_feature_collection(df, url, poster)
    else:
        foreach_partition_post(df, url, poster)
    return n
