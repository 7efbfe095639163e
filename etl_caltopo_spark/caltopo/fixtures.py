"""FIXTURES.md Family-A quirk matrix: builds the F1-F10 envelope.

Each fixture row pins one behavior of the reference pipeline (SURVEY
§1.5 quirks, §5.1 changelog regressions).  Tests feed the envelope
through the full pipeline and assert the golden expectations.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _feature(fid, cls, title, geometry=None, description=None, folder_id=None, **props):
    properties = {
        "title": title,
        "class": cls,
        "creator": "tester",
        "updated": 1700000000000,
    }
    if description is not None:
        properties["description"] = description
    if folder_id is not None:
        properties["folderId"] = folder_id
    properties.update(props)
    return {"id": fid, "type": "Feature", "properties": properties, "geometry": geometry}


def fixture_features() -> list[dict]:
    return [
        # F1: plain Point, minimal props, 2-elem coords, no folder
        _feature("F1", "Marker", "plain point",
                 {"type": "Point", "coordinates": [1.5, 2.5]}),
        # F2: null geometry (SARTopo Operational Period) → dropped
        _feature("F2", "OperationalPeriod", "no geometry", None),
        # F3: one per geometry class
        _feature("F3a", "Marker", "point", {"type": "Point", "coordinates": [0.0, 1.0]}),
        _feature("F3b", "Shape", "line",
                 {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]}),
        _feature("F3c", "Shape", "poly",
                 {"type": "Polygon",
                  "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]}),
        _feature("F3d", "Shape", "mline",
                 {"type": "MultiLineString",
                  "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]}),
        # F4: >3-element positions → truncated to 3 (quirk Q4)
        _feature("F4a", "Marker", "4d point",
                 {"type": "Point", "coordinates": [1.0, 2.0, 100.0, 1700000000.0]}),
        _feature("F4b", "Shape", "5d line",
                 {"type": "LineString",
                  "coordinates": [[1.0, 2.0, 3.0, 4.0, 5.0], [6.0, 7.0, 8.0, 9.0, 10.0]]}),
        # F5: folder + member
        _feature("folder-1", "Folder", "Team Alpha"),
        _feature("F5", "Marker", "member",
                 {"type": "Point", "coordinates": [5.0, 5.0]}, folder_id="folder-1"),
        # F6: dangling folderId → null path (quirk Q5)
        _feature("F6", "Marker", "dangling",
                 {"type": "Point", "coordinates": [6.0, 6.0]}, folder_id="no-such-folder"),
        # F7: Point with full style set → '#'-prefix, marker-opacity, key delete
        _feature("F7", "Marker", "styled",
                 {"type": "Point", "coordinates": [7.0, 7.0]},
                 **{"marker-color": "FF0000", "fill": "#00FF00", "fill-opacity": 0.5,
                    "stroke": "#0000FF", "stroke-opacity": 0.25, "stroke-width": 2.0}),
        # F8: explicit JSON nulls ≡ absent (quirk Q2/Q3 pin)
        _feature("F8a", "Shape", "explicit nulls",
                 {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
                 **{"fill": None, "fill-opacity": None}),
        _feature("F8b", "Shape", "absent styles",
                 {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]}),
        # F9: non-Point with marker-color → NOT prefixed, no marker-opacity
        _feature("F9", "Shape", "line with marker color",
                 {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
                 **{"marker-color": "00FF00"}),
        # F10: empty-string description stays '' (quirk Q2 decision)
        _feature("F10", "Marker", "empty desc",
                 {"type": "Point", "coordinates": [9.0, 9.0]}, description=""),
    ]


def fixture_envelope_json() -> str:
    return json.dumps(
        {
            "status": "ok",
            "timestamp": 1700000001000,
            "result": {
                "state": {"type": "FeatureCollection", "features": fixture_features()},
                "timestamp": 1700000000500,
            },
        }
    )


def fixture_envelope_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("fixture-share", fixture_envelope_json())], "share_id string, body_json string"
    )
