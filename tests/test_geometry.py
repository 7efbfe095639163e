"""Geometry truncation: typed paths, UDF fallback, and the Q4
invariant property-tested with hypothesis."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_caltopo_spark.caltopo.geometry import truncate_coordinates

position = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=2, max_size=6
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "geometry_type string, geometry_json string")
    return truncate_coordinates(df).collect()


def test_unknown_type_falls_back_to_walker(spark):
    # GeometryCollection-ish ragged nesting goes through the pandas_udf
    ragged = [[1.0, 2.0, 3.0, 4.0], [[5.0, 6.0, 7.0, 8.0, 9.0]]]
    out = _run(spark, [("Weird", json.dumps(ragged))])
    assert json.loads(out[0]["geometry_json"]) == [[1.0, 2.0, 3.0], [[5.0, 6.0, 7.0]]]


def test_null_geometry_passes_through(spark):
    out = _run(spark, [("Point", None), (None, None)])
    assert all(r["geometry_json"] is None for r in out)


@settings(max_examples=10, deadline=None)
@given(st.lists(position, min_size=1, max_size=5))
def test_linestring_truncation_property(spark, positions):
    """∀ LineString: every output position is the <=3-element prefix
    of its input position (quirk Q4)."""
    out = _run(spark, [("LineString", json.dumps(positions))])
    got = json.loads(out[0]["geometry_json"])
    assert len(got) == len(positions)
    for inp, outp in zip(positions, got):
        assert len(outp) <= 3
        assert outp == [float(x) for x in inp[:3]]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(position, min_size=1, max_size=4), min_size=1, max_size=3))
def test_polygon_truncation_property(spark, rings):
    out = _run(spark, [("Polygon", json.dumps(rings))])
    got = json.loads(out[0]["geometry_json"])
    for ring_in, ring_out in zip(rings, got):
        for inp, outp in zip(ring_in, ring_out):
            assert outp == [float(x) for x in inp[:3]]
