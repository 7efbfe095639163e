"""Extreme-value parity pins (round 11, fifth perturbation mode).

The ``extremes`` sweep mode (tools/degenerate_sweep.py) feeds ±inf,
NaN, ±max-double, denormals, -0.0, and above-grid finite magnitudes
through the full registry.  The engine-level contract it rests on is
pinned here:

1. ``fround`` (functions/numeric.py) must match DuckDB's
   ``floor(x * 10^dp) / 10^dp`` for EVERY double, not just the
   grid-safe range.  Spark's ``floor(double)`` returns LONG and
   SATURATES — unguarded, ``fround(inf, 6)`` silently yielded
   9223372036854.775 (long-max / 1e6) and ``fround(nan, dp)`` yielded
   0.0, where DuckDB's double floor propagates inf/nan and stays exact
   at any magnitude.  The guard routes ``|x * scale| >= 2^63`` through
   the identity ``(x * scale) / scale`` round-trip (every double
   there is already integral, so DuckDB's floor is an identity too).
2. NaN/inf ordering, grouping, and min/max/sum aggregation already
   agree between the engines (probed r11) — a canary here pins that
   shared total order so an engine upgrade that changes NaN semantics
   fails loudly.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround

INF = float("inf")
NAN = float("nan")

#: straddles every regime: zeros/denormals, normal values, the
#: dp-dependent floor-safe boundary (2^63 / 10^dp), huge finite, and
#: non-finite.
EXTREMES = [
    0.0,
    -0.0,
    5e-324,
    -5e-324,
    1.2345678901,
    -7.6e-7,
    123456.789,
    1e12,
    9.2233720368e12,  # just under the dp=6 grid edge
    9.3e12,           # just over the dp=6 grid edge
    2.5e13,
    9.223372036854776e18,  # exactly 2^63 at dp=0
    1e300,
    -1e300,
    1.7976931348623157e308,
    -1.7976931348623157e308,
    INF,
    -INF,
    NAN,
]


def _same(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
    return a == b


def _duck_lit(v: float) -> str:
    if math.isnan(v):
        return "'nan'::double"
    if v == INF:
        return "'inf'::double"
    if v == -INF:
        return "'-inf'::double"
    return repr(v) + "::double"


@pytest.mark.parametrize("dp", [0, 2, 6])
def test_fround_extreme_parity(spark, dp):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(EXTREMES)], "id long, v double"
    )
    got = {
        r.id: r.o
        for r in df.select("id", fround(F.col("v"), dp).alias("o")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {_duck_lit(v)})" for i, v in enumerate(EXTREMES))
        + ") t(id, v)"
    )
    want = dict(
        con.execute(f"select id, floor(v * {10**dp}) / {10**dp} from t").fetchall()
    )
    bad = {
        i: (EXTREMES[i], got[i], want[i])
        for i in got
        if not _same(got[i], want[i])
    }
    assert not bad, f"fround dp={dp} diverges from DuckDB: {bad}"


def test_fround_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, v double")
    assert df.select(fround(F.col("v"), 6).alias("o")).collect()[0].o is None


@pytest.mark.parametrize("width", [10.0, 2000.0])
def test_bucket_long_extreme_parity(spark, width):
    """bucket_long must match its SQL mirror for every double: inside
    the int64 grid both floor; outside (NaN/±inf/huge) both yield the
    NULL bucket — where the raw forms saturate (Spark) or raise
    (DuckDB)."""
    from etl_caltopo_spark.functions.numeric import bucket_long, sql_bucket_long

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(EXTREMES)] + [(len(EXTREMES), None)],
        "id long, v double",
    )
    got = {
        r.id: r.b
        for r in df.select(
            "id", bucket_long(F.col("v"), width).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {_duck_lit(v)})" for i, v in enumerate(EXTREMES))
        + f", ({len(EXTREMES)}, NULL::DOUBLE)) t(id, v)"
    )
    want = dict(
        con.execute(
            f"select id, {sql_bucket_long('v', width)} from t"
        ).fetchall()
    )
    assert got == want
    # the huge-finite probe value lands in the NULL bucket on BOTH sides
    assert got[EXTREMES.index(1e300)] is None
    assert got[EXTREMES.index(123456.789)] is not None


def test_vector_predicates_parity(spark):
    """vector_finite / vector_on_grid and their SQL mirrors keep the
    same rows on both engines for NULL / NaN / inf / huge / normal
    vectors."""
    from etl_caltopo_spark.llm.similarity import (
        sql_vector_finite,
        sql_vector_on_grid,
        vector_finite,
        vector_on_grid,
    )

    rows = [
        (0, [1.0, 2.0]),          # normal: finite + on-grid
        (1, [INF, 0.0]),          # inf component
        (2, [NAN, 1.0]),          # NaN component
        (3, [1e19, 1e19]),        # huge-finite: finite but OFF-grid
        (4, None),                # NULL vector
        (5, [0.0, -0.0]),         # zeros
        # NULL ELEMENT: Spark's exists() degrades to NULL and drops
        # the row; the SQL mirror needs its explicit `x IS NULL` arm
        # because DuckDB's list_filter DISCARDS NULL-predicate
        # elements (r11 continuation self-review finding)
        (6, [None, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fin = {r.vec_id for r in df.where(vector_finite(F.col("embedding"))).collect()}
    grid = {r.vec_id for r in df.where(vector_on_grid(F.col("embedding"))).collect()}
    assert fin == {0, 3, 5}
    assert grid == {0, 5}

    con = duckdb.connect()
    def lit(v):
        if v is None:
            return "NULL::DOUBLE[]"
        return (
            "["
            + ",".join("NULL" if x is None else _duck_lit(x) for x in v)
            + "]::DOUBLE[]"
        )
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {lit(v)})" for i, v in rows)
        + ") t(vec_id, embedding)"
    )
    dfin = {
        r[0]
        for r in con.execute(
            f"select vec_id from t where {sql_vector_finite('embedding')}"
        ).fetchall()
    }
    dgrid = {
        r[0]
        for r in con.execute(
            f"select vec_id from t where {sql_vector_on_grid('embedding')}"
        ).fetchall()
    }
    assert dfin == fin and dgrid == grid


def test_cents_extreme_parity(spark):
    """cents / sql_cents agree for every double: exact int64 cents on
    the grid, NULL off it (NaN/±inf/huge — where the raw round+cast
    ANSI-raises in Spark and raises in DuckDB)."""
    from etl_caltopo_spark.functions.numeric import cents, sql_cents

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(EXTREMES)] + [(len(EXTREMES), None)],
        "id long, v double",
    )
    got = {
        r.id: r.c for r in df.select("id", cents(F.col("v")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {_duck_lit(v)})" for i, v in enumerate(EXTREMES))
        + f", ({len(EXTREMES)}, NULL::DOUBLE)) t(id, v)"
    )
    want = dict(con.execute(f"select id, {sql_cents('v')} from t").fetchall())
    assert got == want
    assert got[EXTREMES.index(123456.789)] == 12345679  # round half-up
    assert got[EXTREMES.index(1e300)] is None
    assert got[EXTREMES.index(INF)] is None


def test_variance_safe_parity(spark):
    """variance_safe / sql_variance_safe keep the same rows on both
    engines, and the bound is the real portable variance domain:
    DuckDB's stddev raises OutOfRange past it where Spark yields NaN."""
    from etl_caltopo_spark.functions.numeric import (
        sql_variance_safe,
        variance_safe,
    )

    vals = [1.0, None, 1e99, 1e100, 1.7976931348623157e308, INF, -INF, NAN]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    kept = {r.id for r in df.where(variance_safe(F.col("v"))).collect()}
    assert kept == {0, 1, 2}  # NULL kept; 1e100/huge/inf/nan excluded

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, {'NULL::DOUBLE' if v is None else _duck_lit(v)})"
            for i, v in enumerate(vals)
        )
        + ") t(id, v)"
    )
    dkept = {
        r[0]
        for r in con.execute(
            f"select id from t where {sql_variance_safe('v')}"
        ).fetchall()
    }
    assert dkept == kept
    # the bound is load-bearing: unfiltered max-double RAISES in DuckDB
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("select stddev_samp(v) from t where not isnan(v)").fetchone()
    # and the filtered domain aggregates cleanly
    assert (
        con.execute(
            f"select stddev_samp(v) from t where {sql_variance_safe('v')}"
        ).fetchone()[0]
        is not None
    )


def test_float_or_null_carries_nan_through_arrow(spark):
    """_float_or_null must deliver a TRUE NaN out of a pandas UDF —
    plain float64 NaN is nan_as_null'd to SQL NULL on the Arrow
    boundary (the q_stream_stateful_totals extremes fix)."""
    import pandas as pd

    from etl_caltopo_spark.streaming.stateful import _float_or_null

    def gen(batches):
        for _ in batches:
            yield pd.DataFrame(
                {
                    "as_nan": _float_or_null(NAN, True),
                    "as_null": _float_or_null(NAN, False),
                    "plain": _float_or_null(2.5, True),
                }
            )

    row = spark.range(1).mapInPandas(
        gen, "as_nan double, as_null double, plain double"
    ).collect()[0]
    assert row.as_nan is not None and math.isnan(row.as_nan)
    assert row.as_null is None
    assert row.plain == 2.5


def test_pre_epoch_event_times_filtered_from_watermark_dedup(spark):
    """Temporal-sweep pin: Spark's watermark clock bottoms at epoch 0,
    so a pre-1970 event time is BORN LATE for
    dropDuplicatesWithinWatermark — stream_dedup_within_watermark
    makes that domain explicit by filtering pre-epoch rows (and the
    q_stream_dedup oracle mirrors it with epoch_us(ts) >= 0)."""
    from datetime import datetime

    from etl_caltopo_spark.streaming.ingest import post_epoch_only

    rows = [
        (1, datetime(1969, 7, 20, 20, 17, 40)),   # pre-epoch: excluded
        (2, datetime(1970, 1, 1, 0, 0, 0)),       # epoch zero: kept
        (3, datetime(2024, 1, 15, 12, 0, 0)),     # normal: kept
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(r.event_id for r in post_epoch_only(df, "ts").collect())
    assert got == [2, 3]


def test_negative_epoch_batch_parity(spark):
    """Pre-1970 timestamps stay exact in the BATCH engine: epoch_us /
    year / date_trunc agree with DuckDB down to the TIMESTAMP(NANOS)
    floor (the temporal sweep's batch surface)."""
    stamps = [
        "1677-09-22 00:12:44.145224",
        "1900-01-01 00:00:00",
        "1969-07-20 20:17:40.123456",
        "1970-01-01 00:00:00",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(stamps)], "id long, s string"
    ).select(
        "id", F.col("s").cast("timestamp_ntz").alias("ts")
    )
    got = {
        r.id: (r.us, r.y, r.mo)
        for r in df.select(
            "id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.year("ts").alias("y"),
            F.date_trunc("month", "ts").cast("string").alias("mo"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, TIMESTAMP '{s}')" for i, s in enumerate(stamps))
        + ") t(id, ts)"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "select id, CAST(epoch_us(ts) AS BIGINT), CAST(year(ts) AS INT),"
            " CAST(date_trunc('month', ts) AS VARCHAR) from t"
        ).fetchall()
    }
    for i in got:
        assert got[i][0] == want[i][0], (i, got[i], want[i])  # exact micros
        assert got[i][1] == want[i][1]
        assert got[i][2].startswith(want[i][2][:7])  # same month
    assert got[2][0] == -14182939876544  # 1969-07-20T20:17:40.123456 UTC


def test_nan_total_order_canary(spark):
    """Both engines sort -inf < finite < inf < NaN and group NaN/−0.0
    with themselves; a Spark or DuckDB upgrade that breaks this shared
    total order invalidates the extremes sweep's premise."""
    vals = [1.0, INF, -INF, NAN, -0.0, 2.5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    order = [r.id for r in df.orderBy("v").collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {_duck_lit(v)})" for i, v in enumerate(vals))
        + ") t(id, v)"
    )
    duck_order = [r[0] for r in con.execute("select id from t order by v").fetchall()]
    assert order == duck_order
    assert order[0] == 2 and order[-1] == 3  # -inf first, NaN last

    n_groups = df.groupBy("v").count().count()
    duck_groups = con.execute("select count(*) from (select v from t group by v)").fetchone()[0]
    assert n_groups == duck_groups == 6
