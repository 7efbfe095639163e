"""Driver-contract hardening: the queries must survive a HOSTILE
foreign SparkSession (round 14).

The driver runs every query with ITS OWN session — unknown timezone,
ANSI mode, case sensitivity, shuffle sizing, AQE state.  Each query
calls ``apply_runtime_conf`` on entry, which re-asserts the conf the
engine NEEDS (UTC session timezone, AQE) — but everything it does not
re-assert must be conf-independent by construction.  This test runs a
cross-section of the registry on a deliberately hostile sibling
session (America/New_York, ANSI off, case-sensitive resolution,
shuffle.partitions=3, AQE off on entry) and hash-grades each result
against the DuckDB oracle — the exact driver gate, under the worst
session the contract allows.

Why these ids: q_date_funcs (timezone-sensitive temporal functions),
q_stream_tumbling (epoch arithmetic + streaming conf), q_json_extract
(the ANSI cast-grammar seam — its try_cast mirror must not depend on
the session's ANSI flag), q_agg_group / q_join_multiway (shuffle/AQE
planning), q_window_dist (tie semantics), q_sample (hash arithmetic),
q_percentile_approx (rank certificate), q_dedup_exact (sha2 path),
q_text_stats (locale-adjacent string functions).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracle import row_hash  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

HOSTILE_CONF = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.caseSensitive": "true",
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
}

CROSS_SECTION = [
    "q_date_funcs",
    "q_stream_tumbling",
    "q_json_extract",
    "q_agg_group",
    "q_join_multiway",
    "q_window_dist",
    "q_sample",
    "q_percentile_approx",
    "q_dedup_exact",
    "q_text_stats",
    # the six ids the r14 LTZ-output scan caught (date_trunc/last_day
    # emitted TIMESTAMP_LTZ, which COLLECTS in the driver Python
    # process's local timezone — all six now emit TIMESTAMP_NTZ, the
    # engine-wide canonical temporal type).  This file runs under
    # TZ=America/Denver in the suite, which is exactly the trigger.
    "q_date_arith",
    "q_incr_rollup",
    "q_ohlc",
    "q_mom_growth",
    "q_rolling_active_users",
]


def test_no_ltz_output_anywhere_in_cross_section(hostile):
    """No graded output column may be TIMESTAMP_LTZ — LTZ collects in
    the driver's local timezone, so the same result hashes differently
    on drivers in different timezones.  (The full-registry scan ran in
    r14 and fixed six ids; this guards the cross-section forever.)"""
    from pyspark.sql.types import ArrayType, StructType, TimestampType

    def has_ltz(dt):
        if isinstance(dt, TimestampType):
            return True
        if isinstance(dt, ArrayType):
            return has_ltz(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_ltz(f.dataType) for f in dt.fields)
        return False

    for qid in CROSS_SECTION:
        sch = REGISTRY[qid].fn(hostile, SRC_SF).schema
        bad = [f.name for f in sch.fields if has_ltz(f.dataType)]
        assert not bad, (qid, bad)


@pytest.fixture(scope="module")
def hostile(spark):
    """A sibling session (shared SparkContext, OWN SQLConf) with every
    hostile knob set — what a mis-configured driver would hand us."""
    s = spark.newSession()
    for k, v in HOSTILE_CONF.items():
        s.conf.set(k, v)
    yield s
    # leave no residue on the shared context


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC_SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", CROSS_SECTION)
def test_hostile_session_hash_parity(hostile, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(hostile, SRC_SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_runtime_conf_reasserts_what_queries_need(hostile):
    """After any query runs, the session must hold the engine's
    timezone and AQE conf regardless of what the driver set."""
    REGISTRY["q_agg_group"].fn(hostile, SRC_SF).collect()
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
    assert hostile.conf.get("spark.sql.adaptive.enabled") == "true"
