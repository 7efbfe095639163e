"""Empty-tables parity pins (round 13, the NINTH perturbation mode).

The ``empty`` sweep mode truncates every table to zero rows (schema
preserved) — the empty-partition/day scenario a 100 TB feed genuinely
produces.  The r12 probe of this mode read 268/7/17; this module pins
every fix class deterministically so a future edit can't regress one
silently:

- the seven streaming-protocol ids return the batch-shaped empty
  OUTPUT frame instead of NoneType-crashing on all-NULL min/max
  bounds (and do NOT run the availableNow protocol — an empty run
  writes no epoch dirs and the sink read-back fails on schemaless
  parquet);
- the KMeans/IVF family guards the empty fit / missing query vector;
- ROLLUP/CUBE/GROUPING SETS: Spark's Expand-based grouping sets emit
  0 rows on empty input where SQL emits the global () row — the
  portable form unions an explicit global aggregate (the Spark
  behavior itself is pinned below as a canary);
- scalar-stat ids: conditional COUNTs (0 on empty) where the oracle
  counts, a None best-pair break in BPE, a zero-node guard in
  PageRank;
- the composed pipelines (q_llm_curation_pipeline /
  q_llm_curation_stream) agree with their DuckDB replay oracles on an
  empty corpus, and the caltopo pipeline + idempotent sink survive an
  EMPTY MAP envelope (VERDICT r12 #4).
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
from degenerate_sweep import build_empty  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: every id the r12 probe (or the r13 full sweep) found failing on
#: empty input, by fix class — each must now hash-match its oracle
GRADED_FIXED = [
    # streaming-protocol guards
    "q_stream_cdc_apply",
    "q_stream_enrich",
    "q_stream_hll",
    "q_stream_incr_rollup",
    "q_stream_stateful_totals",
    "q_stream_topk",
    # KMeans/GEMM guards
    "q_knn_classify",
    # grouping-sets () row
    "q_agg_rollup",
    "q_cube",
    "q_grouping_sets",
    # scalar-stat shape
    "q_ttest_welch",
    "q_ab_test",
    "q_bpe_merge",
    "q_pagerank",
    # composed pipelines (VERDICT r12 #4: pin the empty-corpus
    # contract so a stage edit can't regress it silently)
    "q_llm_curation_pipeline",
    "q_llm_curation_stream",
]

#: rows-only ids among the fixed set: no oracle — must simply run
ROWS_ONLY_FIXED = [
    "q_stream_watermark_late",
    "q_sim_topk_ivf",
    "q_knn_classify_ivf",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_replica"))
    build_empty(spark, SRC_SF, d)
    return d


@pytest.fixture(scope="module")
def oracle_con(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", GRADED_FIXED)
def test_empty_input_hash_parity(spark, empty_dir, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, empty_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


@pytest.mark.parametrize("qid", ROWS_ONLY_FIXED)
def test_empty_input_rows_only_ids_run(spark, empty_dir, qid):
    spec = REGISTRY[qid]
    rows = spec.fn(spark, empty_dir).collect()
    # approximate families emit nothing (or, for the kNN accuracy
    # aggregate, one all-NULL/zero summary row) on an empty corpus
    assert len(rows) <= 1, (qid, rows)


def test_spark_rollup_on_empty_emits_zero_rows_canary(spark):
    """The engine behavior the portable form works around: if a Spark
    upgrade starts emitting the () row for ROLLUP over empty input,
    the union in q_agg_rollup/q_cube/q_grouping_sets would DOUBLE it —
    this canary turns that silent break into a readable failure."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "a string, b string, v double")
    assert df.rollup("a", "b").agg(F.count("*").alias("n")).count() == 0
    assert df.cube("a", "b").agg(F.count("*").alias("n")).count() == 0


def test_caltopo_pipeline_and_sink_survive_empty_map(spark):
    """VERDICT r12 #4 (empty-map contract): a valid envelope whose
    feature list is EMPTY flows through decode -> transform -> submit
    without crashing; the idempotent sink posts the canonical empty
    FeatureCollection exactly once per delivery attempt."""
    import json as _json

    from etl_caltopo_spark.caltopo.fixtures import fixture_envelope_json
    from etl_caltopo_spark.caltopo.pipeline import run_pipeline
    from etl_caltopo_spark.caltopo.sink import submit_idempotent

    env = _json.loads(fixture_envelope_json())
    env["result"] = dict(env["result"])
    env["result"]["state"] = dict(env["result"]["state"])
    env["result"]["state"]["features"] = []
    envelopes = spark.createDataFrame(
        [("empty-share", _json.dumps(env))], "share_id string, body_json string"
    )
    out = run_pipeline(envelopes)
    assert out.count() == 0

    bodies = []

    def poster(url, body, headers):
        bodies.append((body, headers.get("Idempotency-Key")))

    n = submit_idempotent(out, "http://x/submit", poster, backoff_s=0.001)
    assert n == 0
    assert len(bodies) == 1
    fc = _json.loads(bodies[0][0])
    assert fc == {"type": "FeatureCollection", "features": []}
