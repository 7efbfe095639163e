"""Single-row-tables parity pins (round 13, the TENTH perturbation
mode, ``--mode onerow``).

Every table truncated to exactly ONE row — the seam between the empty
mode and normal data: n-1 = 0 variance denominators, single-element
windows/medians/percentiles, one-node graphs, streaming protocols
whose phase split degenerates to lo == hi (phase 1 goes empty), and
joins whose single rows no longer key-match across tables.

The r13 probe of this mode found ONE real certificate bug, fixed and
pinned here: q_percentile_approx graded its quantiles with a
FRACTION-space rank certificate (lo/n - eps <= p <= hi/n + eps) that
is unsatisfiable at n = 1 — the single element has rank fraction 1.0
against p = 0.5, even though the median of one element IS that
element.  The row-space form (rank interval [lo, hi] must intersect
[ceil(p*n) - eps*n, ceil(p*n) + eps*n]) is the standard
Greenwald-Khanna guarantee at any n.
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
from degenerate_sweep import build_onerow  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: representative single-row seams, each hash-graded over the replica:
#: the fixed certificate id, n-1=0 variance/stats, a single-element
#: median window, the grouping-sets () row, one-event streaming state,
#: and a one-node graph
ONEROW_IDS = [
    "q_percentile_approx",
    "q_agg_stats",
    "q_agg_corr",
    "q_ttest_welch",
    "q_window_median",
    "q_agg_rollup",
    "q_stream_stateful_totals",
    "q_pagerank",
]


@pytest.fixture(scope="module")
def onerow_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("onerow_replica"))
    build_onerow(spark, SRC_SF, d)
    return d


@pytest.fixture(scope="module")
def oracle_con(onerow_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{onerow_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", ONEROW_IDS)
def test_onerow_hash_parity(spark, onerow_dir, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, onerow_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_percentile_certificate_holds_at_n1(spark, onerow_dir):
    """The specific n = 1 semantics: the quantile of a single element
    is that element, and the row-space certificate must say TRUE for
    both the median and the p99 (the fraction-space form said FALSE)."""
    row = REGISTRY["q_percentile_approx"].fn(spark, onerow_dir).collect()
    assert len(row) == 1
    assert row[0]["n"] == 1
    assert row[0]["median_rank_ok"] is True
    assert row[0]["p99_rank_ok"] is True
