"""Hot-key skew parity pins (round 14, the FOURTEENTH perturbation
mode, ``--mode hotkey``).

Every ODD foreign-key / grouping-key value collapses to its column's
MINIMUM — one hot key owns ~half the rows while the even tail stays
unique.  This is the MIXED-skew regime between normal data and the
clones extreme (every row identical): one celebrity user, one
boilerplate order, one dominant part — the shape every real 100 TB
corpus has somewhere.  It stresses hot/cold interaction: salted-join
parity, windows whose one partition dwarfs the rest, caps (hot-hub,
stop-shingle) that must be mirrored between query and oracle, and
aggregations mixing one huge group with many tiny ones.

The first full probe read 282/10/0 — zero failures — so the mode was
claimed same-round (the zero-failure case of the probe discipline,
like orphans).  These pins keep the guarantee from regressing on the
most skew-sensitive surface.
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
from degenerate_sweep import build_hotkey  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the skew-sensitive surface: the salted join (built FOR this shape),
#: self-join pair generators whose hot key quadruples fan-out, peer-
#: group window functions under massive ties, per-group top-k with one
#: giant group, and the hot-hub-capped graph sketch
GRADED_SKEW_SURFACE = [
    "q_join_skew_salted",
    "q_join_inner",
    "q_market_basket",
    "q_window_dist",
    "q_topk_pergroup",
    "q_agg_group",
    "q_graph_2hop_sketch",
    "q_funnel",
    "q_sessionize_batch",
    "q_ohlc",
]


@pytest.fixture(scope="module")
def hotkey_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hotkey_replica"))
    build_hotkey(spark, SRC_SF, d)
    return d


@pytest.fixture(scope="module")
def oracle_con(hotkey_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hotkey_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", GRADED_SKEW_SURFACE)
def test_hotkey_hash_parity(spark, hotkey_dir, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, hotkey_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_hotkey_replica_actually_skews(spark, hotkey_dir):
    """Vacuity check: the hot order key must own a large share of
    lineitem and the user hot key a large share of events — if the
    builder stops biting, the axis guards nothing."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import load_table

    li = load_table(spark, hotkey_dir, "lineitem")
    top = (
        li.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()
    )
    total = li.count()
    assert top["count"] / total > 0.3, (top, total)
    ev = load_table(spark, hotkey_dir, "events")
    top_u = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    assert top_u["count"] / ev.count() > 0.3, top_u
