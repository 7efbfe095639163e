"""Dangling-foreign-key parity pins (round 14, the THIRTEENTH
perturbation mode, ``--mode orphans``).

Every ODD foreign-key value is shifted by +10^9 so it references
nothing, while primary keys stay — half of every FK edge dangles, the
feed shape late dim loads / hard deletes / partial restores produce
at 100 TB.  Both engines see the same broken data, so a divergence
would mean an operator BAKED IN referential integrity: a join rewrite
(semi/bloom/broadcast-dedup) that only equals the plain join when
every fact row has a parent, or a functional shortcut deriving
dim-side values instead of joining.

The first full probe read 282/10/0 — NO operator in the registry
assumes referential integrity — and the replica demonstrably bites:
q_join_inner loses ~half its rows, q_sql_tpch_q3 more than half, and
q_join_anti flips from 0 rows to every orphaned key.  These pins keep
that guarantee from regressing.
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
from degenerate_sweep import build_orphans  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the join-rewrite surface — every id whose plan replaces or
#: restructures a plain join (the operators a hidden referential-
#: integrity assumption would betray), plus the composed pipelines
GRADED_JOIN_SURFACE = [
    "q_join_inner",
    "q_broadcast_left_join",
    "q_join_semi",
    "q_join_anti",
    "q_join_multiway",
    "q_join_bloom_prefilter",
    "q_join_skew_salted",
    "q_sql_tpch_q3",
    "q_geo_bbox",
    "q_graph_2hop_sketch",
    "q_caltopo_pipeline",
]


@pytest.fixture(scope="module")
def orphans_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orphans_replica"))
    build_orphans(spark, SRC_SF, d)
    return d


@pytest.fixture(scope="module")
def oracle_con(orphans_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{orphans_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", GRADED_JOIN_SURFACE)
def test_orphans_hash_parity(spark, orphans_dir, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, orphans_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_orphans_replica_actually_dangles(spark, orphans_dir):
    """The probe must BITE — if orphaning stopped changing join
    outputs the axis would be vacuous.  Pin the two clearest
    witnesses: the inner join loses rows and the anti join finds the
    orphans."""
    n_inner_norm = REGISTRY["q_join_inner"].fn(spark, SRC_SF).count()
    n_inner_orph = REGISTRY["q_join_inner"].fn(spark, orphans_dir).count()
    assert n_inner_orph < n_inner_norm
    n_anti_norm = REGISTRY["q_join_anti"].fn(spark, SRC_SF).count()
    n_anti_orph = REGISTRY["q_join_anti"].fn(spark, orphans_dir).count()
    assert n_anti_norm == 0 and n_anti_orph > 0


def test_bloom_prefilter_keeps_orphans_out_exactly(spark, orphans_dir,
                                                   oracle_con):
    """The highest-risk rewrite under dangling keys: the Bloom
    prefilter admits FALSE POSITIVES by design (orphaned fact keys
    can pass the bit probes) and the real join must remove every one
    of them.  Equality with the plain-join oracle over the orphaned
    replica IS the proof; this pin states it explicitly."""
    spec = REGISTRY["q_join_bloom_prefilter"]
    s = {
        (r["o_orderpriority"], r["n_items"])
        for r in spec.fn(spark, orphans_dir).collect()
    }
    d = {(r[0], r[1]) for r in oracle_con.execute(spec.oracle).fetchall()}
    assert s == d
