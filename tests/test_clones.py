"""Maximal-duplication parity pins (round 13, the ELEVENTH
perturbation mode, ``--mode clones``).

Every table becomes its first row repeated |table| times — the
stuck-producer/default-value-flood feed shape.  One finding class,
nine ids: operators had "this id column is unique" baked in.

- the per-block GEMM pair mask compared INDEX order where the SQL
  mirror compares ID order — duplicate ids emitted (x, x) pairs
  (similarity.near_pairs_within_blocks);
- clustering counted ROWS where the oracle's closure counts
  ENTITIES — one representative per id now feeds the union-find
  (dedup.clusters_within_blocks);
- q_ngram_novelty's lead() window fused duplicate doc_ids into one
  tied sequence and paired tokens ACROSS copies — bigrams are now a
  row-local index transform (also drops the per-doc window shuffle);
- q_audio_g711 joined decoded assets back by a non-unique id (k²
  row explosion) — law is now computed from the id directly (also
  drops the join);
- q_window_dist derived percent_rank/cume_dist from ROW POSITION;
  SQL defines them over rank and peer groups (all tied rows share
  (min rn - 1)/(n - 1) and (max rn)/n);
- q_udaf_geomean: a CONSTANT group's true geomean sits exactly on
  the cent-grid floor boundary, so the ±ulp exp/ln round-trip
  floored differently per engine — both sides now nudge by
  (1 + 1e-9) before the floor;
- q_stream_dedup's oracle now mirrors the operator's BY-KEY dedup
  with DISTINCT (byte-identical duplicates collapse; differing
  payloads under one key are outside the id's domain contract).
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
from degenerate_sweep import build_clones  # noqa: E402

from etl_caltopo_spark.io import TABLES  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the nine ids the clones probe caught, each now hash-graded over
#: the maximal-duplication replica (two are rows-only by contract and
#: covered by the structural tests below instead)
GRADED_FIXED = [
    "q_stream_dedup",
    "q_dedup_embed",
    "q_dedup_clusters",
    "q_dedup_resolve",
    "q_window_dist",
    "q_udaf_geomean",
    "q_ngram_novelty",
    "q_embed_lsh_portable",
    "q_audio_g711",
]


@pytest.fixture(scope="module")
def clones_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clones_replica"))
    build_clones(spark, SRC_SF, d)
    return d


@pytest.fixture(scope="module")
def oracle_con(clones_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{clones_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("qid", GRADED_FIXED)
def test_clones_hash_parity(spark, clones_dir, oracle_con, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, clones_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), qid
    assert len(s_rows) == len(d_rows), (qid, len(s_rows), len(d_rows))
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_gemm_pair_mask_never_emits_equal_ids(spark):
    """The strict-ID mask: duplicate ids in one block must emit NO
    (x, x) pairs, and k copies of id a vs m of id b must emit exactly
    k*m (a, b) rows — the SQL row-join multiplicity."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.llm import similarity

    v = [1.0, 0.0]
    rows = [(5, v), (5, v), (7, v), (7, v), (7, v)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).withColumn("blk", F.lit(1))
    pairs = similarity.near_pairs_within_blocks(
        emb, "blk", threshold=0.3
    ).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert len(pairs) == 6  # 2 copies of 5 x 3 copies of 7


def test_percent_rank_cume_dist_tie_semantics(spark):
    """All-tied input: SQL says percent_rank = 0.0 and cume_dist =
    1.0 for every row (one peer group); ntile still splits by
    position."""
    # full-table parity is covered by the sweep; here pin the tie
    # algebra directly on a crafted all-tie frame via the same path
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders = spark.createDataFrame(
            [(1, 100.0)] * 8, "o_orderkey long, o_totalprice double"
        )
        orders.coalesce(1).write.parquet(f"{d}/_t")
        part = next(
            f for f in os.listdir(f"{d}/_t") if f.endswith(".parquet")
        )
        os.replace(f"{d}/_t/{part}", f"{d}/orders.parquet")
        out = REGISTRY["q_window_dist"].fn(spark, d).collect()
        assert len(out) == 8
        assert all(r["pct_rank"] == 0.0 for r in out)
        assert all(r["cume"] == 1.0 for r in out)
        assert sorted(r["quartile"] for r in out) == [1, 1, 2, 2, 3, 3, 4, 4]


def test_geomean_constant_group_on_grid(spark, tmp_path):
    """A constant group's geomean must floor to the constant itself
    on both engines (the grid-attractor nudge)."""
    import duckdb as _duck

    li = spark.createDataFrame(
        [("A", 56025.27)] * 64 + [("R", 17.03)] * 3,
        "l_returnflag string, l_extendedprice double",
    )
    d = str(tmp_path)
    li.coalesce(1).write.parquet(f"{d}/_t")
    part = next(f for f in os.listdir(f"{d}/_t") if f.endswith(".parquet"))
    os.replace(f"{d}/_t/{part}", f"{d}/lineitem.parquet")
    out = {
        r["l_returnflag"]: r["geo_price"]
        for r in REGISTRY["q_udaf_geomean"].fn(spark, d).collect()
    }
    assert out == {"A": 56025.27, "R": 17.03}
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    duck = dict(con.execute(REGISTRY["q_udaf_geomean"].oracle).fetchall())
    assert duck == out
