"""Property-based checks (hypothesis) for the round-4 operators with
subtle orderings: degree-oriented triangle counting vs the naive
id-oriented 3-join, and blocked-GEMM exact-kNN candidates vs a numpy
brute force — over arbitrary small inputs that stress ties, hubs,
duplicate vectors, and zero vectors."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_caltopo_spark.llm import similarity
from etl_caltopo_spark.operators.graph import triangle_count

# undirected edges over a small node universe (hubs + multi-edges
# before dedup; canonicalized to u < v below)
edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
)


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_triangle_count_matches_naive(spark, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    df = spark.createDataFrame(edges, "u long, v long")
    got = triangle_count(df).collect()[0]["n_triangles"]
    eset = set(edges)
    nodes = sorted({n for e in edges for n in e})
    want = sum(
        1
        for i, x in enumerate(nodes)
        for y in nodes[i + 1 :]
        for z in nodes
        if z > y
        and (x, y) in eset
        and (y, z) in eset
        and (x, z) in eset
    )
    assert got == want


# small embedding sets with deliberate duplicates and a zero vector
vec = st.lists(st.integers(-2, 2), min_size=3, max_size=3)
emb_sets = st.lists(vec, min_size=3, max_size=10)


@settings(max_examples=10, deadline=None)
@given(emb_sets)
def test_exact_knn_candidates_contain_true_topk(spark, vecs):
    rows = [(i, i % 2, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    k = 2
    cand = similarity.exact_knn_candidates(df, k=k, n_candidates=min(len(rows) - 1, k + 4))
    got_pairs = {
        (r["qid"], r["nid"]) for r in cand.select("qid", "nid").collect()
    }
    # numpy brute-force true top-k by (floored cosine desc, nid asc)
    V = np.array([r[2] for r in rows], dtype=np.float64)
    norms = np.sqrt((V * V).sum(axis=1))
    for qid in range(len(rows)):
        sims = []
        for nid in range(len(rows)):
            if nid == qid:
                continue
            denom = norms[qid] * norms[nid]
            c = float(V[qid] @ V[nid] / denom) if denom > 0 else float("-inf")
            key = np.floor(c * 1e6) / 1e6 if np.isfinite(c) else float("-inf")
            sims.append((-key, nid))
        sims.sort()
        for _, nid in sims[:k]:
            assert (qid, nid) in got_pairs, (qid, nid, sims[:k], got_pairs)
