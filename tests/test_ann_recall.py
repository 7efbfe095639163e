"""Grade the IVF recall dial (VERDICT r10 #5).

Round 10 MEASURED the production sizing on the perturbed-dilution
replica — n_cells = sqrt(N), n_probe 1/2/4 → recall@10 of
0.757 / 0.826 / 0.879 — but only as a probe run (SCALING.md).  This
test pins the n_probe=2 point as a ±0.05 tolerance band on the SAME
corpus (10x perturbed sf0.1 embeddings, built in-memory by the same
generator `tools.scale_probe.build_embeddings_replica`), so a future
quantizer / blocking / jitter change that silently craters ANN recall
fails CI instead of waiting for the next manual probe.

Everything is deterministic by construction: the jitter is hash-seeded
per (vec_id, copy, component), the query sample is a vec_id hash, and
the coarse quantizer is KMeans(seed=42) — the band absorbs only minor
partitioning-order drift in MLlib's fit, not data noise.
"""

from __future__ import annotations

import os

import pytest

#: the r10-measured dial at n_probe=2, sqrt(N) cells (SCALING.md r10)
PINNED_RECALL_AT_10 = 0.826
TOLERANCE = 0.05


def test_ivf_recall_dial_within_band(spark, sf_dir):
    sf01 = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip(f"sf0.1 sibling of SPARK_GRAFT_TEST_SF_DIR absent: {sf01}")

    from tools.scale_probe import ann_recall_probe, build_embeddings_replica

    emb = build_embeddings_replica(spark, 10, base_dir=sf01)
    recall = ann_recall_probe(spark, None, k=10, n_probe=2, emb=emb)
    assert abs(recall - PINNED_RECALL_AT_10) <= TOLERANCE, (
        f"IVF recall@10 at n_probe=2, sqrt(N) cells moved to {recall:.3f} "
        f"(pinned {PINNED_RECALL_AT_10} ± {TOLERANCE}) — a quantizer/"
        "blocking/jitter change shifted the production dial"
    )
