"""LLM-pipeline operator tests: dedup families, similarity, text."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_caltopo_spark.llm import dedup, multimodal, similarity
from etl_caltopo_spark.llm.text import lang_id, quality_score, token_count


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "s1"),
        (2, "the quick brown fox jumps over the lazy dog", "s1"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog", "s1"),  # near dup
        (4, "completely different text about spark engines", "s2"),
        (5, "der hund und die katze", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dup_groups(spark):
    out = dedup.exact_dup_groups(_docs(spark), "text", "doc_id").collect()
    groups = {r["keeper_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1+2 collapse, keeper is min id
    assert groups[3] == 1 and groups[4] == 1


def test_minhash_near_duplicates_finds_near_pair(spark):
    # 16 single-row bands → candidate recall 1-(1-J)^16 ≈ 1 at J=0.4
    out = dedup.near_duplicates(
        _docs(spark), "text", "doc_id", n_hashes=16, bands=16, threshold=0.3
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup always found
    assert (1, 3) in pairs  # near dup found with single-row bands
    assert all(j >= 0.3 for j in pairs.values())


def test_simhash_near_pairs(spark):
    out = dedup.simhash_near_pairs(_docs(spark), "text", "doc_id", max_hamming=16)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert pairs[(1, 2)] == 0  # identical text → identical simhash
    assert (1, 3) in pairs  # near dup within hamming radius


def test_connected_components_clusters(spark):
    vertices = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # components: {1,2,3,4} (chain), {5,6} (pair), {7} (singleton)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"]
           for r in dedup.connected_components(vertices, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_brute_force_topk_exact_neighbor(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([([1.0, 0.0, 0.0],)], "qv array<float>")
    out = similarity.brute_force_topk(emb, q, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["cos_sim"] == 1.0


def test_ivf_topk_finds_exact_match(spark):
    import random

    random.seed(7)
    rows = [(i, [random.random() for _ in range(8)]) for i in range(1, 64)]
    rows.append((100, [0.5] * 8))  # exact clone of the query vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame([([0.5] * 8,)], "qv array<float>")
    out = similarity.ivf_topk(emb, q, k=5, n_cells=4, n_probe=2).collect()
    # the clone shares the query's cell by construction → rank 1
    # (cos_sim is floor-truncated at 6dp, so an exact match reads as
    # >= 0.999999 rather than 1.0)
    assert out[0]["vec_id"] == 100
    assert out[0]["cos_sim"] >= 0.999999


def test_lsh_bucket_query_included(spark):
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([([1.0] + [0.0] * 7,)], "qv array<float>")
    out = similarity.lsh_bucket_topk(emb, q, k=3, n_planes=2, dim=8).collect()
    # vector identical to the query must share its bucket and rank first
    assert out and out[0]["vec_id"] == 0


def test_text_columns(spark):
    df = _docs(spark).select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[1]["n"] == 9
    assert got[5]["lang"] == "de"  # marker words hit
    assert got[1]["lang"] == "en"
    assert 0.0 <= got[1]["q"] <= 1.0


def test_multimodal_frame_sampling(spark):
    docs = _docs(spark)
    assets = multimodal.as_binary_assets(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "video"
    )
    frames = multimodal.sample_frames(assets, every_n_bytes=16, max_frames=3).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_idx"], r["byte_offset"]))
    # every asset yields 1..3 frames at the declared byte stride
    for frames_list in by_asset.values():
        assert 1 <= len(frames_list) <= 3
        assert all(off == idx * 16 for idx, off in frames_list)


def test_multimodal_resize_contract(spark):
    docs = _docs(spark)
    assets = multimodal.as_binary_assets(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "image"
    )
    out = multimodal.resize_stub(assets, 224, 224)
    r = out.first()
    assert r["resize_to"]["width"] == 224 and r["resize_to"]["height"] == 224
    assert multimodal.decode_image.__doc__.startswith("STUB")


def test_multimodal_feature_plumbing(spark):
    docs = _docs(spark)
    assets = multimodal.as_binary_assets(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "image"
    )
    feats = multimodal.extract_features(assets).collect()
    assert all(len(r["features"]) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["features"])
    # n_bytes metadata matches the payload length
    assert all(r["n_bytes"] == len(r["payload"]) for r in feats)


def test_redact_pii_all_three_kinds(spark):
    from etl_caltopo_spark.llm.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "call +1-555-0042 today"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "clean text stays clean"),
        ],
        "id long, body string",
    )
    out = {r["id"]: r["clean"] for r in df.select("id", redact_pii(F.col("body")).alias("clean")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "call <PHONE> today"
    assert out[3] == "ssn <SSN> leaked"
    assert out[4] == "clean text stays clean"


def test_bigrams_adjacent_tokens(spark):
    from etl_caltopo_spark.llm.text import bigrams

    df = spark.createDataFrame([(1, "a b c"), (2, "solo"), (3, "x  y")], "id long, t string")
    out = {r["id"]: r["bg"] for r in df.select("id", bigrams(F.col("t")).alias("bg")).collect()}
    assert out[1] == ["a b", "b c"]
    assert out[2] == []  # single token -> no bigrams
    assert out[3] == ["x y"]  # multi-space collapses


def test_connected_components_singletons_and_chain(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # chain 1-2-3-4 (diameter 3), pair 5-6, singleton 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in dedup.connected_components(verts, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_ppm_roundtrip_and_decode_images(spark):
    import numpy as np

    from etl_caltopo_spark.llm.multimodal import (
        as_binary_assets,
        decode_images,
        decode_ppm,
        encode_ppm,
    )

    # raster deliberately contains whitespace-valued bytes (0x0a, 0x20)
    img1 = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) + 8
    img1[0, 0] = [0x0A, 0x20, 0x09]
    img2 = np.full((4, 2, 3), 200, dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img1)) == img1).all()

    rows = [(1, bytearray(encode_ppm(img1))), (2, bytearray(encode_ppm(img2))),
            (3, bytearray(b"not an image")), (4, None)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    assets = as_binary_assets(df, "asset_id", F.col("payload"), "image")
    out = {r["asset_id"]: r for r in decode_images(assets).collect()}
    assert (out[1]["width"], out[1]["height"]) == (3, 2)
    assert (out[2]["width"], out[2]["height"]) == (2, 4)
    assert abs(out[2]["mean_rgb"][0] - 200.0) < 1e-6
    assert out[3]["width"] is None and out[4]["width"] is None


def test_wav_roundtrip_and_decode_audio(spark):
    import numpy as np

    from etl_caltopo_spark.llm.multimodal import (
        as_binary_assets,
        decode_audio,
        decode_wav,
        encode_wav,
    )

    t = np.arange(800)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
    rate, back = decode_wav(encode_wav(sine, 8000))
    assert rate == 8000 and (back == sine).all()

    # LIST chunk before data: the chunk walk must skip it
    wav = encode_wav(sine, 8000)
    extra = wav[:12] + b"LIST\x04\x00\x00\x00INFO" + wav[12:]
    rate2, back2 = decode_wav(extra)
    assert rate2 == 8000 and (back2 == sine).all()

    rows = [
        (1, bytearray(encode_wav(sine, 8000))),
        (2, bytearray(encode_wav(np.zeros(16000, dtype=np.int16), 16000))),
        (3, bytearray(b"not audio")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    assets = as_binary_assets(df, "asset_id", F.col("payload"), "audio")
    out = {r["asset_id"]: r for r in decode_audio(assets).collect()}
    assert out[1]["sample_rate"] == 8000 and out[1]["n_samples"] == 800
    assert abs(out[1]["duration_ms"] - 100.0) < 1e-3
    assert abs(out[1]["rms"] - float(np.sqrt(np.mean(sine.astype(np.float64) ** 2)))) < 0.5
    assert out[2]["duration_ms"] == 1000.0 and out[2]["rms"] == 0.0
    assert out[3]["sample_rate"] is None and out[4]["sample_rate"] is None
