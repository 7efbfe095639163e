"""Tenth extended wave: corpus curation, codecs-as-queries, ANN index ops.

Reference basis: all [EXT+] — the curation and indexing primitives
large-scale training-data pipelines run between crawl and tokenizer:

- ``q_lm_score`` is CCNet-style language-model quality filtering: score
  each document by the cross-entropy of a bigram LM trained on the
  corpus itself (documents far from the corpus distribution — gibberish,
  boilerplate, wrong-language residue — score high and get dropped or
  down-weighted);
- ``q_span_dup_rate`` is the per-document signal of substring-level
  dedup (Lee et al., "Deduplicating Training Data Makes Language Models
  Better"): the fraction of a document's 8-token spans that appear
  verbatim in at least one other document — the per-doc complement of
  the corpus-level ``q_repeated_spans`` ranking;
- ``q_semdedup`` is SemDeDup (Abbas et al. 2023): cluster embeddings
  with a coarse quantizer, then drop within-cluster semantic duplicates
  above a cosine threshold, keeping one representative.  The clusters
  are what bound the pairwise step — the quadratic never leaves a cell;
- the rest of the wave: four-codec image parity and AVI/ADPCM decode
  gradings (``q_image_formats``/``q_video_frames``/``q_audio_adpcm``),
  asymmetric containment dedup, content-defined chunking,
  deterministic shuffle-sharding, feature-hashing embeddings,
  PQ encoding, three-iteration exact Lloyd k-means, and a graded IVF
  recall@10 evaluation.

Numeric policy (HANDOFF.md): counts stay integers until one final
double expression; log-sums use the q_word_entropy 4-dp floor; cosine
uses the q_centroid_assign 6-dp floor on both engines before any
threshold comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import finite_or_null, fround
from etl_caltopo_spark.functions.portable import (
    MH_A,
    MH_B,
    MH_P,
    minhash_signature_sql,
    portable_string_hash,
    portable_string_hash_sql,
)
from etl_caltopo_spark.io import fan_out, load_table
from etl_caltopo_spark.llm import dedup, similarity, text
from etl_caltopo_spark.llm.similarity import sql_vector_finite as _sql_vector_finite
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_lm_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), big AS (
        SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ), m AS (
        SELECT doc_id, w1, w2, count(*) AS m FROM big GROUP BY 1, 2, 3
    ), c12 AS (
        SELECT w1, w2, sum(m) AS c12 FROM m GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, sum(m) AS c1 FROM m GROUP BY 1
    ), vocab AS (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
              FROM documents)
        WHERE w <> ''
    )
    SELECT m.doc_id,
           CAST(sum(m.m) AS BIGINT) AS n_bigrams,
           floor(sum(m.m * (ln(c1.c1 + vocab.v) - ln(c12.c12 + 1))) / sum(m.m)
                 * 10000) / 10000 AS cross_entropy
    FROM m
    JOIN c12 ON m.w1 = c12.w1 AND m.w2 = c12.w2
    JOIN c1 ON m.w1 = c1.w1, vocab
    GROUP BY m.doc_id
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (CCNet-style perplexity filtering):
    train add-one-smoothed bigram counts on the corpus itself, then
    score each document by the mean negative log-likelihood (nats) of
    its bigrams — P(w2|w1) = (c12 + 1) / (c1 + V) where c1 is the
    left-context count and V the unigram vocabulary size.  Out-of-
    distribution documents score high; corpus filters threshold on it.

    Scale shape: everything aggregates integer counts first (partial
    aggregation on every shuffle), with exactly one log expression per
    surviving (doc, bigram) type.  The model "training" is two
    corpus-level count tables — c12 keyed by bigram, c1 keyed by
    unigram — joined back to per-doc counts on those same keys, so the
    two joins are plain shuffle equi-joins that AQE can skew-split on
    stopword bigrams; c1 (vocab-sized) broadcasts at any scale, and V
    is a broadcast scalar.  No Python anywhere; per-doc sums absorb
    summation-order drift with the 4-dp floor (q_word_entropy
    policy)."""
    apply_runtime_conf(spark)
    # fan_out (r14): the one-row-group source ran both tokenize passes
    # as ~0.9 s single-task map stages; the identical repartition
    # subtree is exchange-reused (no-op at scale)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # m pinned (r14, knowledge #16's multi-consumer rule): c12, c1 and
    # the per-doc join all consume it, and the optimizer re-ran the
    # full tokenize + bigram explode + count for each consumer
    # (measured: three identical 32-task stages writing the same 5 MB
    # exchange)
    from etl_caltopo_spark.operators.rank import pin_frame as _pin_m

    m = _pin_m(
        big.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))
    )
    c12 = m.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    c1 = m.groupBy("w1").agg(F.sum("m").alias("c1"))
    vocab = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    per = (
        m.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
    )
    return per.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_bigrams"),
        fround(
            F.sum(
                F.col("m")
                * (F.log(F.col("c1") + F.col("v")) - F.log(F.col("c12") + 1))
            )
            / F.sum("m"),
            4,
        ).alias("cross_entropy"),
    )


@query(
    "q_span_dup_rate",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 7, 1) + 1),
                   i -> array_to_string(t[i:i+7], ' ')
               ))) AS span
        FROM toks
    ), df AS (
        SELECT span, count(*) AS df FROM sh GROUP BY span
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           floor((sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) / count(*))
                 * 1000000) / 1000000 AS dup_rate
    FROM sh JOIN df ON sh.span = df.span
    GROUP BY sh.doc_id
    """,
)
def q_span_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-duplication rate: the fraction of a document's
    distinct 8-token spans that appear verbatim in at least one OTHER
    document — the per-doc decision signal of substring-level dedup
    (drop or trim documents whose content is mostly shared boilerplate),
    complementing the corpus-level ``q_repeated_spans`` ranking.

    Scale shape: an inverted index on the span itself — distinct spans
    explode map-side, ONE shuffle keyed by span builds document
    frequency with partial aggregation, and the join back to per-doc
    spans rides the same key (AQE splits boilerplate-span skew).  Cost
    scales with the shared-span tail, never |docs|²; at 100 TB the span
    column would carry a 64-bit hash, with text resolved only for
    survivors — here the text is carried so the oracle replays it
    exactly.  The rate is one exact integer division, 6-dp floor."""
    apply_runtime_conf(spark)
    # fan_out (r14): single-task 8-token shingle explode on the
    # one-row-group source (measured 0.8 s scan stage; no-op at scale)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n=8)).alias("span")
    )
    # shingles() is per-doc distinct, so count(*) per span == doc frequency
    df = sh.groupBy("span").agg(F.count("*").alias("df"))
    shared = (F.col("df") >= 2).cast("long")
    return (
        sh.join(df, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(shared).cast("bigint").alias("n_shared"),
            fround(F.sum(shared) / F.count("*"), 6).alias("dup_rate"),
        )
    )


@query(
    "q_semdedup",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
        WHERE vec_id < 8 AND {_sql_vector_finite("embedding")}
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE vec_id >= 8 AND {_sql_vector_finite("embedding")}
    ), s AS (
        SELECT p.vec_id, c.centroid_id,
               floor(list_dot_product(v, cv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv, cv))) * 1000000) / 1000000
                   AS cos_sim
        FROM p, c
    ), cells AS (
        SELECT vec_id, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id) AS rn
            FROM s)
        WHERE rn = 1
    ), dup AS (
        SELECT DISTINCT cb.vec_id AS dup_id
        FROM cells ca
        JOIN p a ON ca.vec_id = a.vec_id
        JOIN cells cb ON ca.centroid_id = cb.centroid_id
                     AND ca.vec_id < cb.vec_id
        JOIN p b ON cb.vec_id = b.vec_id
        WHERE floor(list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v)) *
                     sqrt(list_dot_product(b.v, b.v))) * 1000000) / 1000000
              >= 0.3
    )
    SELECT vec_id, centroid_id FROM cells
    WHERE vec_id NOT IN (SELECT dup_id FROM dup)
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication: assign
    every point to its nearest centroid (the q_centroid_assign E-step,
    broadcast centroids, ties to the lowest centroid id), then inside
    each cell drop every point that has a lower-id neighbour with
    cosine ≥ 0.3 (the synthetic clusters are loose — q_dedup_embed
    calibration), keeping the surviving representatives.  The
    pair-pruning rule (drop j iff ∃ i<j in-cell with cos ≥ τ) is
    order-free and deterministic — no greedy chain — so DuckDB replays
    it exactly.

    Scale shape: exact-duplicate vectors first collapse to their
    min-id representative (one hash-shuffle on the vector bytes) —
    provably output-equivalent under the pair-pruning rule, because a
    non-min clone is always dropped by its own representative
    (cos = 1) and any drop witnessed by a clone is witnessed by its
    smaller-id representative too.  That collapse is what keeps the
    duplicate-heavy regime linear.  The assignment pass is map-only
    against broadcast centroids; the pairwise step shuffles once on
    the cell id into per-cell chunked-BLAS (dedup.py
    semdedup_drop_within_blocks — r10: the pair equi-join + per-pair
    higher-order cosine it replaces measured 49x on the
    perturbed-dilution 10x replica, where realistic non-identical
    neighborhoods defeat the exact-dup collapse; the GEMM form runs
    the same quadratic vectorized).  The residual quadratic is bounded
    by the largest cell of DISTINCT vectors (SemDeDup's design point —
    at 100 TB the quantizer's k grows to cap cell sizes, or the
    hyperplane-LSH bucket variant replaces the cell key).  Cosine
    floors at 6 dp on both engines before the threshold test —
    GEMM only screens; the ambiguity band re-scores with the exact
    sequential fold — so boundary ulps can't flip membership."""
    apply_runtime_conf(spark)
    # NULL vectors can't be assigned or compared (r8 NULL policy;
    # a NULL embedding also must not become a groupBy("embedding")
    # NULL group with a min-id representative); non-finite vectors
    # are excluded with them (extremes r11 — NaN cosine passes every
    # DESC ordering as the engines' largest value, so an unfiltered
    # NaN point would grab an arbitrary cell)
    emb = load_table(spark, sf_dir, "embeddings").where(
        similarity.vector_finite(F.col("embedding"))
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    pts = (
        emb.filter(F.col("vec_id") >= 8)
        .groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id", "embedding")
    )
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        similarity.cosine_rounded(F.col("embedding"), F.col("cv"), 6).alias(
            "cos_sim"
        ),
    )
    # argmax per point as a partial-aggregating max_by (ties to the
    # lowest centroid id) — combiner-friendly, no per-point window sort
    cells = scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id", F.struct(F.col("cos_sim"), -F.col("centroid_id"))
        ).alias("centroid_id")
    )
    from etl_caltopo_spark.llm.dedup import semdedup_drop_within_blocks

    dup = semdedup_drop_within_blocks(
        cells.join(pts, "vec_id"), "centroid_id", 0.3
    )
    return cells.join(dup, "vec_id", "left_anti")


@query(
    "q_image_formats",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CASE doc_id % 6 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
                           WHEN 2 THEN 'bmp' WHEN 3 THEN 'gif'
                           WHEN 4 THEN 'webp' ELSE 'tiff' END AS fmt,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
           CAST(6 + (doc_id % 3) * 6 AS BIGINT) AS height,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) AS REAL) AS DOUBLE) AS mean_r,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) + 85 AS REAL) AS DOUBLE) AS mean_g,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) + 170 AS REAL) AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def q_image_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-codec image decode parity: deterministic gradient images
    (pixel (x, y, c) = x + 2y + 85c) are encoded per document into a
    format cycling over binary PPM, PNG (scanline filter cycling),
    24-bit BMP, GIF (palette + LZW, interlaced for every other GIF
    row), WebP lossless (VP8L prefix-coded bitstream, every other one
    through the subtract-green transform), and baseline TIFF
    (alternating byte order) — then carried as opaque binary assets
    and decoded back through the magic-sniffing dispatcher inside ONE
    Arrow-batched mapInPandas pass.  The oracle is the closed form of
    the gradient mean (identical for every codec), so a bug in any
    one of the six encoders OR decoders breaks the hash.

    Scale shape: generate → decode is map-only (fan_out first so the
    compute-bound codec work spreads across cores despite the
    single-split local source); no shuffle anywhere.  The gradient
    has ≤ w + 2h distinct colors, within GIF's 256-entry palette."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    from etl_caltopo_spark.io import fan_out
    from etl_caltopo_spark.llm import multimodal

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("fmt", StringType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fmts, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 + (d % 5) * 4
                h = 6 + (d % 3) * 6
                x = np.arange(w, dtype=np.uint16)[None, :, None]
                y = np.arange(h, dtype=np.uint16)[:, None, None]
                c = np.arange(3, dtype=np.uint16)[None, None, :]
                img = (x + 2 * y + 85 * c).astype(np.uint8)
                k = d % 6
                if k == 0:
                    fmts.append("ppm")
                    payloads.append(multimodal.encode_ppm(img))
                elif k == 1:
                    fmts.append("png")
                    # (d // 6) % 5 — with the 6-format cycle, d % 6 is
                    # constant for PNG docs; divide first so all five
                    # scanline filters keep cycling across assets
                    payloads.append(
                        multimodal.encode_png(img, filter_type=(d // 6) % 5)
                    )
                elif k == 2:
                    fmts.append("bmp")
                    payloads.append(multimodal.encode_bmp(img))
                elif k == 3:
                    fmts.append("gif")
                    # (d // 6) % 2 — d % 6 is constant for GIF docs, so
                    # divide first (the PNG-branch idiom); the old
                    # d % 8 == 3 fired for only 1 in 4 GIFs
                    payloads.append(
                        multimodal.encode_gif(img, interlaced=bool((d // 6) % 2))
                    )
                elif k == 4:
                    from etl_caltopo_spark.llm.vp8l import (
                        encode_webp_lossless,
                    )

                    fmts.append("webp")
                    # (d // 6) % 2: WebP docs have d % 6 == 4, so d is
                    # always even and the old bool(d % 2) NEVER enabled
                    # subtract-green — the docstring's claimed coverage
                    # was dead (code-review r6)
                    payloads.append(
                        encode_webp_lossless(
                            img, subtract_green=bool((d // 6) % 2)
                        )
                    )
                else:
                    fmts.append("tiff")
                    payloads.append(
                        multimodal.encode_tiff(img, big_endian=bool(d % 4 == 1))
                    )
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "fmt": fmts, "payload": payloads}
            )

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "image")
    decoded = multimodal.decode_images(assets)
    # fmt is a pure function of asset_id — derive it arithmetically
    # instead of joining back to raw (which would re-run the generator)
    fmt = F.element_at(
        F.array(
            F.lit("ppm"),
            F.lit("png"),
            F.lit("bmp"),
            F.lit("gif"),
            F.lit("webp"),
            F.lit("tiff"),
        ),
        (F.col("asset_id") % 6 + 1).cast("int"),
    )
    return decoded.select(
        "asset_id",
        fmt.alias("fmt"),
        "width",
        "height",
        F.element_at("mean_rgb", 1).cast("double").alias("mean_r"),
        F.element_at("mean_rgb", 2).cast("double").alias("mean_g"),
        F.element_at("mean_rgb", 3).cast("double").alias("mean_b"),
    )


@query(
    "q_video_frames",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
           CAST(6 + (doc_id % 3) * 6 AS BIGINT) AS height,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) + 9 * f AS REAL) AS DOUBLE)
               AS mean_r,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) + 9 * f + 85 AS REAL) AS DOUBLE)
               AS mean_g,
           CAST(CAST((8 + (doc_id % 5) * 4 - 1) / 2.0
                     + (6 + (doc_id % 3) * 6 - 1) + 9 * f + 170 AS REAL) AS DOUBLE)
               AS mean_b
    FROM documents, UNNEST(range(0, 1 + doc_id % 3)) AS u(f)
    """,
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame video decode over REAL uncompressed AVI payloads:
    deterministic gradient frame stacks (pixel (x, y, c) in frame f =
    x + 2y + 85c + 9f, all < 256) are packed into RIFF/AVI containers
    per document, carried as opaque binary assets, and decoded back
    frame-by-frame (RIFF walk → DIB rasters) inside one Arrow-batched
    mapInPandas — emitting a row per frame with per-channel means the
    closed-form oracle hash-checks.  A bug in the container writer,
    the chunk walker, the BGR/bottom-up raster handling, or the frame
    explode breaks the hash.

    Scale shape: generate → decode is map-only with no shuffle; the
    per-frame explode happens inside the same Arrow batch (rows out >
    rows in is native to mapInPandas).  fan_out first so codec work
    spreads across cores despite the single-split local source."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from etl_caltopo_spark.io import fan_out
    from etl_caltopo_spark.llm import multimodal

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 + (d % 5) * 4
                h = 6 + (d % 3) * 6
                n = 1 + d % 3
                x = np.arange(w, dtype=np.uint16)[None, None, :, None]
                y = np.arange(h, dtype=np.uint16)[None, :, None, None]
                c = np.arange(3, dtype=np.uint16)[None, None, None, :]
                f = np.arange(n, dtype=np.uint16)[:, None, None, None]
                stack = (x + 2 * y + 85 * c + 9 * f).astype(np.uint8)
                payloads.append(multimodal.encode_avi(stack, fps=10))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "video")
    decoded = multimodal.decode_video(assets)
    return decoded.select(
        "asset_id",
        "frame_idx",
        "width",
        "height",
        F.col("mean_r").cast("double").alias("mean_r"),
        F.col("mean_g").cast("double").alias("mean_g"),
        F.col("mean_b").cast("double").alias("mean_b"),
    )


@query(
    "q_cdc_chunk",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), pos AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i, ts[CAST(i AS INT)] AS tok
        FROM d, UNNEST(range(1, len(ts) + 1)) AS u(i)
        WHERE len(ts) > 0 AND ts[1] <> ''
    ), h AS (
        SELECT doc_id, i,
               (((list_sum(list_transform(string_split(tok, ''), c -> ascii(c)))
                  % 2147483647)
                 * 2654435761 + length(tok) * 1000003) % 4294967296) % 8 = 0
                   AS b
        FROM pos
    ), c AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN b THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_id
        FROM h
    ), k AS (
        SELECT doc_id, chunk_id, count(*) AS clen FROM c GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(clen) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(max(clen) AS BIGINT) AS max_chunk_len,
           floor((sum(clen) / count(*)) * 1000000) / 1000000 AS avg_chunk_len
    FROM k GROUP BY doc_id
    """,
)
def q_cdc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the FastCDC/rolling-boundary family,
    token-level): a chunk boundary falls AFTER any token whose
    portable fingerprint ≡ 0 (mod 8) — so boundaries depend only on
    local content, and an insertion early in a document shifts chunk
    boundaries only until the next content boundary resynchronizes
    (the property that makes chunk-level dedup robust to edits, which
    fixed-size q_doc_chunk lacks; pinned in tests).  Expected chunk
    length is 8 tokens.

    The fingerprint is the engine-portable multiplicative hash of the
    token's code-point sum and length (the q_span_corrupt hash
    family) — deterministic in both engines, no RNG state.

    Scale shape: one explode and ONE shuffle keyed by doc_id (the
    running boundary count is a per-doc window; partial aggregation
    collapses the chunk rollup on the same key), then a doc-keyed
    final aggregate.  Per-token hashing is pure codegen Column
    expressions — no Python.  fan_out first (r14): the per-char
    interpreted fold is the dominant compute and a one-row-group
    source would run it on a single task."""
    apply_runtime_conf(spark)
    from pyspark.sql import Window

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("ts")).filter(
        (F.size("ts") > 0) & (F.element_at("ts", 1) != "")
    )
    pos = toks.select(
        "doc_id", F.posexplode("ts").alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    code_sum = F.aggregate(
        F.transform(F.split(F.col("tok"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    # reduce the code sum mod 2^31-1 BEFORE the multiplicative step:
    # unreduced, a single multi-thousand-char high-codepoint token
    # (unsegmented CJK) overflows int64 in Spark (silent wrap) while
    # DuckDB promotes to HUGEINT — engines would diverge.  The oracle
    # mirrors the reduction; ASCII test tokens are unaffected.  length
    # casts to long too: INT*INT wraps past ~2147-char tokens.
    fp = (
        (code_sum % 2147483647) * 2654435761
        + F.length("tok").cast("long") * 1000003
    ) % 4294967296
    b = (fp % 8 == 0).cast("long")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = pos.select(
        "doc_id", F.coalesce(F.sum(b).over(w), F.lit(0)).alias("chunk_id")
    )
    k = chunked.groupBy("doc_id", "chunk_id").agg(F.count("*").alias("clen"))
    return k.groupBy("doc_id").agg(
        F.sum("clen").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.max("clen").cast("bigint").alias("max_chunk_len"),
        fround(F.sum("clen") / F.count("*"), 6).alias("avg_chunk_len"),
    )


@query(
    "q_pq_encode",
    oracle="""
    WITH cb AS (
        SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 4
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 4
    ), sub AS (
        SELECT p.vec_id, CAST(s AS BIGINT) AS subspace, cb.code,
               floor((list_dot_product(v[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)],
                                       v[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)])
                      - 2 * list_dot_product(v[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)],
                                             cv[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)])
                      + list_dot_product(cv[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)],
                                         cv[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)]))
                     * 1000000) / 1000000 AS d2
        FROM p, UNNEST(range(0, 8)) AS t(s), cb
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id, subspace ORDER BY d2, code) AS rn
        FROM sub
    )
    SELECT vec_id, subspace, code, d2 AS qerr FROM r WHERE rn = 1
    """,
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (the PQ half of IVF-PQ, the
    standard billion-scale ANN index): split each 64-d embedding into
    8 contiguous 8-d subvectors and assign each to its nearest entry
    of that subspace's codebook (here the slices of vec_id < 4, a
    deterministic stand-in for trained sub-centroids), emitting one
    (vec_id, subspace, code, qerr) row per subvector — the 8-byte code
    word that replaces a 256-byte vector on the wire.

    Exactness chain: squared distance is composed from three
    sequential-fold dot products (‖a‖² − 2a·b + ‖b‖², the
    similarity.dot pattern that matches DuckDB's list_dot_product
    fold), floored at 6 dp BEFORE the argmin so a boundary ulp can't
    flip code assignment; ties break to the lowest code.

    Scale shape: the codebook broadcasts (k × dim doubles); the
    subspace explode and per-(point, subspace) argmin are map-side —
    the min collapses via partial aggregation on data already keyed by
    the point, so the only exchange is the final per-point shuffle,
    carrying 8 code rows per vector, not the vectors."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cb = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("code"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    # fan_out (r14): one-row-group source — the subvector folds
    # otherwise all run on a single scan task
    pts = fan_out(
        emb.filter(F.col("vec_id") >= 4).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    # slice + ‖subvector‖² hoisted to one fold per (point, subspace) /
    # per (code, subspace) BEFORE the code join (r14,
    # sqdist_rounded_prenormed): the pair projection previously sliced
    # both vectors and ran all three folds per (point, subspace, code)
    # row.  The equi-join on subspace pairs exactly the rows the
    # crossJoin-then-slice did.
    sub = pts.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("subspace"),
        "v",
    ).select(
        "vec_id",
        "subspace",
        F.slice("v", F.col("subspace") * 8 + 1, 8).alias("sv"),
    ).withColumn("aa", similarity.dot(F.col("sv"), F.col("sv")))
    cbsub = cb.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("subspace"),
        "cv",
    ).select(
        "code",
        "subspace",
        F.slice("cv", F.col("subspace") * 8 + 1, 8).alias("bv"),
    ).withColumn("bb", similarity.dot(F.col("bv"), F.col("bv")))
    d2 = similarity.sqdist_rounded_prenormed(
        F.col("aa"), F.col("sv"), F.col("bv"), F.col("bb"), 6
    )
    scored = sub.join(F.broadcast(cbsub), "subspace").select(
        "vec_id",
        F.col("subspace").cast("bigint").alias("subspace"),
        "code",
        d2.alias("d2"),
    )
    best = scored.groupBy("vec_id", "subspace").agg(
        F.min(F.struct("d2", "code")).alias("m")
    )
    return best.select(
        "vec_id", "subspace", F.col("m.code").alias("code"), F.col("m.d2").alias("qerr")
    )


@query(
    "q_global_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               ((((doc_id % 2147483648) * 1000003) % 2147483648)
                * 2654435761) % 4294967296 AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(hv % 16 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id)
               AS BIGINT) AS pos
    FROM h
    """,
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-shard assignment:
    every document gets a pseudo-random but reproducible (shard,
    position) under the portable multiplicative hash — the
    shuffle-then-shard step every epoch-0 data loader needs, with no
    RNG state so any engine (and any retry) reproduces the same
    order.

    Scale shape: NOT a global sort — the shard id is the hash residue,
    so the only exchange is one shuffle on the shard key and the
    position is a within-shard window (range-partitioned sort per
    shard, exactly how a distributed sort-by-key would place rows).
    16 shards here; at 100 TB the shard count scales with the target
    file count and the plan is unchanged."""
    apply_runtime_conf(spark)
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # id pre-reduced mod 2^31 before the Knuth multiply — identical hv
    # for any nonnegative id, no int64 overflow at snowflake-scale ids
    # (bigids sweep r14; HANDOFF knowledge #35)
    hv = (
        ((F.col("doc_id") % 2147483648) * 1000003) % 2147483648
    ) * 2654435761 % 4294967296
    h = docs.select("doc_id", hv.alias("hv"), (hv % 16).alias("shard"))
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@query(
    "q_dedup_containment",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ts) - 3, 1) + 1),
                   i -> array_to_string(ts[i:i+3], ' ')
               ))) AS shingle
        FROM t
    ), keep AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50
    ), fsh AS (
        SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)
    ), size_a AS (
        SELECT doc_id, count(*) AS n FROM fsh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM fsh a JOIN fsh b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor((shared / n) * 1000000) / 1000000 AS containment
    FROM pairs JOIN size_a ON id_a = size_a.doc_id
    WHERE floor((shared / n) * 1000000) / 1000000 >= 0.5
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: C(A→B) = |S(A) ∩ S(B)| / |S(A)|
    over 4-token shingles — the signal Jaccard misses when one
    document is a near-SUBSET of another (quotes, excerpts, page
    wrappers around syndicated articles); pairs with C ≥ 0.5 are
    (contained, container) candidates in both directions.

    Scale shape: an inverted shingle index, NOT an all-pairs join —
    stop-shingles (document frequency > 50) are dropped first, which
    is both the standard boilerplate guard and the skew cap: the
    per-shingle join fan-out is bounded by 50², and the one wide
    exchange is keyed by the shingle.  Pair aggregation and the size
    join ride doc-id keys with partial aggregation.  Exact integer
    division, 6-dp floor on both engines before the threshold.
    fan_out first (r14): the shingle explode ran 3.4 s on a single
    scan task (one-row-group source; no-op at scale)."""
    apply_runtime_conf(spark)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n=4)).alias("shingle")
    )
    keep = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= 50
    )
    fsh = sh.join(keep.select("shingle"), "shingle")
    size_a = fsh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = fsh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = fsh.select(F.col("doc_id").alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    cont = fround(F.col("shared") / F.col("n"), 6)
    return (
        pairs.join(size_a.withColumnRenamed("doc_id", "id_a"), "id_a")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= 0.5)
    )


@query(
    "q_audio_adpcm",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(777 + (doc_id % 5) * 101 AS BIGINT) AS n_samples,
           CAST(CAST((777 + (doc_id % 5) * 101) / 8.0 AS REAL) AS DOUBLE)
               AS duration_ms
    FROM documents
    """,
)
def q_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio decode over REAL IMA ADPCM WAV payloads:
    deterministic waveforms are 4-bit ADPCM-encoded per document
    (4:1 vs PCM16), carried as opaque binary assets, and decoded back
    (block headers, nibble codes, fact-chunk truncation of the padded
    final block) inside one Arrow-batched mapInPandas.  The oracle
    checks the structural closed form — sample count (NOT
    block-aligned, so the fact-chunk path must work) and duration —
    while waveform fidelity (SNR > 25 dB) and bit-exactness of the
    nibble decoder against stdlib audioop's reference implementation
    are pinned in tests/test_llm_ops.py (the codec is lossy, so
    content has no cross-engine closed form).

    Scale shape: generate → decode is map-only, no shuffle; fan_out
    spreads the codec work across cores."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from etl_caltopo_spark.io import fan_out
    from etl_caltopo_spark.llm import multimodal

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 777 + (d % 5) * 101
                t = np.arange(n)
                sig = (
                    3000 * np.sin(t / (15.0 + d % 7))
                    + 1000 * np.sin(t / 5.0 + d)
                ).astype(np.int16)
                payloads.append(multimodal.encode_adpcm_wav(sig, 8000))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "audio")
    decoded = multimodal.decode_audio(assets)
    return decoded.select(
        "asset_id",
        "sample_rate",
        "n_samples",
        F.col("duration_ms").cast("double").alias("duration_ms"),
    )


def _kmeans_oracle(iters: int = 3) -> str:
    """Unrolled DuckDB oracle for ``q_kmeans_converge`` (the
    q_bpe_merge pattern: the iterative algorithm's exact fixed-round
    unrolling as chained CTEs)."""

    def d2(vc: str) -> str:
        return (
            f"floor((list_dot_product(v, v) - 2 * list_dot_product(v, {vc})"
            f" + list_dot_product({vc}, {vc})) * 1000000) / 1000000"
        )

    # the exact-integer M-step needs every component on the 4-dp int64
    # grid: |x·10^4| < 2^63.  NaN/±inf order above the limit in both
    # engines, so ONE comparison excludes non-finite AND huge-finite
    # vectors (extremes r11).
    from etl_caltopo_spark.llm.similarity import sql_vector_on_grid

    grid = sql_vector_on_grid("embedding")
    sql = f"""
    WITH p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 8 AND {grid}
    ), cent0 AS (
        SELECT vec_id AS centroid_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 10000) / 10000) AS cv
        FROM embeddings WHERE vec_id < 8 AND {grid}
    )"""
    for i in range(iters):
        sql += f""", s{i} AS (
        SELECT p.vec_id, p.v, c.centroid_id, {d2('c.cv')} AS d2
        FROM p, cent{i} c
    ), a{i} AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
            FROM s{i})
        WHERE rn = 1
    ), m{i} AS (
        SELECT centroid_id, CAST(j - 1 AS INTEGER) AS dim,
               CAST(count(*) AS BIGINT) AS n_points,
               floor(sum(CAST(floor(v[CAST(j AS INT)] * 10000) AS BIGINT))
                     / (count(*) * 10000.0) * 10000) / 10000 AS new_mean
        FROM a{i}, unnest(range(1, len(v) + 1)) AS u(j)
        GROUP BY 1, 2
    ), cent{i + 1} AS (
        SELECT centroid_id, list(new_mean ORDER BY dim) AS cv
        FROM m{i} GROUP BY centroid_id
    )"""
    sql += f"""
    SELECT centroid_id, dim, n_points, new_mean FROM m{iters - 1}"""
    return sql


@query("q_kmeans_converge", oracle=_kmeans_oracle())
def q_kmeans_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three full Lloyd iterations of Euclidean k-means (assign →
    re-center → repeat), exact across engines: centroids live on a
    4-dp grid (initial slices floor-quantized; every M-step mean is
    computed in exact integer ten-thousandths before one final 4-dp
    floor), squared distances are composed from sequential-fold dot
    products floored at 6 dp before each argmin, and ties break to the
    lowest centroid id — so the whole iterative trajectory, not just
    one step, is deterministic and the unrolled oracle hash-checks
    iteration 3's (centroid, dim, n_points, new_mean) table.  Extends
    the single-step pair q_centroid_assign / q_kmeans_update to the
    convergence loop that trains IVF coarse quantizers.

    Scale shape per iteration: broadcast the k×64 centroid table,
    map-side argmin per point (partial-agg min, no window), posexplode
    to (centroid, dim) integer components, ONE partial-agg shuffle of
    k×64 groups; the centroid rebuild aggregates k rows.  Iterations
    chain lazily — Catalyst sees one DAG, and at 100 TB each
    iteration is one scan + one tiny shuffle (or the loop
    localCheckpoints per round to cut lineage)."""
    apply_runtime_conf(spark)
    # 4-dp-grid domain filter — the oracle's `grid` predicate: one
    # abs() comparison excludes NaN/±inf (they order above the limit
    # in both engines) and huge-finite components alike (extremes r11)
    emb = load_table(spark, sf_dir, "embeddings").where(
        similarity.vector_on_grid(F.col("embedding"))
    )
    # fan_out (r14): the one-row-group source runs the grid filter +
    # per-iteration distance folds on a single scan task, and the
    # unrolled loop re-derives `pts` six times (scored + re-center
    # join, x3 iterations) — spread once, before the fold work
    pts = fan_out(
        emb.filter(F.col("vec_id") >= 8).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    # ‖v‖² hoisted to one fold per POINT (r14): inside the pair
    # projection the self-dot re-ran per (point, centroid) — 8x per
    # point per iteration (sqdist_rounded_prenormed's contract)
    pts = pts.withColumn("aa", similarity.dot(F.col("v"), F.col("v")))
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 10000) / 10000,
        ).alias("cv"),
    )
    cent_tab = None
    for _ in range(3):
        d2 = similarity.sqdist_rounded_prenormed(
            F.col("aa"), F.col("v"), F.col("cv"), F.col("bb"), 6
        )
        scored = pts.crossJoin(
            # ‖c‖² likewise once per CENTROID row inside the broadcast
            F.broadcast(
                cents.withColumn(
                    "bb", similarity.dot(F.col("cv"), F.col("cv"))
                )
            )
        ).select("vec_id", "centroid_id", d2.alias("d2"))
        best = scored.groupBy("vec_id").agg(
            F.min(F.struct("d2", "centroid_id")).alias("m")
        )
        assigned = best.select(
            "vec_id", F.col("m.centroid_id").alias("centroid_id")
        ).join(pts, "vec_id")
        comp = assigned.select(
            "centroid_id", F.posexplode("v").alias("dim", "x")
        ).select(
            "centroid_id",
            F.col("dim").cast("int").alias("dim"),
            F.floor(F.col("x") * 10000).cast("bigint").alias("q"),
        )
        n = F.count("*")
        cent_tab = comp.groupBy("centroid_id", "dim").agg(
            n.cast("bigint").alias("n_points"),
            fround(F.sum("q") / (n * 10000.0), 4).alias("new_mean"),
        )
        cents = cent_tab.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "new_mean"))),
                lambda s: s["new_mean"],
            ).alias("cv")
        )
    return cent_tab


@query(
    "q_hash_embed",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS tok
        FROM documents
    ), b AS (
        SELECT doc_id,
               (((list_sum(list_transform(string_split(tok, ''), c -> ascii(c)))
                  % 2147483647)
                 * 2654435761 + length(tok) * 1000003) % 4294967296) % 16
                   AS bucket
        FROM toks WHERE tok <> ''
    ), counts AS (
        SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2
    ), dense AS (
        SELECT d.doc_id, g.bucket, coalesce(counts.c, 0) AS c
        FROM (SELECT DISTINCT doc_id FROM b) d
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bucket) g
        LEFT JOIN counts ON counts.doc_id = d.doc_id
                        AND counts.bucket = g.bucket
    ), normed AS (
        SELECT doc_id, bucket, c,
               sqrt(sum(c * c) OVER (PARTITION BY doc_id)) AS l2
        FROM dense
    )
    SELECT doc_id,
           floor(l2 * 1000000) / 1000000 AS l2_norm,
           string_agg(
               CAST(CAST(floor(c / l2 * 1000000) AS BIGINT) AS VARCHAR),
               ',' ORDER BY bucket) AS vec
    FROM normed
    GROUP BY doc_id, l2
    """,
)
def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings (the hashing-trick
    vectorizer): every token hashes into one of 16 buckets with the
    engine-portable multiplicative hash, bucket counts become a dense
    vector, and L2 normalization yields a cheap unit embedding — the
    classic no-model stand-in for learned embeddings that corpus
    pipelines use for clustering/dedup triage when GPU embedding of
    100 TB is too expensive.  Collisions are the accepted trade
    (Weinberger et al.'s hashing trick).

    Exactness chain: bucket counts are exact integers; ‖v‖² is an
    exact integer sum; sqrt and division are IEEE-correctly-rounded
    on identical inputs; components floor to exact integer MICROS
    (x·10⁶) in the output string — integer rendering is the only
    double→string path both engines spell identically.

    Scale shape: explode → ONE partial-agg shuffle keyed by
    (doc, bucket) → per-doc windowless rollup via a second doc-keyed
    aggregation; the dense 16-bucket frame is a generated tiny
    dimension (broadcast).  No Python anywhere.  The interpreted
    per-char fold hashes DISTINCT (doc, token) pairs (r14): token
    multiplicities aggregate first in a cheap partial-agg shuffle,
    and fan_out spreads the tokenize explode that a one-row-group
    source would run on a single task."""
    apply_runtime_conf(spark)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("m"))
    code_sum = F.aggregate(
        F.transform(F.split(F.col("tok"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    # pre-reduce mod 2^31-1 before the multiply (int64-overflow guard
    # for high-codepoint megatokens; mirrored in the oracle) and cast
    # length to long (INT*INT wraps past ~2147-char tokens)
    bucket = (
        (
            (code_sum % 2147483647) * 2654435761
            + F.length("tok").cast("long") * 1000003
        )
        % 4294967296
    ) % 16
    counts = (
        tc.select("doc_id", bucket.alias("bucket"), "m")
        .groupBy("doc_id", "bucket")
        .agg(F.sum("m").alias("c"))
    )
    grid = spark.range(16).select(F.col("id").cast("long").alias("bucket"))
    dense = (
        counts.select("doc_id")
        .distinct()
        .crossJoin(F.broadcast(grid))
        .join(counts, ["doc_id", "bucket"], "left")
        .select("doc_id", "bucket", F.coalesce("c", F.lit(0)).alias("c"))
    )
    per = dense.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("l2"),
        F.array_sort(F.collect_list(F.struct("bucket", "c"))).alias("parts"),
    )
    # components render as exact integer MICROS (floor(c/l2*1e6) as
    # bigint) — double-to-string rendering diverges across engines for
    # |x| < 1e-3 (Spark '5.0E-4' vs DuckDB '0.0005'; code-review r6),
    # and integers have exactly one spelling in both
    comp = F.transform(
        F.col("parts"),
        lambda s: F.floor(s["c"] / F.col("l2") * 1000000).cast("long"),
    )
    return per.select(
        "doc_id",
        fround(F.col("l2"), 6).alias("l2_norm"),
        F.array_join(F.transform(comp, lambda x: x.cast("string")), ",").alias(
            "vec"
        ),
    )


@query(
    "q_ann_recall_eval",
    oracle="""
    WITH c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8
    ), q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id >= 8 AND vec_id < 18
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 18
    ), cells AS (
        SELECT vec_id, centroid_id FROM (
            SELECT p.vec_id, c.centroid_id,
                   floor(list_dot_product(v, cv) /
                         (sqrt(list_dot_product(v, v)) *
                          sqrt(list_dot_product(cv, cv))) * 1000000) / 1000000
                       AS cos_sim,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY floor(list_dot_product(v, cv) /
                                      (sqrt(list_dot_product(v, v)) *
                                       sqrt(list_dot_product(cv, cv)))
                                      * 1000000) / 1000000 DESC, c.centroid_id
                   ) AS rn
            FROM p, c)
        WHERE rn = 1
    ), qcells AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY floor(list_dot_product(qv, cv) /
                                      (sqrt(list_dot_product(qv, qv)) *
                                       sqrt(list_dot_product(cv, cv)))
                                      * 1000000) / 1000000 DESC, c.centroid_id
                   ) AS rn
            FROM q, c)
        WHERE rn <= 2
    ), scored AS (
        SELECT q.query_id, p.vec_id, cells.centroid_id,
               floor(list_dot_product(qv, v) /
                     (sqrt(list_dot_product(qv, qv)) *
                      sqrt(list_dot_product(v, v))) * 1000000) / 1000000
                   AS cos_sim
        FROM q, p JOIN cells ON p.vec_id = cells.vec_id
    ), exact_top AS (
        SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rn
            FROM scored)
        WHERE rn <= 10
    ), ivf_top AS (
        SELECT query_id, vec_id FROM (
            SELECT s.*, row_number() OVER (
                PARTITION BY s.query_id ORDER BY s.cos_sim DESC, s.vec_id
            ) AS rn
            FROM scored s JOIN qcells
              ON s.query_id = qcells.query_id
             AND s.centroid_id = qcells.centroid_id)
        WHERE rn <= 10
    )
    SELECT e.query_id,
           CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           floor(count(i.vec_id) / 10.0 * 1000000) / 1000000 AS recall_at_10
    FROM exact_top e
    LEFT JOIN ivf_top i
      ON e.query_id = i.query_id AND e.vec_id = i.vec_id
    GROUP BY e.query_id
    """,
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index QA as a first-class query: recall@10 of the
    deterministic IVF path (8 fixed coarse cells, probe the 2 nearest)
    against the exact brute-force top-10, per query point — the
    evaluation every production ANN deployment runs before trusting an
    approximate index, and the graded complement to the rows-only
    q_sim_topk_ivf family (whose trained-quantizer recall is pinned
    only in pytest).  Ten held-out query vectors; everything —
    cell assignment, probe choice, both top-10s — floors cosine at
    6 dp with id tie-breaks, so both engines replay the identical
    index and the recall table hash-matches.

    Scale shape: centroids and the 10 queries broadcast; the exact
    baseline is the eval's deliberate O(|queries| × n) cost on a
    SAMPLE of queries (standard practice — you never brute-force the
    full workload); the IVF side reuses the same scored pairs
    restricted by the probed-cell equi-join.  Top-10s are per-query
    partial heaps, never global sorts."""
    apply_runtime_conf(spark)
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 18)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pts = emb.filter(F.col("vec_id") >= 18).select("vec_id", "embedding")

    def argtop(df, part, order_col, tie, n, keep):
        w = Window.partitionBy(part).orderBy(F.col(order_col).desc(), F.col(tie))
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select(*keep)
        )

    cell_scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        similarity.cosine_rounded(F.col("embedding"), F.col("cv"), 6).alias(
            "cos_sim"
        ),
    )
    cells = argtop(
        cell_scored, "vec_id", "cos_sim", "centroid_id", 1,
        ["vec_id", "centroid_id"],
    )
    q_scored = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        similarity.cosine_rounded(F.col("qv"), F.col("cv"), 6).alias("cos_sim"),
    )
    qcells = argtop(
        q_scored, "query_id", "cos_sim", "centroid_id", 2,
        ["query_id", "centroid_id"],
    )
    scored = (
        pts.join(cells, "vec_id")
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "vec_id",
            "centroid_id",
            similarity.cosine_rounded(
                F.col("qv"), F.col("embedding"), 6
            ).alias("cos_sim"),
        )
    )
    exact_top = argtop(
        scored, "query_id", "cos_sim", "vec_id", 10, ["query_id", "vec_id"]
    )
    ivf_top = argtop(
        scored.join(F.broadcast(qcells), ["query_id", "centroid_id"]),
        "query_id", "cos_sim", "vec_id", 10, ["query_id", "vec_id"],
    )
    joined = exact_top.join(
        ivf_top.select(
            F.col("query_id").alias("iq"), F.col("vec_id").alias("iv")
        ),
        (F.col("query_id") == F.col("iq")) & (F.col("vec_id") == F.col("iv")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("iv").cast("bigint").alias("n_hits"),
        fround(F.count("iv") / 10.0, 6).alias("recall_at_10"),
    )


# portable hash family — moved to functions/portable.py in round 5 so
# llm/dedup.py can band on the same family without an import cycle
# (VERDICT r4 #2); these aliases keep the many in-module uses unchanged
_portable_string_hash = portable_string_hash
_MH_P = MH_P
_MH_A = MH_A
_MH_B = MH_B


def _minhash_oracle() -> str:
    hcols = minhash_signature_sql("x")
    band_case = (
        f"CASE b.band_idx WHEN 0 THEN h0 * {_MH_P} + h1 "
        f"WHEN 1 THEN h2 * {_MH_P} + h3 "
        f"WHEN 2 THEN h4 * {_MH_P} + h5 "
        f"ELSE h6 * {_MH_P} + h7 END"
    )
    eq_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ts) - 2, 1) + 1),
                   i -> array_to_string(ts[i:i+2], ' ')
               ))) AS shingle
        FROM t
    ), fp AS (
        SELECT doc_id,
               {portable_string_hash_sql('shingle')} AS x
        FROM sh
    ), sig AS (
        SELECT doc_id, {hcols} FROM fp GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band_idx, {band_case} AS band_val
        FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c
          ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b, ({eq_sum}) / 8.0 AS est_sim
    FROM pairs
    JOIN sig sa ON sa.doc_id = id_a
    JOIN sig sb ON sb.doc_id = id_b
    """


# headline ADDITION (optimization r15): the portable-hash dedup hot
# path (fan_out + banded LSH) — heavy-tail coverage for the bench.
@query("q_dedup_minhash_portable", headline=True, oracle=_minhash_oracle())
def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-duplicate candidates, HASH-GRADED: the
    graded answer to the rows-only q_dedup_near family.  The usual
    obstacle — MinHash is only deterministic within one engine's hash
    function — disappears by building the whole stack from the
    engine-portable family: shingle fingerprints are position-weighted
    code-point sums mod the Mersenne prime 2³¹−1, the 8 MinHash
    permutations are fixed-literal universal hashes (aᵢ·x + bᵢ) mod p,
    and the 4×2 banding key packs two signature components into one
    63-bit integer.  Both engines therefore derive the IDENTICAL
    signatures, candidate pairs, and estimated similarities
    (n_equal/8 — exact eighths, no float drift).  The xxhash64-based
    q_dedup_near remains the production path (stronger hash); this id
    grades the full LSH MECHANISM — fingerprint → signature → band →
    candidate join — end to end.

    Scale shape: identical to q_dedup_near — per-doc distinct shingles
    explode map-side, signatures collapse via partial-agg min (8
    integer columns, never the shingle strings), and candidate
    generation is an equi-join keyed on (band_idx, band_value); cost
    rides the collision tail, never |docs|².  fan_out first (r14):
    the interpreted portable-hash fold is the dominant compute and a
    one-row-group source would run it on a single task."""
    apply_runtime_conf(spark)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n=3)).alias("shingle")
    )
    fp = sh.select("doc_id", _portable_string_hash("shingle").alias("x"))
    sig = fp.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % _MH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_idx"),
                (F.col(f"h{2 * b}") * _MH_P + F.col(f"h{2 * b + 1}")).alias(
                    "band_val"
                ),
            )
            for b in range(4)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_val"
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("c"),
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)]
    )
    n_eq = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (n_eq / 8.0).alias("est_sim"))
    )


@query(
    "q_dp_count",
    oracle="""
    WITH g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ), u AS (
        SELECT event_type, n,
               (((CAST(list_sum(list_transform(
                     range(1, length(event_type) + 1),
                     j -> ascii(event_type[CAST(j AS INT)])
                          * (((j * 2654435761) + 40503) % 65536)))
                 AS BIGINT) % 2147483647)
                 * 2654435761) % 4294967296 + 0.5) / 4294967296.0
                   AS draw
        FROM g
    )
    SELECT event_type, n,
           floor((n + CASE WHEN draw >= 0.5
                           THEN -1.0 * ln(1 - 2 * (draw - 0.5))
                           ELSE  1.0 * ln(1 - 2 * (0.5 - draw)) END)
                 * 10000) / 10000 AS noisy_count
    FROM u
    """,
)
def q_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-shaped count release: per-group counts
    plus Laplace(1/ε) noise (ε = 1) drawn by inverse CDF —
    z = −sign(v)·ln(1 − 2|v|)·(1/ε) for v = u − ½ — the mechanism a
    pipeline uses to publish statistics about a private corpus.
    HONESTY NOTE: the uniform draw here is a deterministic portable
    hash of the group key so both engines replay the identical
    release and the oracle can hash-grade the MECHANISM (inverse-CDF
    transform, sensitivity-1 count shape); a production release draws
    fresh randomness per query — determinism is a grading harness
    property, not a DP property.

    Scale shape: one partial-agg shuffle for the counts; the noise is
    a scalar expression per surviving group.  ln on exact rational
    inputs + 4-dp floor (q_word_entropy libm policy)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    # draw from the pre-modulus weighted sum (the oracle mirrors this)
    code_weighted = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length("event_type")),
            lambda jj: F.ascii(F.col("event_type").substr(jj, F.lit(1))).cast(
                "long"
            )
            * ((jj.cast("long") * 2654435761 + 40503) % 65536),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    # pre-reduce mod 2^31-1 before the multiply (int64-overflow guard —
    # identity for the bounded event_type enum, mirrored in the oracle)
    draw = (
        ((code_weighted % 2147483647) * 2654435761) % 4294967296 + 0.5
    ) / 4294967296.0
    v = draw - 0.5
    z = F.when(v >= 0, -1.0 * F.log(1 - 2 * v)).otherwise(
        1.0 * F.log(1 - 2 * (-v))
    )
    return g.select(
        "event_type", "n", fround(F.col("n") + z, 4).alias("noisy_count")
    )


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"sum(m * (((x >> {k}) & 1) * 2 - 1)) AS v{k}" for k in range(32)
    )
    sigexpr = " + ".join(
        f"(CASE WHEN v{k} >= 0 THEN 1 ELSE 0 END) * {1 << k}" for k in range(32)
    )
    blockcase = (
        "CASE b.i WHEN 0 THEN sh & 255 WHEN 1 THEN (sh >> 8) & 255 "
        "WHEN 2 THEN (sh >> 16) & 255 ELSE sh >> 24 END"
    )
    return rf"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS tok
        FROM documents
    ), tc AS (
        SELECT doc_id, tok, count(*) AS m
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), fx AS (
        SELECT doc_id, m,
               {portable_string_hash_sql('tok')} AS x
        FROM tc
    ), v AS (
        SELECT doc_id, {votes} FROM fx GROUP BY doc_id
    ), sig AS (
        SELECT doc_id, CAST({sigexpr} AS BIGINT) AS sh FROM v
    ), blocks AS (
        SELECT doc_id, sh, b.i AS block_idx, {blockcase} AS block_val
        FROM sig, (SELECT unnest(range(0, 4)) AS i) b
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, c.sh)) AS BIGINT) AS hamming
    FROM blocks a JOIN blocks c
      ON a.block_idx = c.block_idx AND a.block_val = c.block_val
     AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.sh, c.sh)) <= 3
    """


@query("q_dedup_simhash_portable", oracle=_simhash_oracle())
def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate candidates, HASH-GRADED — the graded
    mechanism twin of the rows-only q_dedup_simhash (whose xxhash64
    bit-votes are engine-specific).  Token fingerprints come from the
    portable position-weighted code-point hash; each signature bit is
    the sign of the count-weighted bit vote.  HONEST WIDTH NOTE
    (code-review r6): the portable fingerprint is mod 2³¹−1, so bit
    31 of every fingerprint is 0, its vote is always negative, and
    the effective signature is 31 BITS — block 3 of the four 8-bit
    pigeonhole chunks carries 7 informative bits, making its
    collisions ~2× the idealized 32-bit design's (a denser candidate
    set, never a missed pair).  The completeness guarantee is
    unaffected: constant bits never differ, so Hamming distances are
    exact and a pair within Hamming ≤ 3 still differs in at most 3
    chunks and MUST share one — the emitted set remains exactly the
    complete ≤3-Hamming pair set; hamming distances come out of
    bit_count(xor) in both engines.  (The production q_dedup_simhash
    twin votes on full 64-bit xxhash fingerprints and has no such
    width quirk.)  The homogeneous
    synthetic corpus yields a dense candidate set — the grade is the
    mechanism (fingerprint → votes → signature → pigeonhole block →
    verify), not corpus selectivity.

    Scale shape: identical to q_dedup_simhash — token counts collapse
    via partial agg, 32 integer vote sums per doc (pure codegen, no
    Python — the xxhash twin needs its one pandas_udf; this one
    doesn't), candidate generation is an equi-join keyed by
    (block_idx, block_val), verification is one xor/popcount per
    candidate."""
    apply_runtime_conf(spark)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("m"))
    fx = tc.select("doc_id", "m", _portable_string_hash("tok").alias("x"))
    votes = fx.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("m")
                * (F.shiftright(F.col("x"), k).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"v{k}")
            for k in range(32)
        ]
    )
    sig_val = sum(
        (F.col(f"v{k}") >= 0).cast("long") * (1 << k) for k in range(32)
    )
    sig = votes.select("doc_id", sig_val.alias("sh"))
    blocks = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("block_idx"),
                        (
                            F.shiftright(F.col("sh"), 8 * i).bitwiseAND(
                                F.lit(255)
                            )
                            if i < 3
                            else F.shiftright(F.col("sh"), 24)
                        ).alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sh", "b.block_idx", "b.block_val")
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"),
        "block_idx", "block_val",
    )
    c = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"),
        "block_idx", "block_val",
    )
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    # explicit-width repartition of both block-join sides (r14, the
    # q_knn_classify_ivf lesson, guide §2.5): the exchanges feeding the
    # join carry ~2 MB, so AQE's byte-based coalescing folded them to
    # ONE post-shuffle partition — and the dense candidate explosion
    # (invisible to AQE, which only sees exchange input bytes) plus the
    # xor/popcount verify ran single-threaded (measured: 1.4 s one-task
    # final stage).  User-specified N is exempt from AQE coalescing.
    width = spark.sparkContext.defaultParallelism
    return (
        a.repartition(width, "block_idx", "block_val")
        .join(
            c.repartition(width, "block_idx", "block_val"),
            ["block_idx", "block_val"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming <= 3)
        .select("id_a", "id_b", hamming.cast("bigint").alias("hamming"))
        .distinct()
    )


def _embed_lsh_oracle() -> str:
    from etl_caltopo_spark.llm.similarity import _hyperplane

    planes = _hyperplane(8, 64)
    lits = [
        "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lits[i]}) >= 0 THEN {1 << i} "
        f"ELSE 0 END)"
        for i in range(8)
    )
    cos = (
        "floor(list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        " * 1000000) / 1000000"
    )
    from etl_caltopo_spark.llm.similarity import sql_vector_finite

    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE {sql_vector_finite("embedding")}
    ), bucketed AS (
        SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
           {cos} AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.3
    """


@query("q_embed_lsh_portable", oracle=_embed_lsh_oracle())
def q_embed_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dup pairs, HASH-GRADED — the
    graded mechanism twin of the rows-only q_dedup_embed_lsh.  The
    engine's hyperplanes were ALREADY deterministic (splitmix64-style
    scramble, similarity._hyperplane — no RNG state); what makes the
    grade possible is that the oracle embeds the IDENTICAL plane
    coefficients as SQL literals (exact repr round-trip) and both
    engines fold the sign dot products in the same sequential order,
    so every bucket bit is bit-identical — the sign comparison needs
    no floor because its operands are equal doubles, while the
    verification cosine floors at 6 dp as usual.  Completes the
    graded-LSH trifecta (MinHash, SimHash, hyperplane).

    Scale shape: bucket assignment is map-only codegen (8 literal
    planes → 256 buckets, under similarity._LITERAL_PLANE_BUDGET, so
    the within-bucket quadratic is cut 256-fold vs unblocked — the
    recall/cost dial is the plane count, measured at 10× in
    SCALING.md); candidate
    generation is an equi-join on the bucket id; exact cosine runs
    only within buckets — the same plan q_dedup_embed_lsh ships,
    now with its outputs hash-checked."""
    apply_runtime_conf(spark)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        # NULL vectors have no bucket (r8 NULL policy); non-finite
        # ones have no portable geometry (extremes r11)
        .where(similarity.vector_finite(F.col("embedding")))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    bucketed = similarity.attach_bucket(
        emb, vec_col="v", n_planes=8, dim=64, out_col="bucket"
    ).select("vec_id", "v", F.col("bucket").cast("bigint").alias("bucket"))
    # within-bucket pairs via per-block chunked BLAS (r10 — same
    # hash-identical fast/band value contract as q_dedup_embed; the
    # expression-form twin is pinned frame-equal in test_llm_ops.py)
    return similarity.near_pairs_within_blocks(
        bucketed, "bucket", 0.3, vec_col="v", emit_block=True
    ).select("id_a", "id_b", "bucket", "cos_sim")


@query(
    "q_hll_portable",
    oracle="""
    WITH h AS (
        SELECT DISTINCT
               ((((user_id % 2147483648) * 1000003) % 2147483648)
                * 2654435761) % 4294967296 AS hv
        FROM events
    ), r AS (
        SELECT hv >> 28 AS bucket, hv & 268435455 AS w FROM h
    ), regs AS (
        SELECT bucket,
               max(CASE WHEN w = 0 THEN 29
                        ELSE 28 - CAST(floor(log2(w)) AS INT) END) AS mx
        FROM r GROUP BY bucket
    ), agg AS (
        SELECT sum(pow(2.0, -mx)) AS s, count(*) AS nz FROM regs
    )
    SELECT CAST(regs.bucket AS BIGINT) AS bucket,
           CAST(regs.mx AS BIGINT) AS max_rank,
           floor(CASE WHEN (0.673 * 256 / (s + 16 - nz)) <= 40 AND nz < 16
                      THEN 16 * ln(16.0 / (16 - nz))
                      ELSE 0.673 * 256 / (s + 16 - nz) END * 10000) / 10000 AS estimate
    FROM regs, agg
    """,
)
def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, HASH-GRADED — the graded
    mechanism twin of the rows-only q_agg_approx / q_hll_mergeable
    (whose engine sketches are incomparable): m = 16 registers over
    the portable multiplicative hash of user_id, register rank =
    leading-zero count of the low 28 bits + 1, harmonic-mean estimate
    with the standard small-range (linear-counting) correction.  The
    whole register TABLE hash-matches across engines — not just the
    scalar — because the register sum Σ2^−mx is a sum of dyadic
    rationals (exact in double regardless of order), log2 is exact at
    the only integer boundaries (powers of two), and the estimate
    floors at 4 dp.  Estimate quality (±1.04/√m ≈ 26% at m = 16) is
    pinned against the true count in tests.

    Scale shape: THE mergeable-sketch pattern — map-side partial max
    per register, one 16-group shuffle, no distinct-set
    materialization beyond the initial hash dedup (which at 100 TB
    is itself replaced by feeding raw values straight into the
    register max, the standard HLL property that duplicates are
    absorbed by max())."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    # id pre-reduced mod 2^31 before the Knuth multiply — identical hv,
    # no int64 overflow at snowflake-scale ids (bigids r14, #35)
    hv = (
        (((F.col("user_id") % 2147483648) * 1000003) % 2147483648)
        * 2654435761
        % 4294967296
    )
    h = ev.select(hv.alias("hv")).distinct()
    r = h.select(
        F.shiftright("hv", 28).alias("bucket"),
        F.col("hv").bitwiseAND(F.lit(268435455)).alias("w"),
    )
    rank = F.when(F.col("w") == 0, F.lit(29)).otherwise(
        28 - F.floor(F.log2("w")).cast("int")
    )
    regs = r.groupBy("bucket").agg(F.max(rank).alias("mx"))
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count("*").alias("nz"),
    )
    # empty registers contribute 2^0 = 1 each (sparse-correct HLL)
    raw = 0.673 * 256 / (F.col("s") + 16 - F.col("nz"))
    est = F.when(
        (raw <= 40) & (F.col("nz") < 16),
        16 * F.log(16.0 / (16 - F.col("nz"))),
    ).otherwise(raw)
    return regs.crossJoin(F.broadcast(agg)).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("mx").cast("bigint").alias("max_rank"),
        fround(est, 4).alias("estimate"),
    )


@query(
    "q_cms_portable",
    oracle=rf"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ), fx AS (
        SELECT tok,
               {portable_string_hash_sql('tok')} AS x
        FROM toks WHERE tok <> ''
    ), cells AS (
        SELECT r.i AS row_idx,
               ((CASE r.i WHEN 0 THEN 131 WHEN 1 THEN 1031
                          WHEN 2 THEN 8101 ELSE 65537 END * x
                 + CASE r.i WHEN 0 THEN 7 WHEN 1 THEN 911
                            WHEN 2 THEN 5021 ELSE 30011 END)
                % 2147483647) % 64 AS col_idx,
               count(*) AS c
        FROM fx, (SELECT unnest(range(0, 4)) AS i) r
        GROUP BY 1, 2
    ), truth AS (
        SELECT tok, x, count(*) AS n FROM fx GROUP BY tok, x
        ORDER BY n DESC, tok LIMIT 10
    )
    SELECT truth.tok, CAST(truth.n AS BIGINT) AS true_count,
           CAST(min(cells.c) AS BIGINT) AS cms_estimate
    FROM truth JOIN cells
      ON cells.col_idx = ((CASE cells.row_idx
                               WHEN 0 THEN 131 WHEN 1 THEN 1031
                               WHEN 2 THEN 8101 ELSE 65537 END * truth.x
                           + CASE cells.row_idx
                                 WHEN 0 THEN 7 WHEN 1 THEN 911
                                 WHEN 2 THEN 5021 ELSE 30011 END)
                          % 2147483647) % 64
    GROUP BY truth.tok, truth.n
    """,
)
def q_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, HASH-GRADED: a 4×64 counter table over the
    portable hash family summarizes corpus token frequencies in 256
    integers; point queries (here: the top-10 true-frequency tokens)
    read the min over the 4 hashed cells — the classic streaming
    heavy-hitter sketch whose one-sided error (estimate ≥ truth,
    overshoot ≤ εN with ε = e/w) the oracle can check exactly because
    every counter is an exact integer under the shared hash family.
    Output carries both the true and sketched counts, so the grade
    pins the overestimate structure itself.

    Scale shape: the sketch build is one explode + a 256-group
    partial-agg shuffle (the mergeable-sketch pattern: per-partition
    sketches sum cell-wise); point queries join the tiny cell table
    by computed cell id.  At 100 TB the counter table is still 256
    longs.  The interpreted portable hash runs over DISTINCT tokens
    (r14): token frequencies aggregate FIRST (a cheap string shuffle
    with partial agg), then each vocabulary entry is hashed once and
    cell counts sum the pre-counted frequencies — hash cost |vocab|,
    not |occurrences|, and fan_out spreads the tokenize explode that
    a one-row-group source would run on a single task."""
    apply_runtime_conf(spark)
    A = (131, 1031, 8101, 65537)
    B = (7, 911, 5021, 30011)
    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    toks = docs.select(
        F.explode(text.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("tok").agg(F.count("*").alias("n"))
    fx = tf.select("tok", "n", _portable_string_hash("tok").alias("x"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row_idx"),
                (((F.lit(a) * F.col("x") + F.lit(b)) % 2147483647) % 64).alias(
                    "col_idx"
                ),
            )
            for i, (a, b) in enumerate(zip(A, B))
        ]
    )
    cells = (
        fx.select("n", F.explode(rows).alias("r"))
        .select("n", "r.row_idx", "r.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("n").alias("c"))
    )
    truth = fx.orderBy(F.col("n").desc(), "tok").limit(10)
    probes = truth.select(
        "tok", "n", F.explode(rows).alias("r")
    ).select("tok", "n", "r.row_idx", "r.col_idx")
    return (
        probes.join(F.broadcast(cells), ["row_idx", "col_idx"])
        .groupBy("tok", "n")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
        .select(
            "tok",
            F.col("n").cast("bigint").alias("true_count"),
            "cms_estimate",
        )
    )


@query(
    "q_bloom_portable",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents WHERE text IS NOT NULL
    ), sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ts) - 3, 1) + 1),
                   i -> array_to_string(ts[i:i+3], ' ')
               ))) AS shingle
        FROM t
    ), fx AS (
        SELECT doc_id, source, shingle,
               {portable_string_hash_sql('shingle')} AS x
        FROM sh
    ), bits AS (
        SELECT DISTINCT
               ((CASE r.i WHEN 0 THEN 131 WHEN 1 THEN 1031
                          WHEN 2 THEN 8101 ELSE 65537 END * x
                 + CASE r.i WHEN 0 THEN 7 WHEN 1 THEN 911
                            WHEN 2 THEN 5021 ELSE 30011 END)
                % 2147483647) % 4096 AS pos
        FROM fx, (SELECT unnest(range(0, 4)) AS i) r
        WHERE source = 'src0'
    ), probe AS (
        SELECT doc_id, shingle, r.i AS k,
               ((CASE r.i WHEN 0 THEN 131 WHEN 1 THEN 1031
                          WHEN 2 THEN 8101 ELSE 65537 END * x
                 + CASE r.i WHEN 0 THEN 7 WHEN 1 THEN 911
                            WHEN 2 THEN 5021 ELSE 30011 END)
                % 2147483647) % 4096 AS pos
        FROM fx, (SELECT unnest(range(0, 4)) AS i) r
        WHERE source <> 'src0'
    ), pass AS (
        SELECT probe.doc_id, probe.shingle,
               CASE WHEN count(bits.pos) = 4 THEN 1 ELSE 0 END AS bloom_hit
        FROM probe LEFT JOIN bits ON probe.pos = bits.pos
        GROUP BY probe.doc_id, probe.shingle
    ), exact AS (
        SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
    )
    SELECT pass.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(sum(CASE WHEN exact.shingle IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_true_hits
    FROM pass LEFT JOIN exact ON pass.shingle = exact.shingle
    GROUP BY pass.doc_id
    """,
)
def q_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination prefilter, HASH-GRADED: the
    benchmark side's ('src0') distinct 4-token shingles populate a
    4096-bit / 4-hash Bloom filter under the portable hash family;
    every training-side shingle probes it, and the per-document
    output carries probed shingles, Bloom hits, and exact hits — so
    the oracle pins the filter's one-sided guarantee structurally
    (bloom_hits ≥ true_hits, never a false negative) INCLUDING the
    exact false-positive cells, not just a rate.  This is the cheap
    first pass in front of the exact inverted-index join of
    q_decontaminate: at 100 TB the 4096-bit filter broadcasts to
    every executor and eliminates the shuffle for the overwhelming
    non-matching majority.

    Scale shape: filter build aggregates to ≤4096 distinct positions
    (broadcast); probes are map-side against the broadcast position
    set; the per-(doc, shingle) all-4-positions check collapses via
    partial aggregation on the doc key."""
    apply_runtime_conf(spark)
    A = (131, 1031, 8101, 65537)
    B = (7, 911, 5021, 30011)
    # NULL documents have no shingles: dropped on both sides (r8
    # NULL-injection policy; the engines disagree on how list
    # functions degrade over NULL).  fan_out before the shingle
    # explode: the interpreted portable-hash fold downstream is
    # compute-bound and a one-row-group source would run it on a
    # single task (r14).
    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
    )
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(dedup.shingles(F.col("text"), n=4)).alias("shingle"),
    )
    # fx pinned (r14, knowledge #16): the Bloom build, the probe side
    # and the exact-hit index all consume the shingle explode + the
    # interpreted portable-hash fold — unpinned, the fold ran once per
    # consumer (measured: two extra 32-task stages, 6.0 + 3.3 s CPU)
    from etl_caltopo_spark.operators.rank import pin_frame as _pin_fx

    fx = _pin_fx(
        sh.select(
            "doc_id",
            "source",
            "shingle",
            _portable_string_hash("shingle").alias("x"),
        )
    )
    poss = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("k"),
                (((F.lit(a) * F.col("x") + F.lit(b)) % 2147483647) % 4096).alias(
                    "pos"
                ),
            )
            for i, (a, b) in enumerate(zip(A, B))
        ]
    )
    bits = (
        fx.filter(F.col("source") == "src0")
        .select(F.explode(poss).alias("r"))
        .select("r.pos")
        .distinct()
    )
    probe = (
        fx.filter(F.col("source") != "src0")
        .select("doc_id", "shingle", F.explode(poss).alias("r"))
        .select("doc_id", "shingle", "r.pos")
    )
    passed = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id", "shingle")
        .agg((F.count("hit") == 4).cast("int").alias("bloom_hit"))
    )
    exact = (
        fx.filter(F.col("source") == "src0")
        .select("shingle")
        .distinct()
        .withColumn("true_hit", F.lit(1))
    )
    return (
        passed.join(F.broadcast(exact), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum("bloom_hit").cast("bigint").alias("n_bloom_hits"),
            F.count("true_hit").cast("bigint").alias("n_true_hits"),
        )
    )


@query(
    "q_auc",
    oracle="""
    WITH scored AS (
        SELECT value AS score,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ), ranked AS (
        SELECT y, rank() OVER (ORDER BY score) AS rmin,
               count(*) OVER (PARTITION BY score) AS nties,
               rank() OVER (ORDER BY score) + (count(*) OVER (PARTITION BY score) - 1) / 2.0 AS r
        FROM scored
    ), agg AS (
        SELECT sum(CASE WHEN y = 1 THEN r END) AS rpos,
               sum(y) AS np, count(*) - sum(y) AS nn
        FROM ranked
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           floor((rpos - np * (np + 1) / 2.0) / (np * nn) * 1000000)
               / 1000000 AS auc
    FROM agg
    """,
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the Mann-Whitney rank statistic — the standard
    classifier-quality metric a training pipeline computes over
    held-out scores (here: event value as the score, clicks as the
    positive class).  Midrank tie handling (rank + (ties−1)/2) makes
    the statistic exact, so AUC is one rational number both engines
    floor identically at 6 dp — no ROC-curve sweep, no integration
    error.

    Scale shape: rows first collapse to the DISTINCT-SCORE domain
    (one partial-agg shuffle), and the cumulative-negatives prefix
    runs through the distributed rank operator
    (operators/rank.py global_running_sum — r8: the r7 cardinality
    probe measured the distinct-score frame GROWING ~n^0.64 with the
    table, 952 -> 17,792 rows across sf0.001 -> 0.1, so the previous
    single-task window was a real scale path, not a bounded grid) via
    the U-statistic identity
    AUC = Σ_s npos_s·(cumneg_<s + nneg_s/2) / (np·nn), which equals
    the midrank formula exactly (sums of integers and halves stay
    exact in double).  The oracle keeps the textbook per-row midrank
    form, so the identity itself is what the hash check proves.  At
    100 TB q_calibration_bins is the fixed-bin sibling when even the
    score domain is unbounded."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import global_running_sum, pin_frame

    ev = load_table(spark, sf_dir, "events")
    # NULL scores are MISSING observations — dropped on both sides
    # (r8 NULL-injection sweep: a NULL rank group diverges between
    # engines because Spark orders ASC NULLS FIRST, DuckDB NULLS LAST)
    scored = ev.where(F.col("value").isNotNull()).select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("y"),
        # when/otherwise, not a bare cast: a NULL event_type must be
        # a NEGATIVE label (the oracle's CASE ... ELSE 0), while
        # (NULL == 'click').cast('int') is NULL — sum skips it where
        # count(*) keeps the row (nullkeys sweep r12)
    )
    g = scored.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("y").alias("npos")
    )
    g = pin_frame(g.withColumn("nneg", F.col("n") - F.col("npos")))
    # scores are DISTINCT after the groupBy (unique primary — no hot
    # values, no extra tiebreak); the exclusive prefix is the
    # inclusive running sum minus the row's own count
    g2 = global_running_sum(
        g, "score", [F.col("score")], "nneg", out_col="_cum_incl"
    ).select(
        "npos",
        "nneg",
        (F.col("_cum_incl") - F.col("nneg")).alias("cumneg"),
    )
    agg = g2.agg(
        F.sum(
            F.col("npos") * (F.col("cumneg") + F.col("nneg") / 2.0)
        ).alias("u"),
        F.sum("npos").alias("np"),
        F.sum("nneg").alias("nn"),
    )
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        # NULL auc for a single-class slice (np or nn = 0): ANSI Spark
        # would raise DIVIDE_BY_ZERO where DuckDB yields NULL
        # (code-review r6)
        fround(
            F.when(
                F.col("np") * F.col("nn") > 0,
                F.col("u") / (F.col("np") * F.col("nn")),
            ),
            6,
        ).alias("auc"),
    )


@query(
    "q_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT value AS score,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE value IS NULL OR isfinite(value)
    ), bounds AS (
        SELECT min(score) AS lo, max(score) AS hi FROM scored
    ), binned AS (
        SELECT CASE WHEN hi = lo THEN 0
                    ELSE least(CAST(floor((score - lo)
                         / ((hi - lo) / 10.0)) AS INT), 9) END AS bin, y
        FROM scored, bounds
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           floor(sum(y) / CAST(count(*) AS DOUBLE) * 1000000) / 1000000
               AS pos_rate
    FROM binned GROUP BY bin
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability bins: decile score buckets with the
    observed positive rate per bucket — the reliability-diagram data a
    training pipeline computes to check whether scores mean what they
    claim, and the fixed-bin shape that replaces q_auc's global sort
    at the largest scales.

    Exactness chain: the bin edge arithmetic runs on identical
    doubles in both engines (min/max are exact selections, the
    division and floor are IEEE-deterministic), counts are integers,
    and the rate is one exact division floored at 6 dp.

    Scale shape: a broadcast 1-row bounds aggregate, then ONE
    partial-agg shuffle of ≤10 groups — shuffle-free relative to data
    volume; this is the AUC-family plan that survives 100 TB.

    Non-finite scores are excluded (extremes sweep r11: a ±inf bound
    poisons every bin edge and the bin cast diverges — Spark's floor
    saturates where DuckDB's CAST raises)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(
        finite_or_null(F.col("value"))
    )
    scored = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("y"),
        # when/otherwise, not a bare cast: a NULL event_type must be
        # a NEGATIVE label (the oracle's CASE ... ELSE 0), while
        # (NULL == 'click').cast('int') is NULL — sum skips it where
        # count(*) keeps the row (nullkeys sweep r12)
    )
    bounds = scored.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    # hi == lo (all scores identical) must bin to 0, not raise ANSI
    # DIVIDE_BY_ZERO / emit a NULL bin (code-review r6) — mirrored in
    # the oracle's CASE
    binned = scored.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 10.0)
                ).cast("int"),
                F.lit(9),
            )
        )
        .alias("bin"),
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        fround(F.sum("y") / F.count("*"), 6).alias("pos_rate"),
    ).select(
        F.col("bin").cast("bigint").alias("bin"), "n", "n_pos", "pos_rate"
    )


def _morton_sql(x: str, y: str) -> str:
    return " + ".join(
        f"((({x} >> {k}) & 1) * {1 << (2 * k)})"
        f" + ((({y} >> {k}) & 1) * {1 << (2 * k + 1)})"
        for k in range(10)
    )


@query(
    "q_spatial_cell_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (((c_custkey % 18000) * 37) % 18000 - 9000) AS lat,
               (((c_custkey % 36000) * 91) % 36000 - 18000) AS lon
        FROM customer
    ), cells AS (
        SELECT id, lat, lon,
               CAST((lon + 18000) // 100 AS BIGINT) AS cx,
               CAST((lat + 9000) // 100 AS BIGINT) AS cy
        FROM pts
    ), zed AS (
        SELECT *, CAST({_morton_sql('cx', 'cy')} AS BIGINT) AS zkey FROM cells
    ), probe AS (
        SELECT id, lat, lon, cx + d.dx AS cx, cy + d.dy AS cy
        FROM zed, (SELECT a.dx, b.dy
                   FROM (SELECT unnest(range(-1, 2)) AS dx) a,
                        (SELECT unnest(range(-1, 2)) AS dy) b) d
    )
    SELECT a.id AS id_a, b.id AS id_b, a.zkey AS zkey_a,
           CAST((a.lat - b.lat) * (a.lat - b.lat)
                + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
    FROM zed a JOIN probe b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= 10000
    """,
)
def q_spatial_cell_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell spatial self-join with a Z-order locality key: find
    all customer pairs within 1° (centidegree euclidean, squared
    distance ≤ 100² — every quantity an exact integer, so the grade
    has zero float surface; the synthetic lattice's minimum spacing
    exceeds 0.5°, which is why the radius is 1°).  Each point lands
    in a 1° grid cell;
    the probe side explodes to its 3×3 cell neighbourhood so the join
    is a plain equi-join on the cell key that provably covers every
    qualifying pair (a pair within 1° can differ by at most one
    cell in each axis); the Morton/Z-order key (10-bit interleave of
    the cell coordinates, the Delta/Iceberg Z-ORDER primitive) is
    emitted per pair to pin the clustering key both engines derive.

    Scale shape: THE spatial-join pattern at 100 TB — no
    broadcast-nested-loop over geometry: one 9× map-side explode, one
    shuffle keyed by the cell, distance verification only within
    neighbourhoods.  Writing the table sorted by zkey (range
    partition on the same key) turns the neighbourhood probe into a
    near-local scan."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        # key pre-reduced mod the grid before the multiply — identical
        # values, but the raw product overflows int64 at snowflake-
        # scale ids (bigids sweep r14; HANDOFF knowledge #35)
        (((F.col("c_custkey") % 18000) * 37) % 18000 - 9000).alias("lat"),
        (((F.col("c_custkey") % 36000) * 91) % 36000 - 18000).alias("lon"),
    )
    cells = pts.select(
        "id",
        "lat",
        "lon",
        F.floor((F.col("lon") + 18000) / 100).cast("long").alias("cx"),
        F.floor((F.col("lat") + 9000) / 100).cast("long").alias("cy"),
    )
    zkey = sum(
        (F.shiftright("cx", k).bitwiseAND(F.lit(1)) * (1 << (2 * k)))
        + (F.shiftright("cy", k).bitwiseAND(F.lit(1)) * (1 << (2 * k + 1)))
        for k in range(10)
    )
    zed = cells.withColumn("zkey", zkey.cast("long"))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = zed.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.explode(offsets).alias("d"),
        "cx",
        "cy",
    ).select(
        "id_b",
        "lat_b",
        "lon_b",
        (F.col("cx") + F.col("d.dx")).alias("cx"),
        (F.col("cy") + F.col("d.dy")).alias("cy"),
    )
    dist2 = (F.col("lat") - F.col("lat_b")) * (
        F.col("lat") - F.col("lat_b")
    ) + (F.col("lon") - F.col("lon_b")) * (F.col("lon") - F.col("lon_b"))
    return (
        zed.join(probe, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .filter(dist2 <= 10000)
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.col("zkey").alias("zkey_a"),
            dist2.cast("bigint").alias("dist2"),
        )
    )


def _minhash_accuracy_oracle() -> str:
    hcols = minhash_signature_sql("x")
    band_case = (
        f"CASE b.band_idx WHEN 0 THEN h0 * {_MH_P} + h1 "
        f"WHEN 1 THEN h2 * {_MH_P} + h3 "
        f"WHEN 2 THEN h4 * {_MH_P} + h5 "
        f"ELSE h6 * {_MH_P} + h7 END"
    )
    eq_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(ts) - 2, 1) + 1),
                   i -> array_to_string(ts[i:i+2], ' ')
               ))) AS shingle
        FROM t
    ), fp AS (
        SELECT doc_id, shingle,
               {portable_string_hash_sql('shingle')} AS x
        FROM sh
    ), sig AS (
        SELECT doc_id, {hcols} FROM fp GROUP BY doc_id
    ), nsh AS (
        SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band_idx, {band_case} AS band_val
        FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c
          ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    ), overlap AS (
        SELECT p.id_a, p.id_b, count(*) AS n_common
        FROM pairs p
        JOIN fp fa ON fa.doc_id = p.id_a
        JOIN fp fb ON fb.doc_id = p.id_b AND fb.shingle = fa.shingle
        GROUP BY p.id_a, p.id_b
    ), inter AS (
        -- LEFT join: zero-overlap banded candidates (LSH false
        -- positives) must surface with exact_jaccard = 0, not vanish
        SELECT p.id_a, p.id_b, coalesce(o.n_common, 0) AS n_common
        FROM pairs p
        LEFT JOIN overlap o ON o.id_a = p.id_a AND o.id_b = p.id_b
    )
    SELECT i.id_a, i.id_b,
           ({eq_sum}) / 8.0 AS est_sim,
           floor(CAST(i.n_common AS DOUBLE)
                 / (na.n + nb.n - i.n_common) * 1000000) / 1000000
               AS exact_jaccard
    FROM inter i
    JOIN sig sa ON sa.doc_id = i.id_a
    JOIN sig sb ON sb.doc_id = i.id_b
    JOIN nsh na ON na.doc_id = i.id_a
    JOIN nsh nb ON nb.doc_id = i.id_b
    """


@query("q_minhash_accuracy", oracle=_minhash_accuracy_oracle())
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation for the portable MinHash: every
    banded candidate pair carries BOTH its signature-estimated
    similarity (n_equal/8, exact eighths) and its exact shingle-set
    Jaccard — the eval table an engineer reads before trusting an LSH
    threshold (how biased is the 8-permutation estimate, where do the
    bands start missing pairs).  The ANN analogue is
    q_ann_recall_eval; this is the dedup-side twin, and the exact
    column reuses the inverted-index join so only CANDIDATE pairs pay
    the set-intersection cost.

    Scale shape: candidate generation is the q_dedup_minhash_portable
    plan; the exact verify joins per-doc shingle sets ONLY for
    candidates (shuffle keyed by shingle then by the pair), and
    |A ∪ B| rides on the signature rows (one aggregate computes the
    8 mins AND the shingle count — r14: the separate count pass
    re-ran the whole explode, and fan_out spreads the interpreted
    portable-hash fold, which a one-row-group source otherwise runs
    on a single task).  Exact integer division floored at 6 dp."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n=3)).alias("shingle")
    )
    fp = sh.select(
        "doc_id", "shingle", _portable_string_hash("shingle").alias("x")
    )
    sig = fp.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % _MH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ],
        F.count("*").alias("n"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_idx"),
                (F.col(f"h{2 * b}") * _MH_P + F.col(f"h{2 * b + 1}")).alias(
                    "band_val"
                ),
            )
            for b in range(4)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_val"
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("c"),
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b")
        )
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("id_a"), "shingle")
    fb = fp.select(F.col("doc_id").alias("id_b"), "shingle")
    # LEFT join back onto pairs + coalesce(n_common, 0): a banded
    # candidate with ZERO shared shingles (a genuine LSH false
    # positive — fingerprint collisions make these possible) must
    # appear with exact_jaccard = 0, not vanish; dropping them
    # overstated sketch quality (code-review r6)
    overlap = (
        pairs.join(fa, "id_a")
        .join(fb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    inter = pairs.join(overlap, ["id_a", "id_b"], "left").select(
        "id_a", "id_b", F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common")
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)],
        F.col("n").alias("na"),
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)],
        F.col("n").alias("nb"),
    )
    n_eq = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (n_eq / 8.0).alias("est_sim"),
            fround(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("exact_jaccard"),
        )
    )


@query(
    "q_lm_backoff",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), big AS (
        SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ), m AS (
        SELECT doc_id, w1, w2, count(*) AS m FROM big GROUP BY 1, 2, 3
    ), c12 AS (
        SELECT w1, w2, sum(m) AS c12 FROM m GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, sum(m) AS c1 FROM m GROUP BY 1
    ), uni AS (
        SELECT w, count(*) AS cu FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents) WHERE w <> ''
        GROUP BY w
    ), tot AS (
        SELECT sum(cu) AS n FROM uni
    )
    SELECT m.doc_id,
           CAST(sum(m.m) AS BIGINT) AS n_bigrams,
           floor(sum(m.m * -(ln(c12.c12) - ln(c1.c1)))
                 / sum(m.m) * 10000) / 10000 AS score_seen,
           floor(sum(m.m * -(ln(0.4) + ln(uni.cu) - ln(tot.n)))
                 / sum(m.m) * 10000) / 10000 AS score_backoff
    FROM m
    JOIN c12 ON m.w1 = c12.w1 AND m.w2 = c12.w2
    JOIN c1 ON m.w1 = c1.w1
    JOIN uni ON m.w2 = uni.w, tot
    GROUP BY m.doc_id
    """,
)
def q_lm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram scoring (Brants et al. 2007 — the
    smoothing used for web-scale LMs where discounting is too
    expensive): alongside q_lm_score's add-one smoothing this
    completes the two standard LM-filtering baselines.  Per document,
    both score components are emitted — the seen-bigram term
    −ln(c12/c1) and the backoff term −ln(0.4·cu(w2)/N) — so a filter
    can mix them per its own α.  (On a corpus-trained model every
    document bigram is 'seen', which is why the two terms are
    reported separately instead of a CASE that never fires; a
    held-out scorer would pick per row.)

    Scale shape: identical to q_lm_score — integer count tables keyed
    by bigram/unigram, equi-joins back to per-doc counts, one log per
    surviving type, 4-dp floors on order-dependent sums."""
    apply_runtime_conf(spark)
    # fan_out (r14): the one-row-group source ran both tokenize passes
    # as ~0.9 s single-task map stages; the identical repartition
    # subtree is exchange-reused (no-op at scale)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # m pinned (r14, knowledge #16's multi-consumer rule): c12, c1 and
    # the per-doc join all consume it, and the optimizer re-ran the
    # full tokenize + bigram explode + count for each consumer
    # (measured: three identical 32-task stages writing the same 5 MB
    # exchange)
    from etl_caltopo_spark.operators.rank import pin_frame as _pin_m

    m = _pin_m(
        big.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))
    )
    c12 = m.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    c1 = m.groupBy("w1").agg(F.sum("m").alias("c1"))
    uni = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    tot = uni.agg(F.sum("cu").alias("n"))
    per = (
        m.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .join(uni.withColumnRenamed("w", "w2"), ["w2"])
        .crossJoin(F.broadcast(tot))
    )
    seen = -(F.log("c12") - F.log("c1"))
    backoff = -(
        F.log(F.lit(0.4)) + F.log("cu") - F.log("n")
    )
    return per.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_bigrams"),
        fround(F.sum(F.col("m") * seen) / F.sum("m"), 4).alias("score_seen"),
        fround(F.sum(F.col("m") * backoff) / F.sum("m"), 4).alias(
            "score_backoff"
        ),
    )


@query(
    "q_video_mjpeg",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
           CAST(6 + (doc_id % 3) * 6 AS BIGINT) AS height,
           TRUE AS decoded
    FROM documents, UNNEST(range(0, 1 + doc_id % 3)) AS u(f)
    """,
)
def q_video_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED video decode end-to-end under the oracle: the same
    deterministic gradient frame stacks as q_video_frames are encoded
    as Motion-JPEG AVI (multimodal.encode_avi_mjpeg — each '00dc'
    chunk a complete baseline JPEG from llm/jpeg.py) and decoded back
    frame-by-frame inside one Arrow-batched mapInPandas.  MJPEG is
    lossy, so the graded columns are the LOSSLESS decode outputs —
    per-frame dims, frame count, and decode success, which require the
    full RIFF walk AND every frame's entropy decode to succeed (one
    failed frame poisons the payload to a null row under the
    dirty-row policy).  Pixel fidelity (quantization-bounded error) is
    pinned in tests/test_llm_ops.py.

    Scale shape: generate → decode is map-only with no shuffle; the
    per-frame explode happens inside the Arrow batch; fan_out first so
    codec work spreads across cores."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from etl_caltopo_spark.io import fan_out
    from etl_caltopo_spark.llm import multimodal

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 + (d % 5) * 4
                h = 6 + (d % 3) * 6
                n = 1 + d % 3
                x = np.arange(w, dtype=np.uint16)[None, None, :, None]
                y = np.arange(h, dtype=np.uint16)[None, :, None, None]
                c = np.arange(3, dtype=np.uint16)[None, None, None, :]
                f = np.arange(n, dtype=np.uint16)[:, None, None, None]
                stack = (x + 2 * y + 85 * c + 9 * f).astype(np.uint8)
                payloads.append(multimodal.encode_avi_mjpeg(stack, fps=10))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "video")
    decoded = multimodal.decode_video(assets)
    return decoded.select(
        "asset_id",
        "frame_idx",
        "width",
        "height",
        F.col("width").isNotNull().alias("decoded"),
    )
