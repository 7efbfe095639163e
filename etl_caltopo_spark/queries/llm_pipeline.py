"""LLM-data-pipeline queries over documents/embeddings (SURVEY §2.3).

Dedup, similarity search, and text analysis — the driver-mandated
north-star extensions, each wired to the operator library in
``etl_caltopo_spark.llm``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.functions.portable import (
    MH_P,
    minhash_signature_sql,
    portable_string_hash_sql,
)
from etl_caltopo_spark.io import fan_out, load_table
from etl_caltopo_spark.llm import dedup, multimodal, similarity, text
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

_STOP_SQL = "['" + "','".join(text.STOPWORDS) + "']"


@query(
    "q_dedup_exact",
    oracle="""
    SELECT sha256(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    headline=True,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: group on sha256, keep min id.
    The shuffle carries (64-hex digest, id) — never document bodies —
    so this is the same plan at 100 TB."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs, "text", "doc_id")


@query(
    "q_dedup_near",
    oracle=None,
    note="MinHash/LSH banding is hash-family-specific; rows-only check.",
    headline=True,
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (shingle → minhash → band →
    bucket-join → exact-Jaccard verify)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dedup.near_duplicates(
        docs, "text", "doc_id", n_hashes=16, bands=4, threshold=0.4
    )


def _banded_jaccard_oracle() -> str:
    band_case = (
        f"CASE b.band_idx WHEN 0 THEN h0 * {MH_P} + h1 "
        f"WHEN 1 THEN h2 * {MH_P} + h3 "
        f"WHEN 2 THEN h4 * {MH_P} + h5 "
        f"ELSE h6 * {MH_P} + h7 END"
    )
    jac = (
        "floor(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(sa.sh, sb.sh))) * 10000) / 10000"
    )
    return rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), shs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(ts) - 2, 1) + 1),
                   i -> array_to_string(ts[i:i+2], ' ')
               )) AS strs
        FROM t
    ), sh AS (
        SELECT doc_id, unnest(strs) AS shingle FROM shs
    ), fp AS (
        SELECT doc_id, {portable_string_hash_sql("shingle")} AS x FROM sh
    ), sets AS (
        -- verify runs over the DISTINCT portable fingerprints (the
        -- compact int representation the engine caches and joins)
        SELECT doc_id, list(DISTINCT x) AS sh FROM fp GROUP BY doc_id
    ), sig AS (
        SELECT doc_id, {minhash_signature_sql("x")} FROM fp GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band_idx, {band_case} AS band_val
        FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c
          ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b, {jac} AS jaccard
    FROM pairs
    JOIN sets sa ON sa.doc_id = id_a
    JOIN sets sb ON sb.doc_id = id_b
    WHERE {jac} >= 0.1
    """


@query("q_dedup_jaccard", oracle=_banded_jaccard_oracle())
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over MINHASH-BANDED candidates — the
    deterministic, oracle-checkable complement to production LSH,
    re-blocked in round 5 (VERDICT r4 #2): candidates come from the
    engine-portable banded-MinHash family (the q_dedup_minhash_portable
    machinery, which DuckDB replays bit-for-bit), then EXACT
    shingle-set Jaccard verifies each candidate.

    The previous graded plan blocked on `source` — a key with FIXED
    cardinality (20 at sf0.01), so per-block rows grew O(n) and pair
    work O(n²/20): a quadratic scale-killer hiding behind a blocking
    key.  Banding bounds candidates by signature agreement (genuinely
    similar pairs) instead of corpus size; the old plan survives as a
    test-only baseline (dedup.ngram_jaccard_pairs) — on the synthetic
    corpus the banded plan recovers the ENTIRE unblocked all-pairs
    J>=0.1 set at both sf0.001 and sf0.01
    (tests/test_llm_ops.py::test_banded_jaccard_matches_bruteforce)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_banded_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.1
    )


@query(
    "q_dedup_simhash",
    oracle=None,
    note="simhash bit-voting is hash-family-specific; rows-only check.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 16-bit chunk blocking + Hamming
    verify; bit vote is the engine's one Arrow pandas_udf."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs, "text", "doc_id", max_hamming=16)


@query(
    "q_sim_topk",
    oracle="""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
                 (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[]))) *
                  sqrt(list_dot_product(q.qv, q.qv))) * 1000000) / 1000000 AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    headline=True,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (broadcast query
    vector; TakeOrderedAndProject — no global sort)."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), q, k=10
    )


@query(
    "q_sim_topk_lsh",
    oracle=None,
    note="hyperplane-LSH recall is approximate by design; rows-only.  Non-finite vectors are excluded up front (extremes r11: a NaN cosine orders engine-divergently and ML Vectors reject NaN/inf).",
)
def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane bucket prefilter — the
    ANN scale path."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return similarity.lsh_bucket_topk(
        emb.filter(F.col("vec_id") != 0), q, k=10, n_planes=4, dim=64
    )


@query(
    "q_sim_topk_ivf",
    oracle=None,
    note="IVF probes a KMeans-cell subset; recall is approximate by design.  Non-finite vectors cannot be indexed (extremes r11: array_to_vector raises on a NaN/inf component) and are excluded like NULLs.",
)
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer + probe the 2
    nearest of 8 cells (the inverted-file ANN structure, complementing
    the hyperplane-LSH variant)."""
    apply_runtime_conf(spark)
    # NULL vectors can't be indexed or queried (r8 NULL policy)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") != 0), q, k=10, n_cells=8, n_probe=2
    )


def _dedup_embed_oracle() -> str:
    """Literal-plane hyperplane-bucket oracle (4 planes → 16 buckets):
    the q_embed_lsh_portable pattern at the q_dedup_embed operating
    point.  Plane coefficients embed as exact-repr SQL literals and
    both engines fold the sign dot products in the same sequential
    order, so bucket bits are bit-identical; the verify cosine floors
    at 6 dp as usual."""
    from etl_caltopo_spark.llm.similarity import _hyperplane

    planes = _hyperplane(4, 64)
    lits = [
        "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lits[i]}) >= 0 THEN {1 << i} "
        f"ELSE 0 END)"
        for i in range(4)
    )
    cos = (
        "floor(list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        " * 1000000) / 1000000"
    )
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE {similarity.sql_vector_finite("embedding")}
    ), bucketed AS (
        SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {cos} AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.3
    """


@query("q_dedup_embed", oracle=_dedup_embed_oracle())
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over HYPERPLANE-BUCKET
    blocking + exact cosine verify — re-blocked in round 5 (VERDICT r4
    #3).  The previous graded plan blocked on the cluster `label`, a
    key with 10 FIXED distinct values, so per-block pair work grew
    O(n²/10) with corpus size.  The deterministic 4-plane bucket (16
    buckets; seeded splitmix64 hyperplanes, no RNG) cuts the
    within-block quadratic by the bucket count AND keeps growing finer
    with more planes at scale, while staying hash-gradable: the oracle
    embeds the identical plane coefficients as SQL literals and both
    engines fold the sign dot products in the same order, so bucket
    bits are bit-identical.  The `label`-blocked variant survives as a
    test-only baseline (similarity.embedding_near_pairs); soundness —
    every reported pair is a true >=0.3 pair with the exact cosine —
    is pinned in tests/test_llm_ops.py::test_bucketed_embed_is_sound_subset.
    Recall is the plane-count dial (the synthetic clusters are loose:
    no pair exceeds cosine 0.8, so candidate recall at 0.3 is the
    probabilistic LSH trade, measured not asserted)."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_pairs_lsh(
        emb, threshold=0.3, n_planes=4, dim=64
    )


@query(
    "q_dedup_embed_lsh",
    oracle=None,
    note="hyperplane-bucket blocking is probabilistic; rows-only check.  Non-finite vectors are excluded up front (extremes r11).",
)
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-LSH bucket blocking +
    exact cosine verify inside buckets.  Runs the SCALE setting of the
    dial — n_planes = 8 (256 buckets) vs the graded q_dedup_embed's
    16-bucket setting — so the pair of ids actually exercises two
    points on the recall/fan-in curve instead of running the same
    plan twice (code-review r6)."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_pairs_lsh(emb, threshold=0.3, n_planes=8, dim=64)


@query(
    "q_text_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t,
               length(text) AS n_chars_calc
        FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(n_chars_calc AS INTEGER) AS n_chars_calc,
           floor(CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                 / len(t) * 10000) / 10000 AS stop_ratio,
           floor(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                 / len(t) * 10000) / 10000 AS avg_tok_len
    FROM toks
    """,
    headline=True,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document stats — all codegen'd expressions."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        text.stopword_ratio(F.col("text")).alias("stop_ratio"),
        text.avg_token_len(F.col("text")).alias("avg_tok_len"),
    )


def _lang_markers_sql() -> str:
    branches = []
    for lang, markers in text.LANG_MARKERS:
        cond = " OR ".join(
            f"(' ' || lower(text) || ' ') LIKE '% {m} %'" for m in markers
        )
        branches.append(f"WHEN ({cond}) THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'en' END"


@query(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang, {_lang_markers_sql()} AS pred_lang
    FROM documents
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (deterministic formula; a
    model-based detector would slot in as a pandas_udf)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", text.lang_id(F.col("text")).alias("pred_lang"))


@query(
    "q_quality_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t,
               length(text) AS n_chars_calc
        FROM documents
    )
    SELECT doc_id,
           floor((least(1.0, len(t) / 50.0) * 0.5
                 + (1.0 - CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(t)) * 0.3
                 + least(1.0, n_chars_calc / 200.0) * 0.2) * 10000) / 10000 AS quality
    FROM toks
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length / stopword-soup / char mass)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.quality_score(F.col("text")).alias("quality"))


@query(
    "q_importance_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t,
               length(text) AS n_chars_calc
        FROM documents
    ), scored AS (
        SELECT doc_id,
               floor((least(1.0, len(t) / 50.0) * 0.5
                     + (1.0 - CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(t)) * 0.3
                     + least(1.0, n_chars_calc / 200.0) * 0.2) * 10000) / 10000
                   AS quality
        FROM toks
    )
    SELECT doc_id, quality
    FROM scored
    WHERE CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
          / 4294967296.0 < quality
    """,
)
def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (importance) sampling: each document is kept
    with probability equal to its quality score — the curation step
    that up-weights clean text without hard thresholds.  The
    acceptance draw is a Knuth multiplicative hash of doc_id mapped to
    [0,1) (a 32-bit numerator, so the double is exact), making the
    sample deterministic, engine-portable, and exactly
    oracle-checkable — no RNG state anywhere.  doc_id reduces mod
    2^31 BEFORE the multiply so the product stays under 2^63 for any
    bigint id (ANSI-overflow-safe at 100 TB); pure map stage with
    the filter in codegen."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_score(F.col("text"))
    u = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    return docs.filter(u < q).select("doc_id", q.alias("quality"))


def _cc_components_cte() -> str:
    """Shared CTE chain: label-blocked cosine pairs -> symmetric edges
    -> recursive transitive closure -> min-label components.  Used by
    BOTH q_dedup_clusters and q_dedup_resolve so the threshold/cosine
    algebra lives in one string (code-review r6)."""
    return f"""
    WITH base AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE {similarity.sql_vector_finite("embedding")}
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor(list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v)) *
                     sqrt(list_dot_product(b.v, b.v))) * 1000000) / 1000000 >= 0.3
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM pairs
    ), reach AS (
        WITH RECURSIVE r(src, dst) AS (
            SELECT vec_id, vec_id FROM base
            UNION
            SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
        ) SELECT * FROM r
    ), components AS (
        SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS cluster_id
        FROM reach GROUP BY src
    )"""


@query(
    "q_dedup_clusters",
    oracle=_cc_components_cte()
    + """
    SELECT vec_id, cluster_id FROM components
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: per-block connected components over the
    embedding near-dup graph (the oracle computes the same components
    by recursive transitive closure).  This is the step that turns
    near-dup PAIRS into keep/drop decisions.

    Edges never span label blocks, so clustering runs as ONE
    ``applyInPandas`` pass per block — a BLAS cosine matrix + local
    union-find (``dedup.clusters_within_blocks``) — instead of an
    exploded pair join feeding iterative min-label propagation.  One
    shuffle on the block key, zero fixpoint rounds.  The within-block
    quadratic is BLAS-bounded, which holds at eval scale; at 100 TB
    the blocking key becomes the LSH bucket (q_dedup_clusters_lsh,
    same operator)."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.clusters_within_blocks(emb, "label", threshold=0.3)


@query(
    "q_dedup_clusters_lsh",
    oracle=None,
    note="hyperplane-LSH bucket blocking is hash-family-specific; "
    "rows-only (refinement property vs the exact clusters is "
    "asserted in tests/test_llm_ops.py).  Non-finite vectors are "
    "excluded up front (extremes r11: sign-bit hashing and cosine on "
    "NaN/inf are engine-divergent).",
)
def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB duplicate-clustering path: candidate pairs come
    from the random-hyperplane LSH bucket join (vectors agreeing on
    all 8 sign bits), so pair generation shuffles on the bucket id
    and the quadratic term is bounded by the largest bucket —
    near-linear overall — instead of the label-block's |block|^2.
    Exact-cosine verification inside buckets keeps every emitted edge
    a true near-dup pair, so the resulting components are a provable
    REFINEMENT of q_dedup_clusters (never a merge across distinct
    exact clusters).  Clustering is the same per-block BLAS +
    union-find pass (``dedup.clusters_within_blocks``) keyed on the
    bucket instead of the label."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # attach_bucket (not the private _hyperplane + bucket_id pair):
    # same literal-path plan at 8x64 = 512, but future dim/plane
    # increases route through its broadcast dispatch (code-review r6)
    bucketed = similarity.attach_bucket(emb, "embedding", n_planes=8, dim=64)
    return dedup.clusters_within_blocks(bucketed, "_bucket", threshold=0.3)


@query(
    "q_image_decode_jpeg",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
           CAST(6 + (doc_id % 3) * 6 AS BIGINT) AS height,
           TRUE AS decoded
    FROM documents
    """,
)
def q_image_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG decode end-to-end under the oracle: a
    deterministic gradient image per doc is JPEG-encoded (pure-numpy
    DCT + huffman, llm/jpeg.py), carried as an opaque binary asset,
    and decoded back inside mapInPandas.  JPEG is lossy, so the
    graded columns are the LOSSLESS decode outputs — width/height and
    decode success, which require the full entropy decode to succeed
    (the decoder returns None, not header dims, on any entropy/DCT
    failure).  Pixel fidelity (quantization-bounded error) is pinned
    in tests/test_llm_ops.py."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    gen_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etl_caltopo_spark.llm.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 8 + (int(doc_id) % 5) * 4
                h = 6 + (int(doc_id) % 3) * 6
                x = np.arange(w, dtype=np.uint16)[None, :, None]
                y = np.arange(h, dtype=np.uint16)[:, None, None]
                c = np.arange(3, dtype=np.uint16)[None, None, :]
                img = (x + 2 * y + 85 * c).astype(np.uint8)
                payloads.append(encode_jpeg(img))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "image")
    decoded = multimodal.decode_images(assets)
    return decoded.select(
        "asset_id",
        "width",
        "height",
        F.col("width").isNotNull().alias("decoded"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER)
               AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
               AS INTEGER) AS bpe_ish_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS INTEGER)
               AS punct_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish
    word/punctuation regex (the pre-tokenizer shape BPE vocabularies
    split on).  ASCII classes only — the regex subset Java and RE2
    agree on."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("ws_tokens"),
        # [ \t\n\f\r] spelled out: Java \s would also swallow \x0B,
        # which the RE2 oracle treats as a punctuation token
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\f\r]")
        ).alias(
            "bpe_ish_tokens"
        ),
        F.regexp_count(
            F.col("text"), F.lit(r"[^A-Za-z0-9_ \t\n\f\r]")
        ).alias("punct_tokens"),
    )


@query(
    "q_doc_rolling_hash",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ), th AS (
        SELECT doc_id,
               list_transform(t, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS hs
        FROM toks
    )
    SELECT doc_id,
           CASE WHEN hs IS NULL THEN NULL
                ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                                 (acc, h) -> (acc * 31 + h) % 2147483647)
           END AS rolling_fp
    FROM th
    """,
)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    folded over token hashes (aggregate stays in codegen; arithmetic
    kept under 2^62 so ANSI mode can't overflow).  Distinguishes
    reordered documents that a bag-of-words digest would collapse.

    The per-token hash is the first 8 hex chars of md5 — engine
    portable (md5 is bit-identical everywhere), unlike xxhash64 whose
    seed/finalizer are Spark-specific.  acc < 2^31 and h < 2^32, so
    acc*31 + h < 2^37 — no overflow even under ANSI arithmetic."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    token_hashes = F.transform(
        text.tokens(F.col("text")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    rolling = F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(2_147_483_647),
    )
    return docs.select("doc_id", rolling.alias("rolling_fp"))


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical md5 content fingerprint."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal asset plumbing: opaque binary payload + typed
    metadata (decode itself is stubbed — see llm/multimodal.py)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.as_binary_assets(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "image"
    )
    return assets.select("asset_id", "media_type", "n_bytes")


@query(
    "q_pii_redact",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com, +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' or SSN 123-45-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS body
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(body,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS clean
    FROM raw
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: email/phone/SSN redaction
    via chained regexp_replace (map-only, codegen'd — the plan at
    100 TB is a single scan+project).  The synthetic corpus carries no
    PII, so deterministic contact lines derived from doc_id are
    injected first and then redacted; both engines run the identical
    construction."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com, +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" or SSN 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select("doc_id", text.redact_pii(body).alias("clean"))


@query(
    "q_ngram_topk",
    headline=True,
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
    ),
    bi AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
               AS bigram
        FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bi
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency top-20: transform-built bigram arrays →
    explode → count → TakeOrderedAndProject.  The shuffle carries
    (bigram, partial count) pairs only — map-side combine makes the
    exchange proportional to vocabulary size, not corpus size."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(text.bigrams(F.col("text"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT source, doc_id
    FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
               ) AS rn
        FROM documents
    ) ranked
    WHERE rn <= 5
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 5 docs per source, ranked by
    a Knuth multiplicative-hash key so the pick is pseudo-random yet
    identical in any engine and under any partitioning.  The standard
    per-class downsampling step of a training-data pipeline; one
    shuffle on the stratum key."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    # pre-reduce mod 2^31 before the multiply: doc_id past ~2^31.7
    # would overflow int64 under ANSI (the q_importance_sample guard —
    # code-review r6); identity for the synthetic ids
    key = (
        (F.col("doc_id") % 2147483648) * F.lit(2654435761)
    ) % F.lit(4294967296)
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id")
    )


@query(
    "q_dedup_resolve",
    oracle=_cc_components_cte()
    + """
    SELECT cluster_id,
           CAST(max(vec_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM components
    GROUP BY cluster_id
    """,
)
def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate RESOLUTION — the step after clustering: one keeper
    per near-dup cluster (max vec_id = newest under monotone ids, the
    common freshness policy) and the drop count.  Composes
    connected_components with a max_by-style aggregate; at 100 TB the
    extra cost over clustering is one shuffle of (vec_id, cluster_id)
    pairs."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    comps = dedup.clusters_within_blocks(emb, "label", threshold=0.3)
    return comps.groupBy("cluster_id").agg(
        F.max("vec_id").alias("keeper_id"),
        F.count("*").alias("n_members"),
        (F.count("*") - 1).alias("n_dropped"),
    )


@query(
    "q_tfidf_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, score
    FROM (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rn
        FROM scored
    ) ranked
    WHERE rn <= 5
    """,
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by TF-IDF with a
    RATIONAL idf (tf * N / df): exact integer arithmetic plus one
    correctly-rounded division gives bit-identical scores in any
    engine, where ln-based idf would hinge on libm ulp behavior.
    Plan: explode -> two hash aggregates -> broadcast df join ->
    per-doc top-k window; every shuffle carries (term, count) pairs,
    bounded by vocabulary and doc count, not corpus bytes."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # n_docs as an in-DAG broadcast scalar — the old docs.count() was
    # a second full scan outside the plan (code-review r6)
    n_row = docs.agg(F.count("*").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_row))
        .select(
            "doc_id",
            "term",
            (
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "score")
    )


@query(
    "q_doc_chunk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - 10, 1) + 1, 40)) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) / 40 AS BIGINT) AS chunk_idx,
           array_to_string(t[start:start+49], ' ') AS chunk_text,
           CAST(least(50, len(t) - start + 1) AS BIGINT) AS n_tokens
    FROM starts
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — 50-token chunks, 10-token
    overlap (stride 40), the canonical context-window prep step of a
    training pipeline.  Chunk starts come from sequence(), the text
    from slice() on a once-computed token array; posexplode keeps the
    chunk index.  Map-only: a 100 TB corpus chunks with zero shuffle,
    and output rows stay (doc_id, idx, text)-narrow."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    with_toks = docs.select("doc_id", toks.alias("t"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t") - 10, F.lit(1)), F.lit(40)
    )
    exploded = with_toks.select(
        "doc_id", "t", F.posexplode(starts).alias("chunk_idx", "start")
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(F.slice("t", F.col("start"), F.lit(50)), " ").alias("chunk_text"),
        F.least(F.lit(50), F.size("t") - F.col("start") + 1)
        .cast("long")
        .alias("n_tokens"),
    )


@query(
    "q_embed_quantize",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), normed AS (
        -- list_sum(list_transform(...)), NOT list_dot_product: the
        -- dot raises on a NULL list even under a CASE guard (DuckDB
        -- fuses and evaluates branches eagerly across the vector) and
        -- internal-errors on constant empty lists; the transform/sum
        -- pair degrades to NULL naturally and folds in the same
        -- sequential order (r8 NULL-injection sweep)
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS l2
        FROM base
    )
    SELECT vec_id, l2 AS l2_norm,
           CASE WHEN {similarity.sql_vector_finite("v")} AND l2 > 0
                THEN array_to_string(
               list_transform(v, x -> CAST(floor(x / l2 * 127) AS INTEGER)), ','
           ) END AS q8
    FROM normed
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding preprocessing for ANN indexing: L2 norm + int8
    quantization of the unit vector.  Exactness chain: the dot product
    folds in sequential order (matching DuckDB), sqrt and division are
    IEEE-correctly-rounded, floor is exact — so even the quantized
    codes hash-match across engines.  Map-only over the embedding
    table; the quantized output is 4x smaller on the wire, which is
    the point at 100 TB."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        similarity.norm(F.col("embedding")).alias("l2_norm"),
    )
    # NULL q8 for a zero-norm vector: ANSI Spark would raise
    # DIVIDE_BY_ZERO where DuckDB yields NULL elements — the same
    # guard cosine() carries (code-review r6).  NULL q8 likewise for a
    # non-finite vector (extremes r11: floor(NaN) silently yields 0 in
    # Spark where DuckDB's INT cast raises); the row and its raw
    # l2_norm — inf/NaN propagate identically through the sequential
    # fold in both engines — are kept.
    q8 = F.when(
        similarity.vector_finite(F.col("v")) & (F.col("l2_norm") > 0),
        F.array_join(
            F.transform(
                F.col("v"),
                lambda x: F.floor(x / F.col("l2_norm") * 127)
                .cast("int")
                .cast("string"),
            ),
            ",",
        ),
    )
    return normed.select("vec_id", "l2_norm", q8.alias("q8"))


@query(
    "q_decontaminate",
    oracle="""
    WITH sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 3, 1) + 1),
                   i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i:i+3], ' ')
               ))) AS shingle
        FROM documents
    ),
    bench AS (SELECT shingle, doc_id AS bench_id FROM sh WHERE source = 'src0'),
    train AS (SELECT shingle, doc_id FROM sh WHERE source <> 'src0')
    SELECT t.doc_id,
           CAST(count(DISTINCT t.shingle) AS BIGINT) AS n_hit_shingles,
           CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    4-token shingle with the held-out set (source 'src0' stands in
    for the benchmark), reporting how many distinct shingles and
    benchmark docs each one hits.  The join is an inverted index on
    the shingle itself — shuffle keyed by shingle, so cost scales with
    shared-shingle frequency, never |train| x |bench|; the broadcast
    side is the DISTINCT (shingle, bench_id) inverted index — bounded
    by bench vocabulary, not corpus size."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(dedup.shingles(F.col("text"), n=4)).alias("shingle"),
    )
    bench = sh.filter(F.col("source") == "src0").select(
        "shingle", F.col("doc_id").alias("bench_id")
    )
    train = sh.filter(F.col("source") != "src0").select("shingle", "doc_id")
    # count(DISTINCT bench_id) distributes over disjoint shingle
    # groups, so pre-aggregate the bench side to ONE ROW PER DISTINCT
    # (shingle, bench_id) — the vocabulary-bounded inverted index the
    # docstring promises — instead of broadcasting the raw exploded
    # pair table, which grows linearly with the corpus and would OOM
    # the driver at scale (code-review r6).  Distinct-then-broadcast
    # preserves both distinct counts exactly.
    bench_idx = bench.distinct()
    return (
        train.join(F.broadcast(bench_idx), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


@query(
    "q_repeated_spans",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 7, 1) + 1),
                   i -> array_to_string(t[i:i+7], ' ')
               ))) AS span
        FROM toks
    )
    SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM sh
    GROUP BY span
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, span
    LIMIT 50
    """,
)
def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication: 8-token spans that
    appear verbatim in two or more documents, ranked by document
    frequency — the span-level complement of whole-document dedup
    (boilerplate headers, license blocks, and template text that
    repeat across otherwise-distinct documents are what substring
    dedup removes from a training corpus).

    Scale shape: per-doc DISTINCT shingles explode map-side; one
    shuffle keyed by the span aggregates document frequency with
    partial aggregation, and the top-50 is a TakeOrderedAndProject
    heap — cost rides the shared-span tail, never |docs|² (no join at
    all).  At 100 TB the span column would carry a 64-bit hash with
    the text resolved for the survivors only; here the span text
    itself is carried so the DuckDB oracle can replay it exactly."""
    apply_runtime_conf(spark)
    # NULL documents have no spans: dropped on both sides (r8
    # NULL-injection policy)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col("text"), n=8)).alias("span")
    )
    return (
        sh.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "span")
        .limit(50)
    )


@query(
    "q_corpus_mix",
    oracle=r"""
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM per_doc GROUP BY source
    ), budgeted AS (
        SELECT *,
               CAST(100000 // (SELECT count(*) FROM per_source) AS BIGINT)
                   AS token_budget
        FROM per_source
    )
    SELECT source, n_docs, n_tokens, token_budget,
           CASE WHEN n_tokens <= token_budget THEN 1.0
                ELSE floor(CAST(token_budget AS DOUBLE) / n_tokens * 1000000)
                     / 1000000
           END AS sample_fraction
    FROM budgeted
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budgeting: allocate a global token budget
    (100k here) uniformly across sources and derive each source's
    sampling fraction — the planning step before building a
    fixed-size training mix from heterogeneous corpora.  Per-doc
    token counts are a pure map stage; one shuffle aggregates per
    source (a handful of groups); the scalar source count joins back
    as a broadcast — at 100 TB the whole query is one scan plus a
    tiny aggregate.  Fractions are exact integer ratios 6-dp floored;
    the budget split is INTEGER division on both sides (a
    double-divide then cast diverges cross-engine: Spark's
    cast(double→bigint) truncates while DuckDB's CAST rounds)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(text.token_count(F.col("text")).cast("bigint")).alias("n_tokens"),
    )
    n_sources = per_source.select(F.count("*").alias("_ns"))
    budgeted = per_source.crossJoin(F.broadcast(n_sources)).withColumn(
        "token_budget", F.expr("100000 div _ns")
    )
    frac = F.when(F.col("n_tokens") <= F.col("token_budget"), F.lit(1.0)).otherwise(
        fround(F.col("token_budget").cast("double") / F.col("n_tokens"), 6)
    )
    return budgeted.select(
        "source", "n_docs", "n_tokens", "token_budget", frac.alias("sample_fraction")
    )


@query(
    "q_repetition_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
               AS bigram
        FROM toks
    ), freq AS (
        SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(max(c) AS BIGINT) AS top_bigram_count,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(max(c) AS DOUBLE) / sum(c) AS repetition_ratio
    FROM freq
    GROUP BY doc_id
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: the share of a document's
    bigrams taken by its single most frequent bigram (looping/boiler-
    plate text scores high).  Two stacked aggregates keyed by doc —
    all partial-aggregating, shuffle bounded by per-doc vocabulary;
    the ratio is a division of exact integer counts."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("doc_id", F.explode(text.bigrams(F.col("text"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    return freq.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("n_bigrams"),
        (F.max("c").cast("double") / F.sum("c")).alias("repetition_ratio"),
    )


@query(
    "q_corpus_filter",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang, n_chars,
               string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ), sig AS (
        SELECT doc_id,
               len(t) AS n_tok,
               lang = 'en' AS lang_ok,
               len(t) BETWEEN 10 AND 1000 AS len_ok,
               n_chars >= 50 AS chars_ok,
               CAST(len(list_filter(t, x -> list_contains({{STOP}}, x))) AS DOUBLE)
                   / len(t) < 0.5 AS stop_ok
        FROM toks
    )
    SELECT doc_id, lang_ok, len_ok, chars_ok, stop_ok,
           (lang_ok AND len_ok AND chars_ok AND stop_ok) AS kept
    FROM sig
    """.replace("{STOP}", _STOP_SQL),
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style composite corpus filter: language, token-length
    window, raw size, stopword-soup bound — each rule surfaced as its
    own flag so downstream can audit WHY a doc dropped (reason codes,
    not silent deletion).  Pure codegen column expressions; the 100 TB
    cleanup is one map-only scan."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*text.STOPWORDS)))
    lang_ok = F.col("lang") == "en"
    len_ok = n_tok.between(10, 1000)
    chars_ok = F.col("n_chars") >= 50
    stop_ok = (n_stop.cast("double") / n_tok) < 0.5
    return docs.select(
        "doc_id",
        lang_ok.alias("lang_ok"),
        len_ok.alias("len_ok"),
        chars_ok.alias("chars_ok"),
        stop_ok.alias("stop_ok"),
        (lang_ok & len_ok & chars_ok & stop_ok).alias("kept"),
    )


@query(
    "q_word_entropy",
    oracle="""
    WITH words AS (
        SELECT doc_id, w
        FROM documents, unnest(string_split(text, ' ')) AS t(w)
        WHERE w <> ''
    ), wc AS (
        SELECT doc_id, w, count(*) AS n FROM words GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_words,
           floor((ln(sum(n)) - sum(n * ln(n)) / sum(n)) * 10000) / 10000
               AS entropy
    FROM wc GROUP BY doc_id
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution
    (nats) — the repetition/diversity signal corpus filters threshold
    on (low entropy = boilerplate / keyword stuffing).  Uses the
    H = ln(T) - sum(n·ln n)/T identity so only integer counts are
    aggregated before the one ln per distinct term; 4-dp floor
    absorbs libm ulp + summation-order drift (q_udaf_geomean
    policy).  Two partial-aggregating shuffles on doc-sized groups."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    total = F.sum("n")
    return wc.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_words"),
        fround(
            F.log(total) - F.sum(F.col("n") * F.log("n")) / total, 4
        ).alias("entropy"),
    )


@query(
    "q_centroid_assign",
    oracle="""
    WITH c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 8
    ), s AS (
        SELECT p.vec_id, c.centroid_id,
               floor(list_dot_product(v, cv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv, cv))) * 1000000) / 1000000
                   AS cos_sim
        FROM p, c
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id) AS rn
        FROM s
    )
    SELECT vec_id, centroid_id, cos_sim FROM r WHERE rn = 1
    """,
)
def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the IVF/KMeans E-step): broadcast
    the centroid table, score every point against all centroids
    JVM-side, keep the argmax per point (ties to the lowest centroid
    id).  Shuffle-free except the per-point window — and that window
    collapses to a TakeOrdered per point under partial aggregation;
    at 100 TB this is the map-only pass that builds the IVF index
    q_sim_topk_ivf probes."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    pts = emb.filter(F.col("vec_id") >= 8)
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        similarity.cosine_rounded(
            F.col("embedding"), F.col("cv"), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cos_sim")
    )


@query(
    "q_word_cooccur",
    oracle="""
    WITH dw AS (
        SELECT DISTINCT doc_id, w
        FROM documents, unnest(string_split(text, ' ')) AS t(w)
        WHERE w <> ''
    ), n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM dw),
    dfreq AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
    pairs AS (
        SELECT a.w AS w1, b.w AS w2, count(*) AS c12
        FROM dw a JOIN dw b
          ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY a.w, b.w
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS n_docs_both,
           floor(ln(CAST((SELECT n FROM n_docs) AS DOUBLE) * c12
                    / (f1.c * f2.c)) * 10000) / 10000 AS pmi
    FROM pairs
    JOIN dfreq f1 ON f1.w = pairs.w1
    JOIN dfreq f2 ON f2.w = pairs.w2
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def q_word_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word pairs by document-level PMI (pointwise mutual
    information) — the collocation/phrase-mining primitive.  Distinct
    (doc, word) pairs self-join on doc_id (the natural block key, so
    the quadratic term is bounded per document), document frequencies
    broadcast back, and the final order runs on the floor-scaled PMI
    with a lexicographic tie-break so the top-20 cut is deterministic
    cross-engine."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    dw = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    n_docs = dw.agg(F.count_distinct("doc_id").alias("n"))
    dfreq = dw.groupBy("w").agg(F.count("*").alias("c"))
    a, b = dw.alias("a"), dw.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").alias("c12"))
    )
    scored = (
        pairs.join(F.broadcast(dfreq.withColumnRenamed("w", "w1")
                   .withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(dfreq.withColumnRenamed("w", "w2")
              .withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("n_docs_both"),
            fround(
                F.log(
                    F.col("n").cast("double") * F.col("c12")
                    / (F.col("c1") * F.col("c2"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(20)


@query(
    "q_audio_stats",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(400 + (doc_id % 10) * 80 AS BIGINT) AS n_samples,
           (400 + (doc_id % 10) * 80) / 8.0 AS duration_ms
    FROM documents
    """,
)
def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode end-to-end: synthesize a deterministic PCM16 WAV
    per document (length keyed on doc_id), round-trip the bytes
    through the REAL RIFF/WAVE decoder (encode_wav → decode_audio,
    both Arrow-batched mapInPandas), and emit the decoded metadata.
    The oracle recomputes the same metadata in closed form, so a
    header-parsing or chunk-walk bug breaks the hash.  duration_ms =
    n/8 is a power-of-two division — exact in float32 and double."""
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

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
                n = 400 + (int(doc_id) % 10) * 80
                t = np.arange(n)
                freq = 220.0 + (int(doc_id) % 5) * 110.0
                sine = (np.sin(2 * np.pi * freq * t / 8000.0) * 12000).astype(
                    np.int16
                )
                payloads.append(multimodal.encode_wav(sine, 8000))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(
        raw, "asset_id", F.col("payload"), "audio"
    )
    decoded = multimodal.decode_audio(assets)
    return decoded.select(
        "asset_id",
        "sample_rate",
        "n_samples",
        F.col("duration_ms").cast("double").alias("duration_ms"),
    )


@query(
    "q_oov_rate",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ), vocab AS (
        SELECT tok FROM toks GROUP BY tok
        ORDER BY count(*) DESC, tok LIMIT 10
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           floor(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 100000000) / 100000000 AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (tok)
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-10
    vocabulary (ties broken lexically).

    The tokenizer-coverage check a training pipeline runs before
    committing to a vocab: pass 1 builds the frequency-ranked
    vocabulary (TakeOrderedAndProject — top-k never globally sorts),
    pass 2 streams every token past the broadcast vocab and counts
    misses.  The corpus scan shuffles once per pass on token-sized
    keys; the vocab side is O(k) and always broadcast, so at 100 TB
    the plan is two scans + one small-key aggregation, no big join.
    """
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(10)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            fround(F.col("n_oov").cast("double") / F.col("n_tokens"), 8).alias(
                "oov_rate"
            ),
        )
    )


@query(
    "q_bpe_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ), cs AS (
        -- chars materialized ONCE per token; pairing indexes the list
        -- (O(1) per element) instead of substr(tok, i, 2), whose
        -- positional scan is O(i) on UTF-8 — quadratic per token the
        -- moment a 200KB unbroken token appears (wide-values probe
        -- r14, knowledge #37)
        SELECT string_split(tok, '') AS chars
        FROM toks WHERE length(tok) >= 2
    ), pairs AS (
        SELECT unnest(list_transform(
                   range(1, len(chars)),
                   i -> chars[CAST(i AS INT)] || chars[CAST(i + 1 AS INT)]
               )) AS pair
        FROM cs
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 20
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs across the corpus — the
    counting step of one BPE merge iteration (the pair with the top
    count is the next merge rule).

    The whole inner loop of BPE vocabulary learning is this shape run
    repeatedly; expressed as sequence+transform (codegen'd, no Python)
    → explode → count → top-k, the per-iteration cost at 100 TB is one
    scan plus a shuffle keyed on ~|alphabet|² pairs, and the top-k is
    TakeOrderedAndProject (never a global sort).
    """
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("text")
    from etl_caltopo_spark.llm.dedup import bind_once

    toks = docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    # chars bound once per token; pairing reads the array by index
    # (O(1)) instead of substring(tok, i, 2), whose positional scan is
    # O(i) on UTF-8 — quadratic per token, measured 523 s on one 200KB
    # unbroken token (wide-values probe r14, knowledge #37)
    pairs = (
        toks.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                bind_once(
                    F.split(F.col("tok"), ""),
                    lambda cs: F.transform(
                        F.sequence(F.lit(1), F.size(cs) - 1),
                        lambda i: F.concat(
                            F.element_at(cs, i.cast("int")),
                            F.element_at(cs, i.cast("int") + 1),
                        ),
                    ),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(20)
    )


@query(
    "q_image_stats",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
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
def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Width/height/per-channel mean over REAL image decode.

    Exercises the full multimodal plumbing end-to-end with zero
    external codecs: deterministic payloads are generated per doc
    (gradient pixel (x, y, c) = x + 2y + 85c, all values < 256 so no
    wraparound) — PNG for odd doc_ids (stdlib-zlib decoder, scanline
    filter cycling over all five standard filters per doc so every
    unfilter branch runs under the oracle) and binary PPM for even
    ones — carried as opaque binary asset rows and magic-dispatched
    by decode_image inside mapInPandas: the exact Arrow-batched plan
    a JPEG decoder would run, scan-shaped with no shuffle.  The
    oracle is the closed form of the gradient's mean: mean_c =
    (w-1)/2 + (h-1) + 85c, float32-rounded exactly as the decode
    path rounds — identical for both formats, so a codec bug in
    either breaks the hash.
    """
    apply_runtime_conf(spark)
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

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
                w = 8 + (int(doc_id) % 5) * 4
                h = 6 + (int(doc_id) % 3) * 6
                x = np.arange(w, dtype=np.uint16)[None, :, None]
                y = np.arange(h, dtype=np.uint16)[:, None, None]
                c = np.arange(3, dtype=np.uint16)[None, None, :]
                img = (x + 2 * y + 85 * c).astype(np.uint8)
                if int(doc_id) % 2:
                    payloads.append(
                        multimodal.encode_png(img, filter_type=int(doc_id) % 5)
                    )
                else:
                    payloads.append(multimodal.encode_ppm(img))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    raw = docs.mapInPandas(gen, schema=gen_schema)
    assets = multimodal.as_binary_assets(raw, "asset_id", F.col("payload"), "image")
    decoded = multimodal.decode_images(assets)
    return decoded.select(
        "asset_id",
        "width",
        "height",
        F.element_at("mean_rgb", 1).cast("double").alias("mean_r"),
        F.element_at("mean_rgb", 2).cast("double").alias("mean_g"),
        F.element_at("mean_rgb", 3).cast("double").alias("mean_b"),
    )
