"""Sixth extended wave: statistical testing and data-integrity ops —
Welch two-sample t-test, chi-square independence, A/B conversion
z-test, table fingerprinting (row-hash checksum), per-column
cardinality profiling, sequence-gap detection, and the KMeans M-step
(centroid update) completing the E-step in q_centroid_assign.

Reference basis: all [EXT+] — the reference (task.ts:1-167) has no
aggregates; these are the validation / monitoring layer a production
pipeline wraps around the reference's fetch→transform→submit flow
(its analog is the runtime schema validation at task.ts:71-88).

Numeric policy (HANDOFF.md): every statistic is derived from EXACT
integer sums (money → cents, embeddings → floor-quantized
ten-thousandths) so the double arithmetic downstream is IEEE-identical
cross-engine, then truncated with ``fround``.  Sums of squares use
decimal(38,0) on the Spark side / HUGEINT on the DuckDB side so they
stay exact at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.llm import similarity
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@query(
    "q_ttest_welch",
    oracle="""
    WITH g AS (
        SELECT CAST(count(*) FILTER (l_returnflag = 'A') AS DOUBLE) AS n1,
               CAST(count(*) FILTER (l_returnflag = 'R') AS DOUBLE) AS n2,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (l_returnflag = 'A') AS DOUBLE) AS s1,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (l_returnflag = 'R') AS DOUBLE) AS s2,
               CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS HUGEINT))
                    FILTER (l_returnflag = 'A') AS DOUBLE) AS ss1,
               CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS HUGEINT))
                    FILTER (l_returnflag = 'R') AS DOUBLE) AS ss2
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), v AS (
        SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
               (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
               (ss2 - s2 * s2 / n2) / (n2 - 1) AS v2
        FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_r,
           floor(m1 / 100 * 10000) / 10000 AS mean_a,
           floor(m2 / 100 * 10000) / 10000 AS mean_r,
           floor((m1 - m2) / sqrt(v1 / n1 + v2 / n2) * 10000) / 10000
               AS t_stat,
           floor((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)) * 100) / 100
               AS welch_df
    FROM v
    """,
)
def q_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on extended price
    between returnflag populations A and R — the statistical gate a
    pipeline uses to decide whether two cohorts differ.  ONE
    conditional-aggregate pass over the fact table (count/sum/sum-sq
    per group via FILTER-style whens); mean and variance come from
    exact integer sums (cents; squares kept in decimal(38,0) so they
    never overflow at scale), so t and the Welch-Satterthwaite df are
    IEEE-identical cross-engine before the 4-dp floor."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    c = _cents("l_extendedprice")
    cc = (c * c).cast("decimal(38,0)")

    def grp(flag: str, expr: F.Column) -> F.Column:
        return F.sum(F.when(F.col("l_returnflag") == flag, expr)).cast("double")

    # counts are conditional COUNTs, not sum(when(..,1)): sum over
    # ZERO rows is NULL where the oracle's count(*) FILTER is 0
    # (empty-tables sweep r13) — count() gives 0 on both engines
    g = li.agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1))
        .cast("double")
        .alias("n1"),
        F.count(F.when(F.col("l_returnflag") == "R", 1))
        .cast("double")
        .alias("n2"),
        grp("A", c).alias("s1"),
        grp("R", c).alias("s2"),
        grp("A", cc).alias("ss1"),
        grp("R", cc).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    v = g.select(
        n1,
        n2,
        (F.col("s1") / n1).alias("m1"),
        (F.col("s2") / n2).alias("m2"),
        ((F.col("ss1") - F.col("s1") * F.col("s1") / n1) / (n1 - 1)).alias("v1"),
        ((F.col("ss2") - F.col("s2") * F.col("s2") / n2) / (n2 - 1)).alias("v2"),
    )
    se2 = F.col("v1") / n1 + F.col("v2") / n2
    return v.select(
        n1.cast("bigint").alias("n_a"),
        n2.cast("bigint").alias("n_r"),
        fround(F.col("m1") / 100, 4).alias("mean_a"),
        fround(F.col("m2") / 100, 4).alias("mean_r"),
        fround((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        fround(
            se2
            * se2
            / (
                (F.col("v1") / n1) * (F.col("v1") / n1) / (n1 - 1)
                + (F.col("v2") / n2) * (F.col("v2") / n2) / (n2 - 1)
            ),
            2,
        ).alias("welch_df"),
    )


@query(
    "q_chi_square",
    oracle="""
    WITH cells AS (
        SELECT r_name, c_mktsegment, CAST(count(*) AS DOUBLE) AS obs
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name, c_mktsegment
    ), tot AS (
        SELECT r_name, c_mktsegment, obs,
               sum(obs) OVER (PARTITION BY r_name) AS row_tot,
               sum(obs) OVER (PARTITION BY c_mktsegment) AS col_tot,
               sum(obs) OVER () AS n
        FROM cells
    )
    SELECT floor(sum((obs - row_tot * col_tot / n)
                     * (obs - row_tot * col_tot / n)
                     / (row_tot * col_tot / n)) * 10000) / 10000 AS chi2,
           CAST((count(DISTINCT r_name) - 1)
                * (count(DISTINCT c_mktsegment) - 1) AS BIGINT) AS dof
    FROM tot
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and region — the drift/association check a pipeline runs on
    categorical feature pairs.  The fact table is reduced to a 5x5
    contingency table in one partial-agg shuffle (dims broadcast);
    expected counts come from window sums over those 25 rows, so
    everything after the first aggregate is negligible at any scale.
    Counts are exact integers; chi2 is a double over exact operands,
    4-dp floor."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cells = (
        cust.join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count("*").cast("double").alias("obs"))
    )
    tot = cells.select(
        "r_name",
        "c_mktsegment",
        "obs",
        F.sum("obs").over(Window.partitionBy("r_name")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("c_mktsegment")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return tot.agg(
        fround(F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp), 4).alias(
            "chi2"
        ),
        (
            (F.countDistinct("r_name") - 1) * (F.countDistinct("c_mktsegment") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 90
                        THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ), g AS (
        SELECT CAST(count(*) FILTER (variant = 0) AS DOUBLE) AS n0,
               CAST(count(*) FILTER (variant = 1) AS DOUBLE) AS n1,
               CAST(sum(converted) FILTER (variant = 0) AS DOUBLE) AS c0,
               CAST(sum(converted) FILTER (variant = 1) AS DOUBLE) AS c1
        FROM u
    ), p AS (
        SELECT n0, n1, c0, c1, (c0 + c1) / (n0 + n1) AS pooled FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
           floor(c0 / n0 * 10000) / 10000 AS p_control,
           floor(c1 / n1 * 10000) / 10000 AS p_treatment,
           CASE WHEN pooled > 0 AND pooled < 1 THEN
               floor((c1 / n1 - c0 / n0)
                     / sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
                     * 10000) / 10000
           END AS z_score
    FROM p
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on per-user conversion (a high-value
    'purchase' event) between hash-split variants — the experiment
    readout every event pipeline ships.  Two aggregates: per-user
    conversion flags (shuffle on user_id), then one global conditional
    reduce; user counts and conversions are exact ints so the
    pooled-variance z is IEEE-identical cross-engine, 4-dp floor.
    Degenerate pools (p = 0 or 1, possible at tiny scale factors)
    yield a null z instead of a divide-by-zero under ANSI mode."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    # conditional COUNTs, not sum(when(..,1)) — 0 on empty input on
    # both engines where the sum form is NULL (empty sweep r13; the
    # q_ttest_welch note)
    g = u.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("double").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")))
        .cast("double")
        .alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")))
        .cast("double")
        .alias("c1"),
    )
    n0, n1, c0, c1 = F.col("n0"), F.col("n1"), F.col("c0"), F.col("c1")
    p = g.withColumn("pooled", (c0 + c1) / (n0 + n1))
    pooled = F.col("pooled")
    return p.select(
        n0.cast("bigint").alias("n_control"),
        n1.cast("bigint").alias("n_treatment"),
        fround(c0 / n0, 4).alias("p_control"),
        fround(c1 / n1, 4).alias("p_treatment"),
        F.when(
            (pooled > 0) & (pooled < 1),
            fround(
                (c1 / n1 - c0 / n0)
                / F.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1)),
                4,
            ),
        ).alias("z_score"),
    )


@query(
    "q_table_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
                             CAST(c_nationkey AS VARCHAR), c_mktsegment))
               AS row_fp
        FROM customer
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT row_fp) AS BIGINT) AS n_distinct,
           min(row_fp) AS min_fp,
           max(row_fp) AS max_fp
    FROM fp
    """,
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: md5 over a canonical
    pipe-joined row rendering, reduced to count / distinct-count /
    min / max — the cheap equality witness for replication and CDC
    reconciliation (the integrity analog of the reference's runtime
    schema validation, task.ts:71-88).  Doubles are excluded from the
    canonical string (engine float rendering differs); keys and
    categoricals cover identity.  One map stage + one reduce; no
    sort, no row transfer off executors."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    fp = cust.select(
        F.md5(
            F.concat_ws(
                "|",
                F.col("c_custkey").cast("string"),
                F.col("c_name"),
                F.col("c_nationkey").cast("string"),
                F.col("c_mktsegment"),
            )
        ).alias("row_fp")
    )
    return fp.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("row_fp").cast("bigint").alias("n_distinct"),
        F.min("row_fp").alias("min_fp"),
        F.max("row_fp").alias("max_fp"),
    )


@query(
    "q_cardinality_profile",
    oracle="""
    WITH a AS (
        SELECT count(*) AS n_rows,
               count(DISTINCT c_nationkey) AS d_nat,
               count(c_nationkey) AS nn_nat,
               count(DISTINCT c_mktsegment) AS d_seg,
               count(c_mktsegment) AS nn_seg,
               count(DISTINCT c_name) AS d_name,
               count(c_name) AS nn_name
        FROM customer
    )
    SELECT 'c_nationkey' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(d_nat AS BIGINT) AS n_distinct,
           CAST(n_rows - nn_nat AS BIGINT) AS n_nulls FROM a
    UNION ALL
    SELECT 'c_mktsegment', CAST(n_rows AS BIGINT), CAST(d_seg AS BIGINT),
           CAST(n_rows - nn_seg AS BIGINT) FROM a
    UNION ALL
    SELECT 'c_name', CAST(n_rows AS BIGINT), CAST(d_name AS BIGINT),
           CAST(n_rows - nn_name AS BIGINT) FROM a
    """,
)
def q_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column exact cardinality + null profile in ONE pass — the
    schema-discovery step before choosing join/partition keys.  Spark
    plans multiple DISTINCT aggregates via a single scan + Expand
    (one row per distinct-column per input row) — still one fact-table
    read where the naive form scans once per column; the wide 1-row
    result is unpivoted to (column, stats) rows with stack."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    wide = cust.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_nationkey").alias("d_nat"),
        F.count("c_nationkey").alias("nn_nat"),
        F.countDistinct("c_mktsegment").alias("d_seg"),
        F.count("c_mktsegment").alias("nn_seg"),
        F.countDistinct("c_name").alias("d_name"),
        F.count("c_name").alias("nn_name"),
    )
    return wide.selectExpr(
        "stack(3, "
        "'c_nationkey', n_rows, d_nat, n_rows - nn_nat, "
        "'c_mktsegment', n_rows, d_seg, n_rows - nn_seg, "
        "'c_name', n_rows, d_name, n_rows - nn_name"
        ") AS (column_name, n_rows, n_distinct, n_nulls)"
    ).selectExpr(
        "column_name",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "CAST(n_nulls AS BIGINT) AS n_nulls",
    )


@query(
    "q_seq_gaps",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k,
               lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS gap_len
    FROM k WHERE nxt > k + 1
    ORDER BY gap_len DESC, gap_start
    LIMIT 20
    """,
)
def q_seq_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-range detection over a key sequence (top-20 widest
    gaps in finalized order keys) — the completeness audit for any
    incremental feed, the batch analog of noticing dropped deltas in
    the reference's since-window fetch (task.ts:68).  lead() over the
    key order runs on the distributed two-pass rank machinery
    (operators/rank.py global_lead — VERDICT r6 #1): per-bucket lead
    with each bucket's last row patched from the next non-empty
    bucket's first key via a broadcast ≤buckets-row boundary frame —
    the finalized-key frame never sorts into one task.  Top-k is a
    heap (TakeOrderedAndProject), not a global sort."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import global_lead

    orders = load_table(spark, sf_dir, "orders")
    k = global_lead(
        orders.filter(F.col("o_orderstatus") == "F").select(
            F.col("o_orderkey").alias("k")
        ),
        "k",
        out_col="nxt",
    )
    return (
        k.filter(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("k") - 1).cast("bigint").alias("gap_len"),
        )
        .orderBy(F.col("gap_len").desc(), "gap_start")
        .limit(20)
    )


@query(
    "q_kmeans_update",
    oracle="""
    -- off-grid vectors excluded on both sides (extremes r12: the new
    -- points-side poisons overflowed the int64 ten-thousandths sum —
    -- Spark's long sum ANSI-raises on a saturated floor(inf*10000)
    -- where DuckDB's BIGINT cast raises first; same 4-dp-grid domain
    -- as q_kmeans_converge / q_silhouette)
    WITH g AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE {GRID}
    ), c AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM g WHERE vec_id < 8
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM g WHERE vec_id >= 8
    ), s AS (
        SELECT p.vec_id, p.v, c.centroid_id,
               floor(list_dot_product(v, cv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv, cv))) * 1000000) / 1000000
                   AS cos_sim
        FROM p, c
    ), assigned AS (
        SELECT vec_id, v, centroid_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id
              ) AS rn FROM s)
        WHERE rn = 1
    ), comp AS (
        SELECT centroid_id, CAST(i - 1 AS INTEGER) AS dim,
               CAST(floor(v[i] * 10000) AS BIGINT) AS q
        FROM assigned, unnest(range(1, len(v) + 1)) AS u(i)
    )
    SELECT centroid_id, dim,
           CAST(count(*) AS BIGINT) AS n_points,
           floor(sum(q) / (count(*) * 10000.0) * 10000) / 10000 AS new_mean
    FROM comp
    GROUP BY centroid_id, dim
    """.replace("{GRID}", similarity.sql_vector_on_grid("embedding")),
)
def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans M-step: recompute per-dimension centroid means from the
    E-step assignment in q_centroid_assign — together they form one
    Lloyd iteration, the build loop of the IVF index behind
    q_sim_topk_ivf.  Components are floor-quantized to exact integer
    ten-thousandths BEFORE summing, so the per-centroid means are
    exact integer arithmetic (order-independent) with a final 4-dp
    floor.  Plan: broadcast centroids, argmax per point, posexplode
    to (centroid, dim) pairs, one partial-agg shuffle of 512 groups —
    at 100 TB the explode fans out 64x but combines map-side to
    n_centroids x dim rows per task."""
    apply_runtime_conf(spark)
    # 4-dp-grid domain (extremes r12): a NaN/inf component saturates
    # floor(x*10000) to ±long-max and the int64 mean sum ANSI-
    # overflows — same exclusion as q_kmeans_converge / q_silhouette
    emb = load_table(spark, sf_dir, "embeddings").where(
        similarity.vector_on_grid(F.col("embedding"))
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    pts = emb.filter(F.col("vec_id") >= 8)
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        similarity.cosine_rounded(F.col("embedding"), F.col("cv"), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("centroid_id")
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    comp = assigned.select(
        "centroid_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "centroid_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * 10000).cast("bigint").alias("q"),
    )
    n = F.count("*")
    return comp.groupBy("centroid_id", "dim").agg(
        n.cast("bigint").alias("n_points"),
        fround(F.sum("q") / (n * 10000.0), 4).alias("new_mean"),
    )
