"""Ninth extended wave: per-domain caps and graph clustering.

Reference basis: all [EXT+] —
- q_domain_cap is the crawl-curation primitive (cap documents per
  source/domain by a quality key) every large-scale training-data
  pipeline applies before mixing;
- q_clustering_coeff extends the graph family (q_pagerank,
  q_triangle_count) with the global clustering coefficient:
  triangles, wedges Σ C(deg,2), and transitivity 3Δ/wedges —
  the scalar cohesion metric the plain triangle count lacks.

Numeric policy (HANDOFF.md): counts stay integers; value sums use the
round(sum, 2) grid rule; the clustering coefficient is one double
division over exact integers, 6-dp floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_domain_cap",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 3
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most 3 documents per source,
    best-first (n_chars as the quality key, doc_id tiebreak) — the
    crawl-curation step that stops one domain from dominating a
    training mix.

    Scale shape: rank-within-partition ≤ k compiles to a
    WindowGroupLimit — the top-k survives map-side per partition
    before the single shuffle on the domain key, so the exchange
    carries O(k · domains), not O(rows).  No global sort."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_clustering_coeff",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
        ) GROUP BY node
    ), wedges AS (
        SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT t.n_triangles, w.n_wedges,
           CASE WHEN w.n_wedges > 0 THEN
               floor(CAST(3 * t.n_triangles AS DOUBLE) / w.n_wedges * 1000000)
                   / 1000000
           END AS global_clustering
    FROM tri t CROSS JOIN wedges w
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the part
    co-purchase graph (same edge derivation as q_pagerank /
    q_triangle_count): n_triangles, wedges Σ C(deg,2), and
    3·triangles/wedges.

    Scale shape: triangles via operators.graph.triangle_count —
    degree-oriented compact-forward, so wedge fan per node is capped
    at O(sqrt(|E|))² regardless of hub skew and total work is
    O(|E|^1.5); the oracle stays the simple id-oriented 3-join (the
    count is orientation-invariant).  Wedge and triangle counts are
    exact integers, so the only double is the final coefficient
    (6-dp floor)."""
    from etl_caltopo_spark.operators.graph import degree_table, triangle_count

    apply_runtime_conf(spark)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint()  # edge list consumed by orientation + degrees
    )
    tri = triangle_count(e)
    deg = degree_table(e)
    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            fround(
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges"),
                6,
            ),
        ).alias("global_clustering"),
    )
