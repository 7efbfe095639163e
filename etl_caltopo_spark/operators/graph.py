"""Distributed graph primitives ([EXT], SURVEY §2.3 analytics).

Triangle counting uses the compact-forward / degree-orientation
scheme: orient every undirected edge from the (degree, id)-smaller
endpoint to the larger, build wedges only at the LOW end of each
edge, and close them with one more equi-join.  Out-degree under this
orientation is bounded by O(sqrt(2·|E|)), so wedge fan-out — the
quadratic term id-oriented counting pays on hub nodes — is capped and
total work is O(|E|^1.5) on any degree distribution.  The count is
orientation-invariant, so the simple id-oriented SQL remains the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    """Undirected degree per node of a (u, v) edge list (u < v,
    distinct)."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )


def oriented_edges(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Re-orient (u, v) edges by the (degree, id) total order:
    output (a, b, db) with a strictly before b.  Two broadcast-able
    joins against the degree table attach both endpoint degrees."""
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected (u, v) edge list
    (u < v, distinct rows) — 1-row DataFrame with ``n_triangles``.

    Wedges form only at the (degree, id)-low endpoint of each
    oriented edge pair — fan per node is oriented-out-degree², capped
    at O(|E|) total by the orientation — and close with a single
    equi-join on the two high endpoints.  Three shuffles total (edge
    orientation join, wedge join on a, close join on (y, z))."""
    o = oriented_edges(edges, degree_table(edges)).localCheckpoint()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("db").alias("dy"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"), F.col("db").alias("dz"))
    wedge = e1.join(e2, "x").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    e3 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    # Deliberate shuffled-hash close join (optimization r14, guide
    # §3.1): the probe side is the wedge stream — O(|E|^1.5) rows,
    # always the larger side — and sort-merge paid a full sort of it
    # (measured sf0.1: 9.2 s for the close stage, ~22M wedges).
    # Building the hash table on the EDGE side instead skips that
    # sort (2.6 s); the build side is one shuffle-partition slice of
    # the oriented edge list, which shrinks as the shuffle width
    # scales, so the strategy holds at any graph size.
    return (
        wedge.join(e3.hint("shuffle_hash"), ["y", "z"])
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
