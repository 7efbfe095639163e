"""Round-5 wave: winnowing fingerprints, deterministic salted skew
join, and centroid silhouette — scale patterns a 100-TB corpus
pipeline leans on, each hash-graded against a DuckDB replay.

Reference scope note: the reference engine (task.ts:63-160) stops at
single-map feature ETL; these extend the LLM-corpus surface the brief
mandates (document fingerprinting, skew mitigation, cluster quality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caltopo_spark.functions.numeric import fround
from etl_caltopo_spark.functions.portable import (
    portable_string_hash,
    portable_string_hash_sql,
)
from etl_caltopo_spark.io import fan_out, load_table
from etl_caltopo_spark.llm import similarity
from etl_caltopo_spark.llm.similarity import (
    sql_vector_on_grid as _sql_vector_on_grid,
)
from etl_caltopo_spark.llm.text import portable_lower
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

#: winnowing parameters: word-k-gram size and window width.  Guarantee
#: (Schleimer/Wilkerson/Aiken, SIGMOD'03): any shared substring of at
#: least w + k - 1 = 6 tokens produces at least one shared fingerprint.
_WIN_K = 3
_WIN_W = 4

#: position packs into the low bits of the window-min encoding; docs
#: must stay under 2^20 k-grams (at 100 TB, chunk longer docs upstream)
_POS_BITS = 20
_POS_BASE = 1 << _POS_BITS


def _winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Selected (doc_id, pos, fp) winnowing fingerprints.

    Each positional word-3-gram hashes with the portable family; every
    width-4 window selects its minimum hash, rightmost position on
    ties (the robust-winnowing tie rule), via ONE integer window-min:
    enc = h·2^20 + (2^20 − pos) minimizes h first, then maximizes pos
    — no second pass, no conditional aggregate.  Selected positions
    dedupe (adjacent windows usually share their minimum).

    Scale shape: posexplode → per-doc window (ONE shuffle keyed by
    doc_id) → distinct on (doc_id, pos).  All integer codegen; the
    fingerprint density is ~2/(w+1) of grams, so output is a small
    fraction of the token stream.  fan_out first (r14): the gram
    hashing is an interpreted per-char fold and a one-row-group
    source would run it on a single task (no-op at scale)."""
    toks = fan_out(docs).select(
        # explicit RE2 \s set — Java's \s also matches \x0B, RE2's
        # does not (the text.tokens() parity rule)
        "doc_id",
        F.split(
            F.trim(portable_lower(F.col("text"))), r"[ \t\n\f\r]+"
        ).alias("ts"),
    ).filter((F.size("ts") > 0) & (F.element_at("ts", 1) != ""))
    # ENFORCED precondition (code-review r6): the position encoding
    # packs pos into the low 20 bits, so a document with >= 2^20
    # k-grams would bleed into the hash field and silently corrupt
    # fingerprints IN BOTH ENGINES (hash-parity cannot catch it).
    # assert_true raises at execution instead — chunk longer docs
    # upstream (q_doc_chunk) before winnowing.
    toks = toks.filter(
        F.assert_true(
            F.size("ts") < _POS_BASE + _WIN_K - 1,
            F.concat(
                F.lit("winnowing: document too long for 20-bit positions: "),
                F.col("doc_id").cast("string"),
            ),
        ).isNull()
    )
    n_grams = F.greatest(F.size("ts") - (_WIN_K - 1), F.lit(1))
    grams = toks.select(
        "doc_id",
        n_grams.alias("n_grams"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.array_join(F.slice(F.col("ts"), i, _WIN_K), " "),
            )
        ).alias("i0", "gram"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("i0") + 1).alias("pos"),
        F.col("gram"),
    )
    hashed = grams.select(
        "doc_id",
        "n_grams",
        "pos",
        (
            portable_string_hash("gram") * _POS_BASE
            + (F.lit(_POS_BASE) - F.col("pos"))
        ).alias("enc"),
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    sel = (
        hashed.withColumn("win_min", F.min("enc").over(frame))
        # window starts: every full window, plus the single start of a
        # short (< w grams) document
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - (_WIN_W - 1), F.lit(1)))
        .select(
            "doc_id",
            (F.lit(_POS_BASE) - F.col("win_min") % _POS_BASE).alias("pos"),
            F.expr(f"win_min div {_POS_BASE}").alias("fp"),
        )
        .distinct()
    )
    return sel


def _winnow_oracle_cte() -> str:
    """Shared DuckDB CTE chain computing the same fingerprints."""
    return rf"""
    t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
        WHERE len(string_split_regex(trim(lower(text)), '\s+')) > 0
          AND string_split_regex(trim(lower(text)), '\s+')[1] <> ''
    ), grams AS (
        SELECT doc_id,
               greatest(len(ts) - {_WIN_K - 1}, 1) AS n_grams,
               CAST(i AS BIGINT) AS pos,
               array_to_string(ts[CAST(i AS INT):CAST(i + {_WIN_K - 1} AS INT)], ' ') AS gram
        FROM t, UNNEST(range(1, greatest(len(ts) - {_WIN_K - 1}, 1) + 1)) AS u(i)
    ), hashed AS (
        SELECT doc_id, n_grams, pos,
               {portable_string_hash_sql("gram")} * {_POS_BASE}
                   + ({_POS_BASE} - pos) AS enc
        FROM grams
    ), winmin AS (
        SELECT doc_id, n_grams, pos,
               min(enc) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
                   AS win_min
        FROM hashed
    ), sel AS (
        SELECT DISTINCT doc_id,
               {_POS_BASE} - (win_min % {_POS_BASE}) AS pos,
               win_min // {_POS_BASE} AS fp
        FROM winmin
        WHERE pos <= greatest(n_grams - {_WIN_W - 1}, 1)
    )"""


@query(
    "q_winnowing",
    oracle=f"""
    WITH {_winnow_oracle_cte()}
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp
    FROM sel
    """,
)
def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): every width-4 window over the
    positional word-3-gram hash stream selects its minimum (rightmost
    on ties), guaranteeing any shared run of ≥ w+k−1 = 6 tokens leaves
    a shared fingerprint while keeping density ~2/(w+1).  The
    corpus-dedup primitive between exact hashing (misses edits) and
    MinHash (no locality guarantee).

    Engine-portable end to end: gram hashes come from the portable
    code-point family and the rightmost-min tie rule folds into ONE
    integer window-min (enc = h·2^20 + (2^20 − pos)), so both engines
    derive identical fingerprint sets — hash-graded.

    Scale shape: posexplode → one per-doc window shuffle → distinct;
    all integer codegen, no Python."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = _winnow_fingerprints(docs)
    return out.select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("fp").cast("bigint").alias("fp"),
    )


@query(
    "q_winnowing_overlap",
    oracle=f"""
    WITH {_winnow_oracle_cte()}, fps AS (
        SELECT DISTINCT doc_id, fp FROM sel
    ), df AS (
        SELECT fp, count(*) AS n_docs FROM fps GROUP BY fp
    ), kept AS (
        SELECT fps.doc_id, fps.fp FROM fps JOIN df USING (fp)
        WHERE df.n_docs <= 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
)
def q_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-overlap candidates from shared winnowing fingerprints
    — the MOSS match step: docs sharing ≥ 2 selected fingerprints are
    local-overlap candidates (each shared fingerprint witnesses a
    shared ≥ 6-token run, a guarantee Jaccard-style similarity cannot
    give).

    Scale shape: inverted-index equi-join on the fingerprint value;
    fingerprints seen in > 50 docs are dropped first (boilerplate =
    stop-fingerprints — the df cap that bounds the join fan-out AND
    the hot-key skew, same policy as q_dedup_containment).  Pair agg
    is one partial-agg shuffle on (id_a, id_b)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fps = _winnow_fingerprints(docs).select("doc_id", "fp").distinct()
    df_cap = fps.groupBy("fp").agg(F.count("*").alias("n_docs"))
    kept = fps.join(df_cap.filter(F.col("n_docs") <= 50), "fp").select(
        "doc_id", "fp"
    )
    a = kept.select(F.col("doc_id").alias("id_a"), "fp")
    b = kept.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def _silhouette_chain_sql(prelude: str, member: str, out_cluster: str) -> str:
    """DuckDB side of the simplified-silhouette chain, shared by
    q_silhouette (clusters = true labels) and q_silhouette_ivf
    (clusters = the E-step assignment): M-step means (exact integer
    ten-thousandths, 4-dp floor), clamp-before-sqrt distances, 6-dp
    floored per-point score, 4-dp-floored per-cluster sum.  ONE
    definition — the cross-engine rounding grid lives here and in
    :func:`_simplified_silhouette` only (r7 review: the first ivf cut
    duplicated the whole chain in four places).

    ``member`` must select (vec_id, grp, v DOUBLE[]); ``prelude``
    carries any CTEs it needs (names must not collide with the
    _sil-prefixed chain CTEs).

    greatest(..., 0): a point sitting on its centroid can produce a
    tiny NEGATIVE cancellation residue that the 6-dp floor turns into
    -1e-6 — DuckDB's sqrt() hard-errors on negatives (Spark yields
    NaN), so both engines clamp before sqrt (code-review r6)."""
    d2 = (
        "greatest(floor((list_dot_product(e.v, e.v)"
        " - 2 * list_dot_product(e.v, c.cv)"
        " + list_dot_product(c.cv, c.cv)) * 1000000) / 1000000, 0)"
    )
    return f"""
    WITH {prelude}_sil_member AS (
        {member}
    ), _sil_comp AS (
        SELECT grp, CAST(d AS INT) AS dim,
               CAST(floor(v[CAST(d + 1 AS INT)] * 10000) AS BIGINT) AS q
        FROM _sil_member, UNNEST(range(0, 64)) AS t(d)
    ), _sil_cm AS (
        SELECT grp, dim,
               floor(sum(q) / (count(*) * 10000.0) * 10000) / 10000 AS m
        FROM _sil_comp GROUP BY grp, dim
    ), _sil_cent AS (
        SELECT grp AS cgrp, list(m ORDER BY dim) AS cv
        FROM _sil_cm GROUP BY grp
    ), _sil_d AS (
        SELECT e.vec_id, e.grp, c.cgrp, {d2} AS d2
        FROM _sil_member e, _sil_cent c
    ), _sil_ab AS (
        SELECT vec_id, grp,
               sqrt(min(CASE WHEN cgrp = grp THEN d2 END)) AS a,
               sqrt(min(CASE WHEN cgrp <> grp THEN d2 END)) AS b
        FROM _sil_d GROUP BY vec_id, grp
    ), _sil_s AS (
        -- per-point score as EXACT integer micros: summing the
        -- floored DOUBLES accumulated ~1e-16 noise, and a cluster
        -- whose sum lands within noise of the next rounding boundary
        -- flipped with Spark's partition order (r8 NULL-injection
        -- sweep caught one); int64 sums are order-free
        SELECT vec_id, grp,
               CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((b - a) / greatest(a, b) * 1000000)
                              AS BIGINT)
               END AS sil_u
        FROM _sil_ab
    )
    SELECT grp AS {out_cluster},
           CAST(count(*) AS BIGINT) AS n_points,
           floor(sum(sil_u) / (count(*) * 1000000.0) * 1000000) / 1000000
               AS avg_sil
    FROM _sil_s GROUP BY grp
    """


def _simplified_silhouette(member: DataFrame, out_cluster: str) -> DataFrame:
    """Spark side of the shared chain — see
    :func:`_silhouette_chain_sql` for the contract and rounding grid.
    ``member``: (vec_id, grp, v array<double>)."""
    from etl_caltopo_spark.llm import similarity

    comp = member.select("grp", F.posexplode("v").alias("dim", "x")).select(
        "grp",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("x") * 10000).cast("bigint").alias("q"),
    )
    n = F.count("*")
    cm = comp.groupBy("grp", "dim").agg(
        fround(F.sum("q") / (n * 10000.0), 4).alias("m")
    )
    cent = cm.groupBy(F.col("grp").alias("cgrp")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )
    # clamped at 0: the 6-dp floor can turn a cancellation residue
    # into -1e-6, which DuckDB's sqrt() rejects (code-review r6).
    # Self-dots hoisted to one fold per point / per centroid (r14,
    # sqdist_rounded_prenormed) — the pair projection previously ran
    # all three folds per (point, centroid) row.
    d2 = F.greatest(
        similarity.sqdist_rounded_prenormed(
            F.col("_aa"), F.col("v"), F.col("cv"), F.col("_bb"), 6
        ),
        F.lit(0.0),
    )
    d = (
        member.withColumn("_aa", similarity.dot(F.col("v"), F.col("v")))
        .crossJoin(
            F.broadcast(
                cent.withColumn(
                    "_bb", similarity.dot(F.col("cv"), F.col("cv"))
                )
            )
        )
        .select("vec_id", "grp", "cgrp", d2.alias("d2"))
    )
    ab = d.groupBy("vec_id", "grp").agg(
        F.sqrt(
            F.min(F.when(F.col("cgrp") == F.col("grp"), F.col("d2")))
        ).alias("a"),
        F.sqrt(
            F.min(F.when(F.col("cgrp") != F.col("grp"), F.col("d2")))
        ).alias("b"),
    )
    # per-point score as EXACT integer micros (r8): the previous
    # sum-of-floored-doubles carried ~1e-16 summation noise, and a
    # cluster whose sum sat within noise of the next rounding
    # boundary flipped with partition order (the NULL-injection sweep
    # caught cluster 4 straddling a 1e-4 edge).  int64 micros sum
    # exactly in any order; one final floor after the exact division.
    sil_u = F.when(
        F.greatest("a", "b") == 0, F.lit(0).cast("bigint")
    ).otherwise(
        F.floor(
            (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1000000
        ).cast("bigint")
    )
    s = ab.select("grp", sil_u.alias("sil_u"))
    return s.groupBy(F.col("grp").alias(out_cluster)).agg(
        F.count("*").cast("bigint").alias("n_points"),
        fround(
            F.sum("sil_u") / (F.count("*") * 1000000.0), 6
        ).alias("avg_sil"),
    )


@query(
    "q_silhouette",
    oracle=_silhouette_chain_sql(
        "",
        "SELECT vec_id, label AS grp, CAST(embedding AS DOUBLE[]) AS v"
        f" FROM embeddings WHERE {_sql_vector_on_grid('embedding')}",
        "label",
    ),
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette score per cluster label
    — the O(n·k) cluster-quality metric (Hruschka et al.'s simplified
    silhouette) a pipeline runs to validate embedding clusters before
    using them for stratification or SemDeDup cells; the classic
    silhouette's O(n²) pairwise distances are replaced by distances to
    the k centroids, which is the only form that survives 100 TB.

    Exactness chain (the q_kmeans_converge discipline), shared with
    q_silhouette_ivf via _simplified_silhouette/_silhouette_chain_sql:
    centroid components are exact integer ten-thousandths means
    floored at 4 dp; squared distances compose sequential-fold dot
    products floored at 6 dp and clamped at 0 (a centroid-coincident
    point's cancellation residue must not reach sqrt); a/b take sqrt
    of identical doubles (IEEE-correctly-rounded), the per-point
    silhouette floors at 6 dp, and the per-label mean floors the sum
    at 4 dp before dividing — every step replayed by the oracle.

    Scale shape: ONE k×64-group partial-agg shuffle builds centroids,
    the k-row centroid table broadcasts, per-point a/b is a map-side
    min over k, and the rollup is a k-group aggregate — no pairwise
    stage anywhere."""
    apply_runtime_conf(spark)
    # NULL vectors have no distances (r8 NULL-injection policy);
    # off-4-dp-grid vectors (NaN/±inf/huge components) can't feed the
    # exact-integer centroid means (extremes r11 — Spark's long floor
    # saturates, DuckDB's sum overflows)
    emb = load_table(spark, sf_dir, "embeddings").where(
        similarity.vector_on_grid(F.col("embedding"))
    )
    member = emb.select(
        "vec_id",
        F.col("label").alias("grp"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return _simplified_silhouette(member, "label")


_IVF_ASSIGN_PRELUDE = f"""c0 AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv0
        FROM embeddings
        WHERE vec_id < 8 AND {_sql_vector_on_grid("embedding")}
    ), p AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE vec_id >= 8 AND {_sql_vector_on_grid("embedding")}
    ), scored AS (
        SELECT p.vec_id, p.v, c.centroid_id,
               floor(list_dot_product(v, cv0) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(cv0, cv0))) * 1000000) / 1000000
                   AS cos_sim
        FROM p, c0 c
    ), assigned AS (
        SELECT vec_id, v, centroid_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id
              ) AS rn FROM scored)
        WHERE rn = 1
    ), """


@query(
    "q_silhouette_ivf",
    oracle=_silhouette_chain_sql(
        _IVF_ASSIGN_PRELUDE,
        "SELECT vec_id, centroid_id AS grp, v FROM assigned",
        "cell_id",
    ),
)
def q_silhouette_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette at IVF-CELL granularity (HANDOFF backlog
    #3 / VERDICT r6 optional): cluster membership is the coarse
    quantizer's own E-step assignment (cosine argmax to the vec_id<8
    centroids — the q_sim_topk_ivf cell map), centroids are the
    M-step means of the assigned members, and the score answers the
    question an IVF operator actually asks: are the CELLS compact and
    separated enough that probing n_probe of them recovers neighbors?
    Low avg_sil cells are the ones q_ann_recall_eval loses recall in.

    Exactness chain: composition of three already-graded disciplines —
    the E-step assignment (extended7._SQL_ASSIGNED twin), the M-step
    integer ten-thousandths means (q_kmeans_update), and the
    q_silhouette scoring chain (SHARED code: _simplified_silhouette /
    _silhouette_chain_sql — one definition of the rounding grid).

    Scale shape: broadcast argmax for the assignment — pinned
    (rank.pin_frame) because BOTH the M-step and the distance pass
    consume it, and unmaterialized each would re-run the n×k scoring
    crossJoin (r7 review); then ONE cells×64-group partial-agg
    shuffle, k-row centroid broadcast, k-group rollup — no pairwise
    stage, the only fact-table shuffles are k-bounded aggregates."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm import similarity
    from etl_caltopo_spark.operators.rank import pin_frame

    # NULL vectors can't be assigned or measured (r8 NULL policy);
    # off-grid vectors excluded like q_silhouette's (extremes r11)
    emb = load_table(spark, sf_dir, "embeddings").where(
        similarity.vector_on_grid(F.col("embedding"))
    )
    cents0 = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv0")
    )
    pts = emb.filter(F.col("vec_id") >= 8).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scored = pts.crossJoin(F.broadcast(cents0)).select(
        "vec_id",
        "v",
        "centroid_id",
        similarity.cosine_rounded(F.col("v"), F.col("cv0"), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("centroid_id")
    )
    member = pin_frame(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("grp"), "v")
    )
    return _simplified_silhouette(member, "cell_id")


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SALTED fact-dim join — the manual hot-key
    mitigation graded for exactness: the salted plan must produce the
    IDENTICAL aggregate as the plain join (the oracle runs the plain
    SQL).  The fact side salts each row with l_orderkey mod 8; the dim
    side replicates 8× (posexplode of a literal salt range), and the
    join key becomes (orderkey, salt) — any single hot orderkey now
    spreads over 8 shuffle partitions instead of one straggler task.

    When to reach for it at 100 TB: AQE's skew split only kicks in on
    sort-merge joins and rebalances partitions, not single giant keys
    crossing the per-key limit; salting is the deterministic fallback
    that also works for broadcast-ineligible dims and stream-static
    joins (SCALING.md fifth wave measures AQE's ladder).  Cost: dim
    replication ×8 — viable because the dim is the small side.

    The salt is derived (mod — no RNG), so the plan is replayable and
    this id stays hash-graded; the aggregate collapses the salt, so
    result equality IS the correctness proof of the rewrite.

    Measured honestly (SCALING.md salted-join ladder): at local-box
    scale the salted plan LOSES to the plain join even under a forced
    50%-hot key — the hot task costs less than 8x dim replication.
    The crossover is a cluster property (a key too big for ONE task's
    acceptable wall time); this id grades the exactness of the rewrite
    you must have ready before that point, not a local speedup."""
    apply_runtime_conf(spark)
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        (F.col("l_orderkey") % n_salt).alias("_salt"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted_dim = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
    )
    joined = li.join(
        salted_dim,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (li["_salt"] == salted_dim["_salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@query(
    "q_js_divergence",
    oracle=r"""
    WITH toks AS (
        SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS w
        FROM documents
    ), tok AS (
        SELECT source, w FROM toks WHERE w <> ''
    ), sc AS (
        SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
    ), cc AS (
        SELECT w, count(*) AS d FROM tok GROUP BY 1
    ), totals AS (
        SELECT (SELECT count(*) FROM tok) AS big_t
    ), st AS (
        SELECT source, sum(c) AS ts FROM sc GROUP BY source
    ), terms AS (
        SELECT sc.source,
               0.5 * (sc.c / st.ts)
                   * (ln(2 * sc.c * totals.big_t)
                      - ln(sc.c * totals.big_t + cc.d * st.ts)) AS p_term,
               0.5 * (cc.d / totals.big_t)
                   * (ln(2 * cc.d * st.ts)
                      - ln(sc.c * totals.big_t + cc.d * st.ts)) AS q_term,
               cc.d AS d
        FROM sc
        JOIN cc USING (w)
        JOIN st USING (source), totals
    )
    SELECT source,
           CAST(any_value(st.ts) AS BIGINT) AS n_tokens,
           floor((sum(p_term) + sum(q_term)
                  + 0.5 * ln(2)
                    * (1.0 - CAST(sum(d) AS DOUBLE)
                             / any_value(totals.big_t))) * 10000) / 10000
               AS jsd
    FROM terms JOIN st USING (source), totals
    GROUP BY source
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the whole-corpus distribution — the domain-drift metric a
    corpus pipeline uses to spot outlier sources before mixing
    (bounded in [0, ln 2], symmetric, defined even where KL is not).

    The closed form keeps it joinable: for tokens PRESENT in the
    source, both KL halves contribute; for the corpus tokens ABSENT
    from the source, m = q/2 exactly, so their entire contribution
    collapses to ½·ln2·(missing corpus mass) — no full-vocabulary
    per-source join, just the source's own tokens plus one scalar.

    Exactness: every ln argument is an exactly-representable integer
    (count products < 2^53), so both engines see identical doubles;
    weights are integer ratios; the 4-dp floor absorbs summation-order
    drift (q_word_entropy libm policy).

    Scale shape: two partial-agg shuffles (per-source and corpus term
    counts), one equi-join on the token, per-source rollup.  The
    corpus count table is vocabulary-sized (Heaps' law — sublinear in
    corpus size)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm import text

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    sc = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    cc = tok.groupBy("w").agg(F.count("*").alias("d"))
    st = sc.groupBy("source").agg(F.sum("c").alias("ts"))
    # corpus token total as an IN-DAG broadcast scalar (code-review
    # r6): the old tok.count() was a second driver action that
    # re-scanned and re-tokenized the whole corpus just for one number
    total = st.agg(F.sum("ts").cast("bigint").alias("big_t"))
    j = (
        sc.join(cc, "w")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(total))
    )
    big_t = F.col("big_t")
    denom_ln = F.log(F.col("c") * big_t + F.col("d") * F.col("ts"))
    p_term = (
        0.5 * (F.col("c") / F.col("ts"))
        * (F.log(2 * F.col("c") * big_t) - denom_ln)
    )
    q_term = (
        0.5 * (F.col("d") / big_t)
        * (F.log(2 * F.col("d") * F.col("ts")) - denom_ln)
    )
    import math

    per = j.groupBy("source").agg(
        F.any_value("ts").cast("bigint").alias("n_tokens"),
        (
            F.sum(p_term)
            + F.sum(q_term)
            + 0.5
            * math.log(2.0)
            * (1.0 - F.sum("d").cast("double") / F.any_value("big_t"))
        ).alias("_jsd"),
    )
    return per.select(
        "source", "n_tokens", fround(F.col("_jsd"), 4).alias("jsd")
    )


@query(
    "q_spearman",
    oracle="""
    WITH base AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
        WHERE (l_quantity IS NULL
               OR abs(l_quantity) < 9.223372036854776e18)
          AND (l_discount IS NULL
               OR abs(l_discount * 100) < 9.223372036854776e18)
    ), xr AS (
        SELECT x, CAST(2 * coalesce(sum(c) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + c + 1 AS BIGINT) AS rx2
        FROM (SELECT x, count(*) AS c FROM base GROUP BY x)
    ), yr AS (
        SELECT y, CAST(2 * coalesce(sum(c) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + c + 1 AS BIGINT) AS ry2
        FROM (SELECT y, count(*) AS c FROM base GROUP BY y)
    ), r AS (
        SELECT rx2, ry2 FROM base JOIN xr USING (x) JOIN yr USING (y)
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx2) AS BIGINT) AS sx,
               CAST(sum(ry2) AS BIGINT) AS sy,
               CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
               CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
               CAST(sum(ry2 * ry2) AS BIGINT) AS syy
        FROM r
    )
    SELECT n,
           floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 * 1000000) / 1000000 AS rho
    FROM s
    """,
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-aware, via Pearson on midranks)
    between order quantity and discount — the distribution-free
    dependence check an analyst runs before trusting a linear model.

    Rank trick for exactness AND scale: both variables live on small
    bounded grids (quantity: 50 integers; discount: 11 cents values),
    so midranks come from cumulative counts over the DISTINCT-value
    table (the q_auc bounded-domain argument — the ordered pass never
    touches row-level data), and rows get their ranks back through two
    broadcast joins.  Doubled midranks (2r is always an integer) keep
    every aggregate an exact int64; the doubling cancels in the
    Pearson quotient.  The final formula runs on doubles cast from
    identical integers, so both engines produce the identical value
    before the 6-dp floor.  int64 bound: sum(rx2^2) <= 4n^3 — safe
    through ~1.3e9 rows; beyond that the partial sums move to DECIMAL
    or the formula to centered doubles."""
    apply_runtime_conf(spark)

    # off-int64-grid observations excluded (extremes r11 wave 2: the
    # exact cast raises in both engines); NULLs keep their established
    # behavior (they drop at the rank join / grid group)
    _lim = F.lit(9.223372036854776e18)
    grid_ok = (
        F.col("l_quantity").isNull() | (F.abs("l_quantity") < _lim)
    ) & (
        F.col("l_discount").isNull() | (F.abs(F.col("l_discount") * 100) < _lim)
    )
    li = load_table(spark, sf_dir, "lineitem").where(grid_ok)
    base = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )

    def midranks2(df, col):
        counts = df.groupBy(col).agg(F.count("*").alias("c"))
        w = (
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).cast("bigint").alias(f"r{col}2"),
        )

    r = base.join(F.broadcast(midranks2(base, "x")), "x").join(
        F.broadcast(midranks2(base, "y")), "y"
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx2").cast("bigint").alias("sx"),
        F.sum("ry2").cast("bigint").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    den = (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")) * (
        nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    # NULL (not a crash) for a constant variable: den = 0 raises
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode while DuckDB's
    # double x/0 yields NULL — guard to match (code-review r6)
    rho = F.when(
        den > 0,
        (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / F.sqrt(den),
    )
    return s.select("n", fround(rho, 6).alias("rho"))


@query(
    "q_gini_vocab",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents
    ), vc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n
        FROM toks WHERE w <> '' GROUP BY w
    ), ranked AS (
        SELECT n, row_number() OVER (ORDER BY n, w) AS i FROM vc
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS v,
               CAST(sum(n) AS BIGINT) AS total,
               CAST(sum(i * n) AS BIGINT) AS weighted
        FROM ranked
    )
    SELECT v AS vocab_size, total AS n_tokens,
           floor((2.0 * weighted / (CAST(v AS DOUBLE) * total)
                  - (v + 1.0) / v) * 1000000) / 1000000 AS gini
    FROM s
    """,
)
def q_gini_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the corpus token-frequency distribution —
    the vocabulary-concentration signal (0 = uniform usage, → 1 = a
    few tokens dominate) that complements q_zipf_slope for corpus
    profiling: natural text sits near 0.6-0.8, boilerplate floods push
    higher.

    Formula: with frequencies sorted ascending, G = 2·Σ(i·n_i)/(V·T)
    − (V+1)/V — every aggregate is an exact int64 (row_number ties
    broken by token for determinism), so both engines divide identical
    integers; one 6-dp floor at the end.

    Scale shape: corpus-wide partial-agg term count, then the exact
    vocabulary rank runs on the distributed two-pass machinery
    (operators/rank.py global_row_number — review wave r7: the vocab
    frame grows with the corpus under Heaps' law, so the old
    unpartitioned row_number window was the one data-proportional
    sort left in this id)."""
    apply_runtime_conf(spark)

    from etl_caltopo_spark.llm import text
    from etl_caltopo_spark.operators.rank import global_row_number, pin_frame

    docs = load_table(spark, sf_dir, "documents")
    # pin the vocabulary aggregate: the rank operator's eager cut
    # probe is a separate job — unpinned, it re-tokenizes the WHOLE
    # corpus just to sketch the cut points; pinned, the probe scans
    # the Heaps-sublinear vocab frame (operators/rank.py pin_frame)
    vc = pin_frame(
        docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    ranked = global_row_number(
        vc, "n", [F.col("n"), F.col("w")], rn_col="i", tiebreak="w"
    ).select("n", "i")
    s = ranked.agg(
        F.count("*").cast("bigint").alias("v"),
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("i") * F.col("n")).cast("bigint").alias("weighted"),
    )
    gini = (
        2.0 * F.col("weighted") / (F.col("v").cast("double") * F.col("total"))
        - (F.col("v") + 1.0) / F.col("v")
    )
    return s.select(
        F.col("v").alias("vocab_size"),
        F.col("total").alias("n_tokens"),
        fround(gini, 6).alias("gini"),
    )


@query(
    "q_kendall_tau",
    oracle="""
    WITH base AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
        WHERE (l_quantity IS NULL
               OR abs(l_quantity) < 9.223372036854776e18)
          AND (l_discount IS NULL
               OR abs(l_discount * 100) < 9.223372036854776e18)
    ), joint AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x, y
    ), pq AS (
        SELECT
            CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y
                          THEN a.c * b.c ELSE 0 END) AS BIGINT) AS p,
            CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y
                          THEN a.c * b.c ELSE 0 END) AS BIGINT) AS q
        FROM joint a, joint b
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM base
    ), tx AS (
        SELECT CAST(sum(cx * (cx - 1) / 2) AS BIGINT) AS n1
        FROM (SELECT x, count(*) AS cx FROM base GROUP BY x)
    ), ty AS (
        SELECT CAST(sum(cy * (cy - 1) / 2) AS BIGINT) AS n2
        FROM (SELECT y, count(*) AS cy FROM base GROUP BY y)
    )
    SELECT n.n,
           floor((CAST(p AS DOUBLE) - q)
                 / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - tx.n1)
                        * (CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - ty.n2))
                 * 1000000) / 1000000 AS tau_b
    FROM pq, n, tx, ty
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (tie-corrected concordance) between quantity
    and discount — the ordinal-association sibling of q_spearman,
    computed WITHOUT touching row pairs: both variables live on
    bounded grids (50 x 11), so concordant/discordant pair counts come
    from the 550-cell JOINT histogram crossed with itself (~302k cell
    pairs — constant in corpus size, each contributing c_a * c_b).

    Every aggregate is an exact int64 (P, Q, tie corrections, N0); the
    final quotient runs on doubles cast from identical integers in
    both engines, one 6-dp floor.  Scale shape: ONE partial-agg
    shuffle to the joint grid, a grid x grid broadcast join, and two
    tiny tie rollups — O(n) + O(grid²), versus the textbook O(n²)
    pair scan."""
    apply_runtime_conf(spark)
    # off-int64-grid observations excluded (extremes r11 wave 2: the
    # exact cast raises in both engines); NULLs keep their established
    # behavior (they drop at the rank join / grid group)
    _lim = F.lit(9.223372036854776e18)
    grid_ok = (
        F.col("l_quantity").isNull() | (F.abs("l_quantity") < _lim)
    ) & (
        F.col("l_discount").isNull() | (F.abs(F.col("l_discount") * 100) < _lim)
    )
    li = load_table(spark, sf_dir, "lineitem").where(grid_ok)
    base = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    joint = base.groupBy("x", "y").agg(F.count("*").cast("bigint").alias("c"))
    a = joint.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = joint.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    pq = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")),
                F.col("ca") * F.col("cb"),
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("p"),
        F.sum(
            F.when(
                (F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")),
                F.col("ca") * F.col("cb"),
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("q"),
    )
    # n / tie corrections derive from the 550-cell joint histogram,
    # not from three more full passes over the fact table (r14: each
    # re-pass was a fresh scan).  coalesce pins n = 0 on an empty
    # input, matching count(*); the tie rollups aggregate over an
    # empty grid to NULL exactly as the per-row groupBys did.
    n_row = joint.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n")
    )
    tx = (
        joint.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.sum(F.col("cx") * (F.col("cx") - 1) / 2)
            .cast("bigint")
            .alias("n1")
        )
    )
    ty = (
        joint.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.sum(F.col("cy") * (F.col("cy") - 1) / 2)
            .cast("bigint")
            .alias("n2")
        )
    )
    joined = pq.crossJoin(n_row).crossJoin(tx).crossJoin(ty)
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2
    den = (n0 - F.col("n1")) * (n0 - F.col("n2"))
    # NULL for an all-ties variable (den = 0): ANSI Spark would raise
    # DIVIDE_BY_ZERO where DuckDB yields NULL (code-review r6)
    tau = F.when(den > 0, (F.col("p").cast("double") - F.col("q")) / F.sqrt(den))
    return joined.select("n", fround(tau, 6).alias("tau_b"))
