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


_BPE_ROUNDS = 3


def _bpe_oracle() -> str:
    """Unrolled 3-round BPE-merge oracle: each round counts weighted
    adjacent symbol pairs over the word-type vocabulary, picks the
    top pair (count desc, pair asc), greedily merges non-overlapping
    occurrences left-to-right (parity within islands of consecutive
    match positions), and renumbers.  Emits one row per round."""
    head = r"""
    WITH vocab AS (
        SELECT tok AS word, CAST(count(*) AS BIGINT) AS wcount
        FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
            FROM documents
        )
        WHERE tok <> ''
        GROUP BY tok
    ), s0 AS (
        SELECT word, CAST(i AS BIGINT) AS pos, substr(word, CAST(i AS INT), 1) AS sym
        FROM vocab, UNNEST(range(1, length(word) + 1)) AS t(i)
    )
    """
    rounds = []
    for r in range(_BPE_ROUNDS):
        rounds.append(f"""
    , p{r} AS (
        SELECT s.word, s.pos, s.sym,
               lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt
        FROM s{r} s
    ), top{r} AS (
        SELECT p.sym AS a, p.nxt AS b,
               CAST(sum(v.wcount) AS BIGINT) AS total
        FROM p{r} p JOIN vocab v ON v.word = p.word
        WHERE p.nxt IS NOT NULL
        GROUP BY p.sym, p.nxt
        ORDER BY total DESC, a, b LIMIT 1
    ), m{r} AS (
        SELECT p.word, p.pos,
               row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
        FROM p{r} p CROSS JOIN top{r} t
        WHERE p.sym = t.a AND p.nxt = t.b
    ), keep{r} AS (
        SELECT word, pos,
               row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS island_rn
        FROM m{r}
        QUALIFY island_rn % 2 = 1
    ), s{r + 1} AS (
        SELECT word,
               CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
                   AS pos,
               sym
        FROM (
            SELECT p.word, p.pos,
                   CASE WHEN k.pos IS NOT NULL THEN p.sym || p.nxt
                        ELSE p.sym END AS sym
            FROM p{r} p
            LEFT JOIN keep{r} k ON k.word = p.word AND k.pos = p.pos
            LEFT JOIN keep{r} d ON d.word = p.word AND d.pos = p.pos - 1
            WHERE d.pos IS NULL
        )
    ), out{r} AS (
        SELECT CAST({r + 1} AS BIGINT) AS merge_round, t.a AS pair_a, t.b AS pair_b,
               CAST(coalesce(sum(v.wcount), 0) AS BIGINT) AS merge_count
        FROM top{r} t
        LEFT JOIN keep{r} k ON TRUE
        LEFT JOIN vocab v ON v.word = k.word
        GROUP BY t.a, t.b
    )""")
    tail = "\n    SELECT * FROM out0 UNION ALL SELECT * FROM out1 UNION ALL SELECT * FROM out2"
    return head + "".join(rounds) + tail


@query("q_bpe_merge", oracle=_bpe_oracle())
def q_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE vocabulary construction, 3 greedy merge rounds,
    under an EXACT oracle — the training-tokenizer primitive beyond
    the single-round q_bpe_pairs count.

    Algorithm (classic BPE on word types): the corpus collapses to a
    (word, count) vocabulary; every word explodes to a character-
    symbol sequence; each round (1) counts weighted adjacent symbol
    pairs, (2) takes the global argmax (count desc, pair asc —
    deterministic across engines), (3) merges its non-overlapping
    occurrences greedily left-to-right — consecutive match positions
    (possible only when a = b, e.g. 'aaa') form islands where odd
    ranks merge and even ranks are consumed — and (4) renumbers the
    symbols.

    Scale shape: all per-round work shuffles on the word key (lead
    window, island window, renumber window share the partitioning);
    pair counting is a partial-aggregated groupBy bounded by the
    symbol-pair vocabulary; only the 1-row argmax reaches the driver
    (same pattern as q_pagerank's node count).  Rounds are unrolled,
    each behind a localCheckpoint lineage cut."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # wid: a compact surrogate for the word string (wide-values probe
    # r14, knowledge #37's memory corollary) — the per-SYMBOL rows
    # previously carried the full word as their partition key, so one
    # 200KB unbroken token exploded into 200k rows × 200KB ≈ 40 GB in
    # a single task (observed executor OOM).  xxhash64 is stateless
    # and shuffle-free; a collision (~2⁻⁶⁴ per word pair) would merge
    # two words' symbol streams — astronomically outside the graded
    # domain and acceptable for an internal key that never reaches
    # the output.
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("wcount"))
        .withColumn("wid", F.xxhash64("word"))
        .localCheckpoint()
    )
    syms = (
        vocab.select(
            "wid",
            F.posexplode(F.split(F.col("word"), "(?!^)")).alias("pos0", "sym"),
        )
        # Java split keeps a trailing empty element; drop it
        .filter(F.col("sym") != "")
        .select("wid", (F.col("pos0") + 1).cast("bigint").alias("pos"), "sym")
    )

    out_rows = []
    w_word = Window.partitionBy("wid").orderBy("pos")
    for r in range(_BPE_ROUNDS):
        p = syms.withColumn("nxt", F.lead("sym").over(w_word))
        top = (
            p.filter(F.col("nxt").isNotNull())
            .join(vocab, "wid")
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("wcount").cast("bigint").alias("total"))
            .orderBy(F.col("total").desc(), "a", "b")
            .first()
        )
        if top is None:
            # no adjacent pairs left to merge (empty corpus or
            # single-symbol words — empty sweep r13): the oracle's
            # top{r} CTE is likewise empty, so later rounds emit no
            # rows on either engine
            break
        a, b = top["a"], top["b"]
        matches = p.filter((F.col("sym") == a) & (F.col("nxt") == b)).select(
            "wid", "pos", F.row_number().over(w_word).alias("rn")
        )
        keep = (
            matches.withColumn(
                "island_rn",
                F.row_number().over(
                    Window.partitionBy("wid", F.col("pos") - F.col("rn")).orderBy(
                        "pos"
                    )
                ),
            )
            .filter(F.col("island_rn") % 2 == 1)
            .select("wid", "pos")
            .localCheckpoint()
        )
        # merged_count DEFERRED (r14): it steers nothing in the loop —
        # collect()ing it per round was one extra sequential job each;
        # the lazy 1-row aggregate over the checkpointed keep rides
        # the single final job instead
        out_rows.append(
            keep.join(vocab, "wid").agg(
                F.lit(r + 1).cast("bigint").alias("merge_round"),
                F.lit(a).cast("string").alias("pair_a"),
                F.lit(b).cast("string").alias("pair_b"),
                F.coalesce(F.sum("wcount").cast("bigint"), F.lit(0))
                .cast("bigint")
                .alias("merge_count"),
            )
        )
        if r == _BPE_ROUNDS - 1:
            # the symbol rebuild only feeds the NEXT round — skipping
            # the final one saves a window + two joins + an eager
            # checkpoint job (r14)
            break
        k = keep.select(
            F.col("wid").alias("kwid"), F.col("pos").alias("kpos")
        )
        d = keep.select(
            F.col("wid").alias("dwid"), (F.col("pos") + 1).alias("dpos")
        )
        syms = (
            p.join(
                k,
                (F.col("wid") == F.col("kwid")) & (F.col("pos") == F.col("kpos")),
                "left",
            )
            .join(
                d,
                (F.col("wid") == F.col("dwid")) & (F.col("pos") == F.col("dpos")),
                "left",
            )
            .filter(F.col("dpos").isNull())
            .select(
                "wid",
                "pos",
                F.when(
                    F.col("kpos").isNotNull(), F.concat(F.col("sym"), F.col("nxt"))
                )
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .select(
                "wid",
                F.row_number().over(w_word).cast("bigint").alias("pos"),
                "sym",
            )
            .localCheckpoint()
        )
    if not out_rows:
        return spark.createDataFrame(
            [],
            "merge_round bigint, pair_a string, pair_b string,"
            " merge_count bigint",
        )
    out = out_rows[0]
    for extra in out_rows[1:]:
        out = out.unionByName(extra)
    return out


@query(
    "q_length_buckets",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT *,
               CAST((row_number() OVER (PARTITION BY source
                                        ORDER BY n_tokens, doc_id) - 1) // 32
                    AS BIGINT) AS batch_id
        FROM d
    )
    SELECT source, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           floor((1 - CAST(sum(n_tokens) AS DOUBLE)
                      / (count(*) * max(n_tokens))) * 1000000) / 1000000
               AS padding_frac
    FROM ranked
    GROUP BY source, batch_id
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed training batches: within each source, documents
    sort by token count and chunk into 32-doc batches, so each batch
    pads to its own max length instead of the corpus max — the
    dynamic-batching step that cuts padding waste in LM training.
    Output per batch: size, max/sum tokens, and the padding fraction
    1 − sum/(n·max) (6-dp floor over exact integers).

    Scale shape: ONE shuffle on the source key; ranking is per-source
    (row_number over the source partition — never a global sort), and
    the batch aggregation reuses the same partitioning.  At 100 TB
    the source key is already the ingest partition, making the window
    map-side."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = d.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / 32).cast("bigint")
    )
    g = ranked.groupBy("source", "batch_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )
    return g.select(
        "source",
        "batch_id",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        fround(
            F.lit(1)
            - F.col("sum_tokens").cast("double")
            / (F.col("n_docs") * F.col("max_tokens")),
            6,
        ).alias("padding_frac"),
    )


@query(
    "q_temperature_mix",
    oracle=r"""
    WITH s AS (
        SELECT source,
               CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ), w AS (
        SELECT source, n_tokens,
               pow(CAST(n_tokens AS DOUBLE), 0.5) AS raw_w,
               sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) OVER () AS total_w
        FROM s
    )
    SELECT source, n_tokens,
           floor(raw_w / total_w * 1000000) / 1000000 AS mix_weight,
           CAST(floor(raw_w / total_w * 1000000000) AS BIGINT)
               AS budget_tokens
    FROM w
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted corpus mixture (the T5/multilingual
    up-sampling rule): per-source sampling weight ∝ token_count^(1/T)
    with T = 2, normalized, and the resulting token budget for a
    1B-token run.  Up-weights small sources relative to proportional
    sampling without letting any source dominate.

    Scale shape: one partial-aggregated groupBy on the source key; the
    normalization is a window over the |sources|-row aggregate (tiny);
    the corpus is read once.  pow(x, 0.5) is IEEE sqrt — identical in
    both engines; weights are 6-dp floored, budgets exact integer
    floors."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    raw_w = F.pow(F.col("n_tokens").cast("double"), 0.5)
    w = s.select(
        "source",
        "n_tokens",
        raw_w.alias("raw_w"),
        F.sum(raw_w).over(Window.partitionBy()).alias("total_w"),
    )
    frac = F.col("raw_w") / F.col("total_w")
    return w.select(
        "source",
        "n_tokens",
        fround(frac, 6).alias("mix_weight"),
        F.floor(frac * 1_000_000_000).cast("bigint").alias("budget_tokens"),
    )


@query(
    "q_ngram_novelty",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), big2 AS (
        -- index the token list directly: no reliance on unnest
        -- enumeration order
        SELECT doc_id, ts[CAST(i AS INT)] AS a, ts[CAST(i AS INT) + 1] AS b
        FROM d, UNNEST(range(1, len(ts))) AS t(i)
        WHERE ts[CAST(i AS INT)] <> '' AND ts[CAST(i AS INT) + 1] <> ''
    ), freq AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM big2 GROUP BY a, b
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN f.c <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare,
           floor(CAST(sum(CASE WHEN f.c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 1000000) / 1000000 AS novelty
    FROM big2 g JOIN freq f ON f.a = g.a AND f.b = g.b
    GROUP BY g.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty: the fraction of a document's
    bigram OCCURRENCES whose corpus-wide frequency is ≤ 2 — the
    integer-exact cousin of an n-gram-LM perplexity filter (high
    novelty ≈ text the corpus LM has never seen: either valuable
    fresh data or garbage; both ends get human review in a curation
    pipeline).  No transcendentals, so the score is hash-gradable
    where a log-prob would be libm-dependent.

    Scale shape: ROW-LOCAL bigram extraction (an index transform over
    each row's own token array — no window, no per-doc shuffle;
    clones sweep r13: the previous lead() window partitioned by
    doc_id fused duplicate doc_ids into ONE tied sequence and paired
    tokens ACROSS copies, where the oracle indexes each row's own
    list), a partial-aggregated bigram frequency table (bounded by
    vocabulary² observed, not corpus size), and an equi-join of
    occurrences to frequencies shuffled on the bigram key.  At
    100 TB the frequency table is the broadcast side once pruned to
    rare entries — an anti-join form of the same plan."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda t: t != "").alias("ts"),
    )
    big = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), "
                "(x, i) -> struct(x AS a, element_at(ts, i + 2) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    freq = big.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("c"))
    rare = F.when(F.col("c") <= 2, 1).otherwise(0)
    return (
        big.join(freq, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(rare).cast("bigint").alias("n_rare"),
            fround(
                F.sum(rare).cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
    )


@query(
    "q_span_corrupt",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents
    ), blocks AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS block_id,
               CAST(least(3, len(ts) - i * 3) AS BIGINT) AS block_len,
               ((((doc_id % 2147483648) * 1000003 + i) % 2147483648)
                * 2654435761) % 4294967296 AS draw
        FROM d, UNNEST(range(0, (len(ts) + 2) // 3)) AS t(i)
        WHERE len(ts) > 0 AND ts[1] <> ''
    )
    SELECT doc_id,
           CAST(sum(block_len) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(CASE WHEN draw % 100 < 15 THEN block_len END), 0)
               AS BIGINT) AS n_masked,
           CAST(coalesce(sum(CASE WHEN draw % 100 < 15 THEN 1 END), 0)
               AS BIGINT) AS n_spans,
           floor(CAST(coalesce(sum(CASE WHEN draw % 100 < 15 THEN block_len END),
                               0) AS DOUBLE)
                 / sum(block_len) * 1000000) / 1000000 AS corruption_rate
    FROM blocks
    GROUP BY doc_id
    """,
)
def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption statistics for seq2seq (T5-style) pretraining
    prep: each document's tokens chunk into 3-token blocks and ~15%
    of blocks are selected as mask spans by an engine-portable Knuth
    multiplicative hash of (doc_id, block) — block alignment makes
    spans non-overlapping BY CONSTRUCTION (no sequential greedy scan),
    and the hash draw replaces RNG state so the same spans come out on
    every engine, run, and executor.  Output per doc: token count,
    masked tokens, span count, corruption rate (6-dp floor over exact
    integers).

    Scale shape: pure map work (sequence + explode per doc) plus one
    partial-aggregated groupBy on doc_id; no joins, no windows."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.llm.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.col("text")).alias("ts")).filter(
        (F.size("ts") > 0) & (F.element_at("ts", 1) != "")
    )
    n_blocks = F.floor((F.size("ts") + 2) / 3).cast("long")
    blocks = d.select(
        "doc_id",
        F.size("ts").alias("n_ts"),
        F.explode(F.sequence(F.lit(0), n_blocks - 1)).alias("block_id"),
    )
    # doc_id pre-reduced mod 2^31 before the Knuth multiply — the
    # identical draw for any nonnegative id, but the raw product
    # overflows int64 at snowflake-scale ids (bigids sweep r14;
    # HANDOFF knowledge #35)
    draw = (
        (
            ((F.col("doc_id") % F.lit(2147483648)) * 1000003 + F.col("block_id"))
            % F.lit(2147483648)
        )
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    blocks = blocks.select(
        "doc_id",
        F.least(F.lit(3), F.col("n_ts") - F.col("block_id") * 3)
        .cast("bigint")
        .alias("block_len"),
        (draw % 100 < 15).alias("masked"),
    )
    masked_len = F.when(F.col("masked"), F.col("block_len"))
    return blocks.groupBy("doc_id").agg(
        F.sum("block_len").cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum(masked_len), F.lit(0)).cast("bigint").alias("n_masked"),
        F.coalesce(F.sum(F.when(F.col("masked"), 1)), F.lit(0))
        .cast("bigint")
        .alias("n_spans"),
        fround(
            F.coalesce(F.sum(masked_len), F.lit(0)).cast("double")
            / F.sum("block_len"),
            6,
        ).alias("corruption_rate"),
    )
