"""Full-registry oracle sweeps over PERTURBED data (round 8).

Builds an sf0.001 replica under one of five perturbation modes and
runs tools/check_oracle.py over EVERY registered id against it:

- ``degenerate``: constant lineitem discount AND quantity (variance
  0), constant event values + a single event class (zero positives),
  one all-zero embedding — the fixture tests/test_degenerate_parity.py
  uses.  Caught four ANSI divide-by-zero / NULL-parity bugs in r8
  (q_pr_auc, q_lift_deciles, q_agg_corr, q_corr_matrix).
- ``nulls``: 2% NULLs injected into o_totalprice, l_discount,
  l_quantity, c_acctbal, events.value, documents.text, and
  embeddings.embedding — columns the seeded driver data NEVER nulls.
  Caught twelve r8 findings: ASC-rank NULL-placement divergence
  (Spark NULLS FIRST vs DuckDB NULLS LAST: q_auc/q_ks_test/
  q_mann_whitney/q_window_dist/q_feature_bins), non-pairwise
  correlation deletion, min_by-vs-arg_min NULL asymmetry (q_ohlc),
  an INVALID_INDEX_OF_ZERO on all-NULL median frames, pandas-UDF
  None crashes across the embedding family, and DuckDB
  list_dot_product NULL/empty-list crashes.
- ``shuffled``: every table rewritten in xxhash64 row order —
  order-independence of every graded output (r8: zero findings).
- ``unitext``: ~30% of documents.text replaced with adversarial
  strings — empty, whitespace-only, CJK, non-BMP emoji, combining
  marks, \\x0B/\\x0C control whitespace, zero-width space, a 5000-char
  token, and Unicode special-casing (Turkish İ, ß).  Caught the
  U+0130 lower() divergence in r8 (Java SpecialCasing expands İ to
  "i"+combining dot, utf8proc maps 1:1 — fixed engine-wide by
  llm/text.portable_lower's simple case fold); \\x0B re-verified the
  documented RE2-vs-Java \\s tokenization rule registry-wide.
- ``extremes`` (round 11): ~3% of events.value, customer.c_acctbal,
  lineitem.l_discount/l_quantity, and orders.o_totalprice (wave 2)
  replaced with a cycling extreme double — ±inf, NaN, ±max-double,
  a denormal, -0.0, and 2.5e13 (a FINITE value above the dp=6
  floor-scaling grid) — plus three poisoned embedding vectors (one
  inf component, one NaN component, one all-1e19 norm-overflow).
  Probes the edges the other four modes never reach: Spark's
  floor(double)->LONG saturation vs DuckDB's double floor (caught
  the fround silent-corruption fix, functions/numeric.py), NaN
  ordering/grouping parity, and aggregate overflow asymmetry
  (DuckDB stddev raises OutOfRange where Spark yields NaN).
- ``temporal`` (round 11): ~2% of events.ts replaced with PAST-side
  extreme timestamps (the TIMESTAMP(NANOS) floor, 1900, a
  negative-epoch value with odd microseconds, epoch zero) — probes
  negative-epoch integer arithmetic, pre-1970 date_trunc/year/week
  logic, sessionization across century gaps, and as-of joins with
  huge deltas.  Future-side extremes are deliberately excluded (see
  EXTREME_TIMESTAMPS).

Each mode must read the SAME pass/rows-only/fail split as the
normal-data sweep (278/10/0 at the r8 registry).

- ``json`` (round 12): ~10% of events.props replaced with a cycling
  adversarial JSON payload (see ADVERSARIAL_PROPS) — malformed docs,
  type-mismatched tokens, integer-boundary values.  Caught/forced the
  q_json_extract try_cast fix and the typed oracle mirrors for all
  three props-consuming ids (q_from_json, q_json_extract,
  q_variant_extract).
- ``nullkeys`` (round 12, the eighth axis): 2% NULLs into KEY/
  DIMENSION columns (see NULLKEY_PLAN) — the r8 ``nulls`` mode only
  nulled VALUE columns.  First run caught SEVEN latent divergences:
  both as-of joins matching NULL = NULL through their window
  partitions, a bare ``(key == lit).cast`` label yielding NULL where
  the oracle CASE yields 0 (q_auc/q_pr_auc), ``.distinct().count()``
  counting the NULL key SQL's count(DISTINCT) ignores
  (q_seq_support), a certificate join-back re-dropping the NULL
  group its own aggregate kept (q_percentile_approx → eqNullSafe),
  the enrich rank dim shifting every rank under ASC NULLS FIRST
  (q_stream_enrich), and a non-nullable grouping-key field crashing
  the Arrow read of applyInPandasWithState output
  (q_stream_stateful_totals).  Pins: tests/test_nullkeys.py.

Each mode must read the SAME pass/rows-only/fail split as the
normal-data sweep.

- ``empty`` (round 13, the ninth axis): every table truncated to
  ZERO rows, schema preserved — the empty-partition/day scenario.
  The r12 probe read 268/7/17; the 17 fixes are catalogued on
  build_empty's docstring and pinned in tests/test_empty_tables.py.
- ``onerow`` (round 13, the tenth axis): every table truncated to
  exactly ONE row — the seam between empty and normal (n-1 = 0
  denominators, single-element windows, degenerate phase splits).
  First run caught q_percentile_approx's fraction-space rank
  certificate being unsatisfiable at n = 1 (fixed to the row-space
  Greenwald-Khanna form; pins in tests/test_onerow.py).
- ``clones`` (round 13, the eleventh axis): every table becomes its
  first row repeated |table| times — maximal duplication, the
  stuck-producer/default-flood feed shape.  First run caught NINE
  divergences in one class (ids assumed unique): equal-id pairs from
  the GEMM index mask, row-vs-entity clustering counts, a lead()
  window fusing duplicate doc_ids, a k² join-back explosion, the
  percent_rank/cume_dist row-position derivation diverging from SQL
  tie semantics, and a constant-group geomean sitting exactly on the
  cent-grid floor boundary.  Pins in tests/test_clones.py.

- ``bigids`` (round 14, the twelfth axis; probed r13): every id
  column shifted by 2^62 (snowflake-scale identifiers).  The r13
  probe read 266/10/16 — int64-overflow crashes in id-hash
  arithmetic (``id * 1000003`` / ``id * 2654435761`` forms), a
  long-sum overflow, and a left-shift ENGINE DIVERGENCE (Spark wraps,
  DuckDB raises).  All sixteen fixed: q_csv_roundtrip in r13's late
  wave; the other fifteen in r14 via the modular pre-reduction
  identity ``((id % M) * K) % M == (id * K) % M``, a DECIMAL(38,0)
  sum, and a mod-2^40 shift-operand bound — every one a paired
  query+oracle edit leaving current-data values bit-identical.
  Pins in tests/test_bigids.py; HANDOFF knowledge #35.
- ``orphans`` (round 14, the thirteenth axis): every ODD foreign-key
  value shifted by +10^9 so it dangles; primary keys stay — the
  late-dim-load / hard-delete / partial-restore feed shape.  A
  divergence would mean an operator baked in referential integrity
  (a join rewrite that only equals the plain join when every fact
  row has a parent).  First full probe read 282/10/0 — the registry
  holds the no-RI-assumption guarantee — and the replica
  demonstrably bites (q_join_inner −50% rows, q_join_anti 0 → 75).
  Pins in tests/test_orphans.py.
- ``hotkey`` (round 14, the fourteenth axis): every ODD foreign-key /
  grouping-key value collapses to its column MINIMUM — one hot key
  owns ~half the rows, the even tail stays unique.  The MIXED-skew
  regime between normal data and the clones extreme: salted joins,
  one-giant-partition windows, hot/cold aggregation, mirrored caps.
  First full probe: 282/10/0 — claimed same-round (zero-failure
  probe).  Pins in tests/test_hotkey.py.

Usage: python tools/degenerate_sweep.py
       [--mode degenerate|nulls|shuffled|unitext|extremes|temporal|
        json|nullkeys|empty|onerow|clones|bigids|orphans|hotkey]
       [--base /root/testdata/sf0.001] [q_name ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_single(df, out: str, t: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/_t")
    part = next(f for f in os.listdir(f"{out}/_t") if f.endswith(".parquet"))
    os.replace(f"{out}/_t/{part}", f"{out}/{t}.parquet")
    shutil.rmtree(f"{out}/_t")


def build_degenerate(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    li = (
        spark.read.parquet(f"{base}/lineitem.parquet")
        .withColumn("l_discount", F.lit(0.05))
        .withColumn("l_quantity", F.lit(7.0))
    )
    _write_single(li, out, "lineitem")
    ev = (
        load_table(spark, base, "events")
        .withColumn("value", F.lit(2.5))
        .withColumn("event_type", F.lit("view"))
    )
    _write_single(ev, out, "events")
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    zero = F.transform(F.col("embedding"), lambda x: x * F.lit(0.0))
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, zero).otherwise(F.col("embedding")),
    )
    _write_single(emb, out, "embeddings")


#: nulls mode: (table, column, hash-selector key columns)
NULL_PLAN = {
    "orders": [("o_totalprice", ["o_orderkey"])],
    "lineitem": [
        ("l_discount", ["l_orderkey", "l_linenumber"]),
        ("l_quantity", ["l_linenumber", "l_orderkey"]),
    ],
    "customer": [("c_acctbal", ["c_custkey"])],
    "events": [("value", ["event_id"])],
    "documents": [("text", ["doc_id"])],
    "embeddings": [("embedding", ["vec_id"])],
}


def build_nulls(spark, base: str, out: str, pct: int = 2) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        for col, keys in NULL_PLAN.get(t, []):
            sel = F.abs(F.hash(*[F.col(k) for k in keys])) % 100 < pct
            df = df.withColumn(
                col, F.when(sel, F.lit(None)).otherwise(F.col(col))
            )
        _write_single(df, out, t)


def build_shuffled(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        _write_single(df.orderBy(F.xxhash64(*df.columns)), out, t)


#: unitext mode: doc_id mod 40 slots 0..13 get these (~35% of docs)
ADVERSARIAL_TEXT = [
    "",
    "   ",
    "café naïve résumé über",
    "é combining acute plus ascii",
    "你好世界 tokens here",
    "emoji \U0001F600 \U0001F680 mixed with words",
    "tab\tseparated\nand\r\nCRLF lines",
    "vertical\x0btab and form\x0cfeed",
    "zero​width​space joined",
    "a" * 5000,
    "word " * 2000,
    "UPPER lower MiXeD İstanbul ß sharp",
    # Greek Final_Sigma probes (r9, advisor): word-final Σ lowers to ς
    # in Java but σ in utf8proc — portable_lower pins Σ → σ pre-fold.
    "ΟΔΟΣ ΣΟΦΙΑΣ οδός με ς literal",
    "σΣ ΣΙΓΜΑ trailing Σ",
]


def build_unitext(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        if t == "documents":
            pick = F.pmod(F.col("doc_id"), F.lit(40)).cast("int")
            expr = F.col("text")
            for i, s in enumerate(ADVERSARIAL_TEXT):
                expr = F.when(pick == i, F.lit(s)).otherwise(expr)
            df = df.withColumn("text", expr)
        _write_single(df, out, t)


#: extremes mode: cycling extreme doubles.  2.5e13 is deliberately a
#: FINITE value above the dp=6 floor-scaling grid (2^63 / 1e6 ≈
#: 9.2e12) — it probes the fround saturation guard without leaving
#: the finite domain.
EXTREME_DOUBLES = [
    float("inf"),
    float("-inf"),
    float("nan"),
    1.7976931348623157e308,
    -1.7976931348623157e308,
    5e-324,
    -0.0,
    2.5e13,
]


def _extreme_expr(col: str, key_cols: list[str], pct: int = 3):
    """~pct% of rows (hash-selected) get a cycling extreme double."""
    from pyspark.sql import functions as F

    h = F.abs(F.hash(*[F.col(k) for k in key_cols]))
    sel = h % 100 < pct
    pick = (h % 1000) % len(EXTREME_DOUBLES)
    expr = F.col(col)
    for i, v in enumerate(EXTREME_DOUBLES):
        expr = F.when(sel & (pick == i), F.lit(v)).otherwise(expr)
    return expr


def build_extremes(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        if t == "events":
            df = df.withColumn("value", _extreme_expr("value", ["event_id"]))
        elif t == "customer":
            df = df.withColumn(
                "c_acctbal", _extreme_expr("c_acctbal", ["c_custkey"])
            )
        elif t == "lineitem":
            # wave 2: the TPC-H money/quantity columns — the fact
            # surface the r11 wave-1 injection never reached
            df = df.withColumn(
                "l_discount",
                _extreme_expr("l_discount", ["l_orderkey", "l_linenumber"]),
            ).withColumn(
                "l_quantity",
                _extreme_expr("l_quantity", ["l_linenumber", "l_orderkey"]),
            )
        elif t == "orders":
            df = df.withColumn(
                "o_totalprice", _extreme_expr("o_totalprice", ["o_orderkey"])
            )
        elif t == "embeddings":
            # embedding is array<float> — cast every injected literal
            # to float so the when() coercion can't widen the array to
            # double and silently change the table schema.  1e19 is
            # finite in float32 (max 3.4e38); its SQUARE only
            # overflows once norms/dot-products accumulate, probing
            # whether both engines do that math at double width.
            inf_f = F.lit(float("inf")).cast("float")
            nan_f = F.lit(float("nan")).cast("float")
            huge_f = F.lit(1e19).cast("float")
            inf_vec = F.transform(
                F.col("embedding"),
                lambda x, i: F.when(i == 0, inf_f).otherwise(x),
            )
            nan_vec = F.transform(
                F.col("embedding"),
                lambda x, i: F.when(i == 1, nan_f).otherwise(x),
            )
            huge_vec = F.transform(F.col("embedding"), lambda x: huge_f)
            # vec_id 1-3 poison the CENTROID side (many ids use
            # vec_id < 8 as centroids/queries); 11/13 poison the
            # POINTS side (vec_id >= 8) so the IVF/kNN candidate
            # paths' array_to_vector guards are exercised too
            # (ADVICE r11).
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") == 1, inf_vec)
                .when(F.col("vec_id") == 2, nan_vec)
                .when(F.col("vec_id") == 3, huge_vec)
                .when(F.col("vec_id") == 11, inf_vec)
                .when(F.col("vec_id") == 13, nan_vec)
                .otherwise(F.col("embedding")),
            )
        _write_single(df, out, t)


#: json mode (round 12, the seventh sweep axis): adversarial
#: events.props payloads — malformed docs, SQL NULL, non-object
#: roots, missing keys, json null, non-integral doubles, quoted /
#: padded / non-numeric strings, booleans, array and object values,
#: int32/int64/uint64 boundary integers, insignificant whitespace,
#: and a case-mismatched key.  Probes every engine asymmetry the r11
#: probe catalogued: DuckDB json_extract RAISES on malformed JSON
#: (Spark yields NULL), DuckDB's JSON->BIGINT cast COERCES
#: ('1.5'->2, '"12"'->12, true->1) where from_json nulls non-integral
#: tokens, get_json_object(...).cast('long') ANSI-crashed on '1.5'
#: (fixed to try_cast this round), and variant bigint TRUNCATES
#: doubles where DuckDB rounds.
#:
#: Deliberately NOT injected (documented irreconcilables):
#: - duplicate keys: Jackson resolves last-wins, yyjson first-wins —
#:   the JSON spec leaves it undefined; there is no portable answer.
#: - integer tokens beyond uint64 (e.g. 20 digits): Jackson parses
#:   BigInteger and get_json_object re-renders the exact digits,
#:   yyjson overflows to double and re-renders '1e+20'-style — the
#:   STRING extraction itself diverges.
#: - large-magnitude double tokens (1e19, 9.5e15): Spark re-renders
#:   '1.0E19' (Java Double.toString), DuckDB '10000000000000000000.0'
#:   — same string-rendering divergence.  Small doubles (1.5, 1e2)
#:   render identically ('1.5', '100.0') and ARE injected.
ADVERSARIAL_PROPS = [
    '{"k": 26',                    # truncated — malformed
    "not json",                    # malformed
    "",                            # empty string — malformed
    None,                          # SQL NULL
    "null",                        # root null
    "[1,2,3]",                     # root array
    "42",                          # root scalar
    "{}",                          # missing key
    '{"other": 3}',                # missing key
    '{"k": null}',                 # json null
    '{"k": 1.5}',                  # non-integral double
    '{"k": -1.5}',
    '{"k": 0.25}',
    '{"k": 1e2}',                  # scientific integral: '100.0' both
    '{"k": "12"}',                 # quoted integer
    '{"k": " 12 "}',               # quoted padded integer (both trim)
    '{"k": "1.5"}',                # quoted decimal
    '{"k": "abc"}',
    '{"k": "0x10"}',               # hex-looking string
    '{"k": true}',
    '{"k": false}',
    '{"k": [1,2]}',                # array value
    '{"k": {"n": 1}}',             # object value (minified identically)
    '{"k": -7}',
    '{"k": 2147483648}',           # int32 max + 1 (INT nulls, LONG ok)
    '{"k": -2147483649}',
    '{"k": 9223372036854775807}',  # int64 max
    '{"k": -9223372036854775808}', # int64 min
    '{"k": 18446744073709551615}', # uint64 max: BIGINT overflow both
    '{"k" :\t 5 }',                # insignificant whitespace
    '{"K": 5}',                    # case-sensitive key miss
]


def build_json(spark, base: str, out: str, pct: int = 10) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        if t == "events":
            h = F.abs(F.hash(F.col("event_id")))
            sel = h % 100 < pct
            pick = (h % 1000) % len(ADVERSARIAL_PROPS)
            expr = F.col("props")
            for i, s in enumerate(ADVERSARIAL_PROPS):
                lit = (
                    F.lit(None).cast("string") if s is None else F.lit(s)
                )
                expr = F.when(sel & (pick == i), lit).otherwise(expr)
            df = df.withColumn("props", expr)
        _write_single(df, out, t)


#: nullkeys mode (round 12, the eighth sweep axis): 2% NULLs into
#: KEY/DIMENSION columns — group-by keys, window partition keys,
#: join keys, filter-predicate columns — which the r8 ``nulls`` mode
#: never touched (it nulls VALUE columns).  The divergence classes it
#: probes: ASC ORDER BY a nullable key (Spark NULLS FIRST vs DuckDB
#: NULLS LAST — shifts row_number/rank and which rows make a LIMIT
#: cut), NULL group keys (both engines keep one NULL group — but
#: first/min_by tiebreaks inside it differ), NULL join keys (inner
#: equi-joins drop them identically; outer joins keep them), and
#: NULL-key string concatenation.  Per-column hash salts decorrelate
#: which rows get nulled across columns of the same table.
NULLKEY_PLAN = {
    "documents": [("source", ["doc_id"]), ("lang", ["doc_id"])],
    "events": [("event_type", ["event_id"]), ("user_id", ["event_id"])],
    "customer": [("c_mktsegment", ["c_custkey"])],
    "orders": [("o_orderpriority", ["o_orderkey"])],
    "lineitem": [("l_returnflag", ["l_orderkey", "l_linenumber"])],
    "part": [("p_brand", ["p_partkey"])],
}


def build_nullkeys(spark, base: str, out: str, pct: int = 2) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        for col, keys in NULLKEY_PLAN.get(t, []):
            sel = (
                F.abs(F.hash(F.lit(col), *[F.col(k) for k in keys])) % 100
                < pct
            )
            df = df.withColumn(
                col, F.when(sel, F.lit(None)).otherwise(F.col(col))
            )
        _write_single(df, out, t)


#: temporal mode: PAST-side timestamp extremes only.  Future
#: outliers (e.g. 2262, the ns-range ceiling) are deliberately NOT
#: injected: a far-future event time legitimately advances a
#: streaming watermark and drops later batches' events — the
#: streamed-equals-batch contract is then undefined BY DESIGN
#: (operator semantics, not an engine divergence), while past
#: extremes arrive in ts order under the two-phase protocol and keep
#: it intact.  Values probe the int96/ns floor, negative-epoch
#: arithmetic (epoch_us < 0; integer div vs floor division), and
#: pre-Gregorian-reform-adjacent date logic.
EXTREME_TIMESTAMPS = [
    "1677-09-22 00:12:44.145224",  # just above the TIMESTAMP(NANOS) floor
    "1900-01-01 00:00:00",
    "1969-07-20 20:17:40.123456",  # negative epoch with odd micros
    "1970-01-01 00:00:00",         # epoch zero
]


def build_temporal(spark, base: str, out: str, pct: int = 2) -> None:
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        if t == "events":
            h = F.abs(F.hash(F.col("event_id")))
            sel = h % 100 < pct
            pick = (h % 1000) % len(EXTREME_TIMESTAMPS)
            expr = F.col("ts")
            for i, s in enumerate(EXTREME_TIMESTAMPS):
                expr = F.when(
                    sel & (pick == i),
                    F.lit(s).cast("timestamp_ntz").cast(dict(df.dtypes)["ts"]),
                ).otherwise(expr)
            df = df.withColumn("ts", expr)
        _write_single(df, out, t)


def build_empty(spark, base: str, out: str) -> None:
    """empty mode (round 13, the NINTH sweep axis): every table
    truncated to ZERO rows, schema preserved (``limit(0)`` per
    table).  A genuinely reachable 100 TB scenario — an empty
    partition/day of a feed — not just an adversarial input.  The
    r12 probe read 268/7/17; round 13 fixed the 17: seven
    streaming-protocol ids NoneType-crashed on all-NULL
    ``agg(min,max)`` bounds (guard: return the batch-shaped empty
    OUTPUT frame, do NOT run the availableNow protocol — an empty
    run writes no epoch dirs and the sink read-back fails on
    schemaless parquet), KMeans/IVF ids crashed on an empty fit,
    q_agg_rollup hit the REAL Spark-vs-SQL divergence (Spark emits
    0 rows for ROLLUP on empty input where SQL emits the global ()
    row — fixed portably by unioning an explicit global aggregate),
    and four scalar-stat ids (NULL-vs-NaN output shape, a None
    best-pair, 1/0).  Pins: tests/test_empty_tables.py."""
    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        _write_single(load_table(spark, base, t).limit(0), out, t)


def _order_cols(df) -> list:
    """The deterministic first-row pick's sort key: only ORDERABLE
    columns (ADVICE r13 — a map column is unorderable in Spark and
    would break the builder at sweep time; maps nested in arrays or
    structs are equally unorderable)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in df.schema.fields if not has_map(f.dataType)]


def build_onerow(spark, base: str, out: str) -> None:
    """onerow mode (round 13 probe, candidate tenth axis): every table
    truncated to exactly ONE row (deterministic: min over a total
    order of the orderable columns, then limit 1).  Probes the seams
    between empty and normal: n-1 = 0 variance/correlation
    denominators, single-element windows/percentiles/medians, one-node
    graphs, single-event streaming protocols (phase split degenerates
    to lo == hi), and joins whose single rows no longer key-match
    across tables."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        key = _order_cols(df)
        one = df.orderBy(*key) if key else df
        _write_single(one.limit(1), out, t)


def build_clones(spark, base: str, out: str) -> None:
    """clones mode (round 13, the ELEVENTH axis): every table becomes
    its FIRST row (min over a total column order) repeated |table|
    times — maximal duplication, the stuck-producer
    /default-value-flood feed shape.  Probes ties EVERYWHERE (every
    window order is a full tie — outputs must still agree because
    identical rows are interchangeable), duplicate join keys
    (self-joins go quadratic in the clone count), and total dedup
    collapse (one survivor from n inputs).  First run read 273/10/9;
    the nine fixes (all one class — "this id column is unique" baked
    into an operator) are catalogued in HANDOFF round-13 deltas and
    pinned in tests/test_clones.py."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        n = df.count()
        key = _order_cols(df)
        one = (df.orderBy(*key) if key else df).limit(1)
        # collision-proof fan-out column name (ADVICE r13): a source
        # table could legitimately carry a `_k` column
        clones = one.crossJoin(
            spark.range(max(n, 1)).select(F.lit(1).alias("__clone_k"))
        ).drop("__clone_k")
        _write_single(clones.select(*df.columns), out, t)


#: orphans mode (round 14, the thirteenth axis): foreign-key columns
#: only; primary keys stay.  Every odd-valued FK is shifted by +10^9
#: so it references NOTHING — the dangling-pointer feed an
#: at-least-once upstream produces when dim loads lag fact loads (or a
#: parent is hard-deleted).  Both engines see the same broken data, so
#: a divergence means an operator BAKED IN referential integrity — a
#: rewrite (semi-join, bloom, broadcast dedup) that only equals the
#: plain join when every fact row has a parent.  First full run:
#: 282/10/0 (claimed same-round per the r13 onerow/clones precedent —
#: a zero-failure probe needs no fix wave before claiming).
ORPHAN_FK_COLS = {
    "nation": ["n_regionkey"],
    "customer": ["c_nationkey"],
    "supplier": ["s_nationkey"],
    "orders": ["o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}

ORPHAN_SHIFT = 1_000_000_000


def build_orphans(spark, base: str, out: str) -> None:
    """orphans mode: shift ODD foreign-key values by +10^9 (collides
    with no real key at any test SF), leaving primary keys and even
    FKs intact — half of every FK edge dangles.  Referential
    integrity is an ASSUMPTION, not a guarantee, at 100 TB: late dim
    loads, hard deletes, and partial restores all orphan fact rows,
    and an operator that only matches the plain-join semantics when
    every child has a parent is silently wrong on real feeds."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        for c in ORPHAN_FK_COLS.get(t, []):
            df = df.withColumn(
                c,
                F.when(
                    F.col(c) % 2 == 1,
                    F.col(c).cast("long") + F.lit(ORPHAN_SHIFT),
                ).otherwise(F.col(c).cast("long")),
            )
        _write_single(df, out, t)


#: hotkey mode (round 14, the fourteenth axis): every ODD
#: foreign-key / grouping-key value collapses to that column's MINIMUM
#: value — one hot key owns ~half the rows while the even tail stays
#: unique.  The MIXED-skew regime between normal data and the clones
#: extreme (where EVERY row is the same): probes hot/cold interaction
#: — salted-join parity, AQE skew handling, windows whose one
#: partition dwarfs the rest, caps (hot-hub, stop-shingle) that must
#: be mirrored between query and oracle to stay hash-equal.
HOTKEY_COLS = {
    "nation": ["n_regionkey"],
    "customer": ["c_nationkey"],
    "supplier": ["s_nationkey"],
    "orders": ["o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id"],
}


def build_hotkey(spark, base: str, out: str) -> None:
    """hotkey mode: odd key values collapse to the column min — a
    50%-hot-key feed (one celebrity user, one boilerplate order, one
    dominant part), the skew shape every real 100 TB corpus has
    somewhere.  Both engines see identical data; a divergence means a
    query-side cap/rewrite is not mirrored in its oracle, or an
    operator's tie/skew handling departs from SQL semantics."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        for c in HOTKEY_COLS.get(t, []):
            mn = df.agg(F.min(c)).collect()[0][0]
            if mn is None:
                continue
            df = df.withColumn(
                c,
                F.when(F.col(c) % 2 == 1, F.lit(mn).cast("long")).otherwise(
                    F.col(c).cast("long")
                ),
            )
        _write_single(df, out, t)


#: bigids mode: every id/key column shifted into the high int64 range
#: by ONE consistent affine map (id + 2^62), preserving uniqueness,
#: ordering, and every cross-table join.  l_linenumber (a small
#: per-order ordinal, not an entity id) stays.
BIGID_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

BIGID_SHIFT = 1 << 62


def build_bigids(spark, base: str, out: str) -> None:
    """bigids mode (round 14, the twelfth axis; probed r13):
    snowflake-scale identifiers — every id column shifted by 2^62 so
    ids sit where real 100 TB systems put them (time-sortable
    64-bit ids), instead of the generator's small sequential range.
    Probes int64-overflow seams in id arithmetic: a Knuth-style
    ``id * 1000003`` multiplicative hash overflows int64 (ANSI Spark
    raises ARITHMETIC_OVERFLOW; DuckDB raises Out of Range) the
    moment ids are realistic, and modulo/shift identities that held
    for small positive ids may not survive the magnitude."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.io import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, base, t)
        for c in BIGID_COLS.get(t, []):
            df = df.withColumn(
                c, (F.col(c).cast("long") + F.lit(BIGID_SHIFT)).alias(c)
            )
        _write_single(df, out, t)


BUILDERS = {
    "degenerate": build_degenerate,
    "nulls": build_nulls,
    "shuffled": build_shuffled,
    "unitext": build_unitext,
    "extremes": build_extremes,
    "temporal": build_temporal,
    "json": build_json,
    "nullkeys": build_nullkeys,
    "empty": build_empty,
    "onerow": build_onerow,
    "clones": build_clones,
    "bigids": build_bigids,
    "orphans": build_orphans,
    "hotkey": build_hotkey,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="degenerate", choices=sorted(BUILDERS))
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="compose with the SESSION axis: run the perturbed replica "
        "through check_oracle --hostile (r14; set TZ in the env too)",
    )
    ap.add_argument("names", nargs="*", help="query ids (default: all)")
    args = ap.parse_args()
    d = tempfile.mkdtemp(prefix=f"spark_graft_{args.mode}_sweep_")
    try:
        from etl_caltopo_spark.session import build_spark

        spark = build_spark(app_name=f"build-{args.mode}")
        BUILDERS[args.mode](spark, args.base, d)
        spark.stop()
        cmd = [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "check_oracle.py"),
            "--sf",
            d,
            *(["--hostile"] if args.hostile else []),
            *args.names,
        ]
        return subprocess.call(cmd)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
