"""Filters, projections, casts, conditionals, scalar functions.

These generalize the reference's per-feature transform stage
(/root/reference/task.ts:93-140): predicate filters (task.ts:94,99),
struct restructuring (task.ts:102-110), rename+cast (task.ts:113),
null-defaulting (task.ts:114), conditional column copies
(task.ts:116-121), constants (task.ts:128), type dispatch
(task.ts:129-130), string concat + literal inject (task.ts:132-136),
coordinate-array truncation (task.ts:124-126), and the JSON envelope
decode (task.ts:71-88).

Every expression here is a Catalyst builtin — whole-stage-codegen'd,
filter-pushdown- and column-pruning-eligible.  No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround, sql_fround
from etl_caltopo_spark.functions.temporal import date_epoch_seconds
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_from_json",
    oracle="""
    -- mirror of Spark's from_json('k INT') on ADVERSARIAL input
    -- (json sweep r12): k is non-NULL only for a well-formed doc
    -- whose $.k is an INTEGER TOKEN within int32 range.  json_valid
    -- guards DuckDB's json_extract (it RAISES on malformed JSON where
    -- from_json yields NULL); the json_type IN (BIGINT, UBIGINT) arm
    -- excludes double/string/bool/array/object tokens (DuckDB's
    -- JSON->INT cast COERCES '1.5'->2, '"12"'->12, true->1 where
    -- Jackson nulls them); the HUGEINT range guard excludes integer
    -- tokens past int32 (uint64-max is a valid UBIGINT token).  All
    -- guards are no-ops on the seeded {"k": <small int>} data.
    SELECT event_id,
           CASE WHEN json_valid(props)
                     AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     AND TRY_CAST(json_extract(props, '$.k') AS HUGEINT)
                         BETWEEN -2147483648 AND 2147483647
                THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k
    FROM events
    """,
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON decode (ref task.ts:71-88): from_json with a declared
    schema, then nested-field extraction (the q_explode analog —
    task.ts:92 — folded in per SURVEY §2.1 R4).  PERMISSIVE-mode
    from_json nulls malformed docs and non-int-token fields; the
    oracle mirrors that domain explicitly (json sweep r12)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@query(
    "q_filter_class",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def q_filter_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-predicate partition of rows (ref task.ts:93-96: the
    `class === 'Folder'` dimension split).  Pushed down to parquet."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


@query(
    "q_filter_notnull",
    oracle="""
    SELECT event_id, value AS v
    FROM events
    WHERE value > 0.25
    """,
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NOT NULL drop (ref task.ts:97-100: null-geometry features
    removed).  Nulls are manufactured with when() since the synthetic
    tables are dense; the oracle states the equivalent predicate."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    nulled = ev.select(
        "event_id",
        F.when(F.col("value") > 0.25, F.col("value")).alias("v"),
    )
    return nulled.filter(F.col("v").isNotNull())


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20
           AND l_returnflag IN ('A', 'R')
           AND NOT (l_linestatus = 'F'))
       OR l_extendedprice < 1500.0
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates: AND/OR/NOT, BETWEEN, IN ([EXT] completion of
    the reference's single-predicate filters, SURVEY §2.3)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "F")
    ) | (F.col("l_extendedprice") < 1500.0)
    return li.filter(pred).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "q_project_struct",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total
    FROM orders
    """,
)
def q_project_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restructure under a nested struct and extract back out (ref
    task.ts:102-110: properties wrapped under properties.metadata)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        ).alias("meta"),
    )
    return nested.select(
        "o_orderkey",
        F.col("meta.status").alias("status"),
        F.col("meta.total").alias("total"),
    )


@query(
    "q_cast_rename",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS custkey_str,
           CAST(c_nationkey AS BIGINT) AS nationkey_long,
           c_name AS callsign
    FROM customer
    """,
)
def q_cast_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename + cast (ref task.ts:113: `callsign = String(title)`)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").cast("string").alias("custkey_str"),
        F.col("c_nationkey").cast("long").alias("nationkey_long"),
        F.col("c_name").alias("callsign"),
    )


@query(
    "q_coalesce_default",
    oracle="""
    SELECT o_orderkey,
           coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END, '') AS remarks
    FROM orders
    """,
)
def q_coalesce_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-defaulting (ref task.ts:114: `remarks = description ? ... : ''`,
    quirk Q2 resolved to isNotNull semantics per SURVEY §1.5)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.when(F.col("o_orderstatus") != "O", F.col("o_orderstatus")),
            F.lit(""),
        ).alias("remarks"),
    )


@query(
    "q_conditional_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05
                THEN floor(l_extendedprice * (1 - l_discount) * 100) / 100
                ELSE floor(l_extendedprice * 100) / 100 END AS effective_price,
           CASE WHEN l_tax IS NOT NULL THEN CAST(l_tax AS VARCHAR) END AS tax_str
    FROM lineitem
    """,
)
def q_conditional_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional column copies with casts (ref task.ts:116-121: style
    fields copied when present, String()/Number() casts)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_discount") > 0.05,
            fround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2),
        )
        .otherwise(fround(F.col("l_extendedprice"), 2))
        .alias("effective_price"),
        F.when(F.col("l_tax").isNotNull(), F.col("l_tax").cast("string")).alias("tax_str"),
    )


@query(
    "q_lit_const",
    oracle="""
    SELECT o_orderkey, TRUE AS archived, 'etl-caltopo-spark' AS source_tag
    FROM orders
    """,
)
def q_lit_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant columns (ref task.ts:128: `archived = true`)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.lit(True).alias("archived"),
        F.lit("etl-caltopo-spark").alias("source_tag"),
    )


@query(
    "q_when_dispatch",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 'u-d-p'
                WHEN event_type = 'click' THEN 'u-d-c'
                ELSE 'u-d' END AS cot_type
    FROM events
    """,
)
def q_when_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-dispatch conditional (ref task.ts:129-130: Point features
    get `type='u-d-p'`)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("u-d-p"))
        .when(F.col("event_type") == "click", F.lit("u-d-c"))
        .otherwise(F.lit("u-d"))
        .alias("cot_type"),
    )


@query(
    "q_concat_prefix",
    oracle="""
    SELECT c_custkey,
           '#' || c_name AS tagged_name,
           '/' || c_mktsegment AS path
    FROM customer
    """,
)
def q_concat_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concat with literal prefix (ref task.ts:133 `#`-prefix of
    marker-color; task.ts:147 `'/' + folder.title` path derivation)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(F.lit("#"), F.col("c_name")).alias("tagged_name"),
        F.concat(F.lit("/"), F.col("c_mktsegment")).alias("path"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substring(c_name, 1, 8) AS prefix8,
           CAST(length(c_name) AS INTEGER) AS name_len,
           split_part(c_name, '#', 2) AS name_num,
           trim('  ' || c_name || '  ') AS trimmed
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family ([EXT] completion, SURVEY §2.3)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").alias("name_len"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_num"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 + l_tax) * 100) / 100 AS gross,
           floor(abs(l_discount - 0.05) * 10000) / 10000 AS disc_dev,
           CASE WHEN abs(l_quantity) < 9.223372036854776e18
                THEN CAST(ceil(l_quantity) AS BIGINT) END AS qty_ceil,
           CASE WHEN abs(l_quantity) < 9.223372036854776e18
                THEN CAST(floor(l_quantity) AS BIGINT) END AS qty_floor,
           floor(sqrt(l_extendedprice) * 10000) / 10000 AS price_sqrt,
           floor(ln(l_extendedprice + 1) * 10000) / 10000 AS price_ln
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family ([EXT] completion, SURVEY §2.3).

    qty_ceil/qty_floor are int64 by contract, so an off-grid quantity
    (NaN/±inf/|q| ≥ 2^63 — extremes r11 wave 2: Spark's long
    ceil/floor saturate silently where DuckDB's cast raises) yields
    NULL on both engines; disc_dev rides fround's guarded grid
    (inf/NaN propagate identically)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    qty_ok = F.abs(F.col("l_quantity")) < F.lit(9.223372036854776e18)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fround(F.col("l_extendedprice") * (1 + F.col("l_tax")), 2).alias("gross"),
        fround(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.when(qty_ok, F.ceil("l_quantity")).alias("qty_ceil"),
        F.when(qty_ok, F.floor("l_quantity")).alias("qty_floor"),
        fround(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        fround(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (the reference carries epoch-millis ints,
    task.ts:23,73,84; converted at the edge per SURVEY §1.3).

    month_start is emitted as TIMESTAMP_NTZ (hostile-session probe
    r14): Spark's date_trunc returns the LTZ timestamp type, whose
    COLLECTED value renders in the driver Python process's local
    timezone — a non-UTC driver would read 1996-12-31 17:00 for the
    UTC wall-clock 1997-01-01.  NTZ is the engine-wide canonical
    temporal type (io.py) and collects timezone-free."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        date_epoch_seconds("o_orderdate").alias("epoch_s"),
    )


@query(
    "q_json_extract",
    oracle="""
    -- json sweep r12: json_valid guards DuckDB's raising json_extract
    -- (get_json_object yields NULL on malformed input); k_int mirrors
    -- Spark's STRING->BIGINT try_cast grammar (optional sign + digits,
    -- trimmed) — DuckDB's own TRY_CAST would coerce '1.5'->2 and
    -- '100.0'->100 where Spark nulls both.  TRY_CAST still guards the
    -- int64 range (uint64-max digits pass the regexp but overflow).
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CASE WHEN json_valid(props)
                     AND regexp_matches(
                         trim(json_extract_string(props, '$.k')),
                         '^[+-]?[0-9]+$')
                THEN TRY_CAST(trim(json_extract_string(props, '$.k'))
                              AS BIGINT) END AS k_int
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (ref task.ts:71-88 envelope fields).

    k_int uses ``try_cast`` (json sweep r12): the bare ``cast("long")``
    ANSI-RAISES the whole query on the first non-integral token a
    100 TB props column inevitably contains ('1.5', 'true',
    '18446744073709551615') — a latent crash the adversarial sweep
    promoted to a fix.  try_cast nulls them, matching the oracle's
    integer-grammar mirror."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").try_cast("long").alias("k_int"),
    )


@query(
    "q_map_ops",
    oracle="""
    -- semantic equivalent of: build map{qty,price}, drop 'qty' key,
    -- read back 'price' (ref task.ts:90,134,145: folder map build,
    -- marker-color key delete, folder lookup)
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS price_from_map,
           CAST(1 AS INTEGER) AS n_keys_left
    FROM lineitem
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build / key-filter / lookup (ref task.ts:90 folders map,
    task.ts:134 key delete, task.ts:145 lookup).  The map is built and
    consumed inside the query; the output is scalar so the oracle can
    hash it."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    with_map = li.select(
        "l_orderkey",
        "l_linenumber",
        F.create_map(
            F.lit("qty"), F.col("l_quantity"),
            F.lit("price"), F.col("l_extendedprice"),
        ).alias("m"),
    )
    filtered = with_map.select(
        "l_orderkey",
        "l_linenumber",
        F.map_filter("m", lambda k, v: k != F.lit("qty")).alias("m"),
    )
    return filtered.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at("m", "price").alias("price_from_map"),
        F.size(F.map_keys("m")).alias("n_keys_left"),
    )


@query(
    "q_array_slice",
    oracle=f"""
    SELECT vec_id,
           {sql_fround("CAST(embedding[1] AS DOUBLE)", 4)} AS e0,
           {sql_fround("CAST(embedding[2] AS DOUBLE)", 4)} AS e1,
           {sql_fround("CAST(embedding[3] AS DOUBLE)", 4)} AS e2,
           CASE WHEN embedding IS NULL THEN NULL
                ELSE CAST(3 AS INTEGER) END AS head_len
    FROM embeddings
    """,
)
def q_array_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice + per-element transform (ref task.ts:124-126:
    every coordinate position truncated to <=3 elements, quirk Q4).
    slice/transform stay in codegen; output is flattened to scalars so
    the oracle hash is float-repr-stable.  Rounding is fround (floor-
    scaling), NOT bare round(): Spark and DuckDB round() diverge on
    4-dp half-boundary doubles, so bare round's hash-parity held only
    because the pinned seed=42 data happened to contain no boundary
    value (r7 watch item; migrated as one paired edit in r8 —
    tests/test_round8.py pins the half-boundary policy)."""
    apply_runtime_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    head = emb.select(
        "vec_id",
        F.transform(
            F.slice("embedding", 1, 3), lambda x: fround(x.cast("double"), 4)
        ).alias("head3"),
    )
    return head.select(
        "vec_id",
        F.element_at("head3", 1).alias("e0"),
        F.element_at("head3", 2).alias("e1"),
        F.element_at("head3", 3).alias("e2"),
        F.size("head3").alias("head_len"),
    )
