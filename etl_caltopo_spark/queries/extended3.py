"""Third extended wave: positional explode, series generation, RANGE
window frames, map higher-order functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.temporal import epoch_day
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_posexplode",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           words[CAST(t.i AS INTEGER)] AS word,
           CAST(t.i - 1 AS INTEGER) AS pos
    FROM w, unnest(generate_series(1, len(words))) AS t(i)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY; Spark pos is
    0-based, the oracle shifts DuckDB's 1-based ordinal)."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
    ).select("p_partkey", "word", "pos")


@query(
    "q_generate_series",
    oracle="""
    SELECT o.o_orderkey,
           CAST(t.m AS INTEGER) AS installment,
           floor(o.o_totalprice / 3 * 100) / 100 AS installment_amt
    FROM (SELECT * FROM orders WHERE o_orderkey % 100 = 0) o,
         unnest(generate_series(1, 3)) AS t(m)
    """,
)
def q_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: explode a generated sequence per row (payment
    installments shape)."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("installment"),
        (F.floor(F.col("o_totalprice") / 3 * 100) / 100).alias("installment_amt"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               RANGE BETWEEN 7 PRECEDING AND CURRENT ROW), 2) AS spend_7d
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: trailing-7-day spend per customer.  The
    order key is epoch-days so the RANGE offset is a plain integer in
    both engines; sum recovers the 2-dp grid exactly."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    day = epoch_day("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-7, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_7d"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide columns to (metric, value) long format
    (the oracle is the equivalent UNION ALL)."""
    apply_runtime_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return cust.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT c.c_custkey, t.max_order, t.n_big
    FROM customer c,
         LATERAL (
             SELECT max(o.o_totalprice) AS max_order,
                    CAST(count(*) FILTER (o.o_totalprice > 50000) AS BIGINT) AS n_big
             FROM orders o WHERE o.o_custkey = c.c_custkey
         ) t
    WHERE t.max_order IS NOT NULL
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Catalyst de-correlates it to an
    aggregate + join — same plan as the manual formulation)."""
    apply_runtime_conf(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.max_order, t.n_big
        FROM customer c,
             LATERAL (
                 SELECT max(o.o_totalprice) AS max_order,
                        count_if(o.o_totalprice > 50000) AS n_big
                 FROM orders o WHERE o.o_custkey = c.c_custkey
             ) t
        WHERE t.max_order IS NOT NULL
        """
    )


@query(
    "q_map_higher",
    oracle="""
    -- semantic equivalent of: build map{qty,price}, double every
    -- value (transform_values), uppercase keys (transform_keys),
    -- read back via map_zip_with-combined lookup
    SELECT l_orderkey, l_linenumber,
           l_quantity * 2 AS qty_doubled,
           l_extendedprice * 2 AS price_doubled,
           CAST(2 AS INTEGER) AS n_entries
    FROM lineitem
    """,
)
def q_map_higher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_keys / transform_values /
    map_zip_with, consumed back to scalars so the oracle can hash.
    fan_out first (r14): the map HOFs are interpreted CodegenFallback
    expressions and a one-row-group source ran all 600k rows on ~3
    scan tasks (measured 2.3 s CPU; no-op at scale)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.io import fan_out

    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    )
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("price"), F.col("l_extendedprice")
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    upper = F.transform_keys(doubled, lambda k, v: F.upper(k))
    zipped = F.map_zip_with(doubled, doubled, lambda k, v1, v2: v1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(zipped, "qty").alias("qty_doubled"),
        F.element_at(upper, "PRICE").alias("price_doubled"),
        F.size(F.map_keys(upper)).alias("n_entries"),
    )


@query(
    "q_variant_extract",
    oracle="""
    -- json sweep r12: mirror of try_variant_get(.., 'bigint') on
    -- adversarial tokens.  The variant bigint cast TRUNCATES doubles
    -- toward zero (1.5->1, -1.5->-1), maps booleans to 1/0, applies
    -- Spark's integer-only string grammar to VARCHAR tokens, and
    -- nulls out-of-range integers — DuckDB's raw JSON->BIGINT cast
    -- ROUNDS doubles and raises on malformed docs, so every arm is
    -- dispatched on json_type under a json_valid guard.  No-op on the
    -- seeded integer-token data.
    WITH k AS (
        SELECT event_type,
               CASE WHEN json_valid(props) THEN
                   CASE json_type(props, '$.k')
                       WHEN 'BIGINT' THEN
                           TRY_CAST(json_extract(props, '$.k') AS BIGINT)
                       WHEN 'UBIGINT' THEN
                           TRY_CAST(json_extract(props, '$.k') AS BIGINT)
                       WHEN 'DOUBLE' THEN
                           TRY_CAST(trunc(TRY_CAST(json_extract(props, '$.k')
                                                   AS DOUBLE)) AS BIGINT)
                       WHEN 'BOOLEAN' THEN
                           CASE WHEN json_extract_string(props, '$.k') = 'true'
                                THEN 1 ELSE 0 END
                       WHEN 'VARCHAR' THEN
                           CASE WHEN regexp_matches(
                                    trim(json_extract_string(props, '$.k')),
                                    '^[+-]?[0-9]+$')
                                THEN TRY_CAST(
                                    trim(json_extract_string(props, '$.k'))
                                    AS BIGINT) END
                   END
               END AS k
        FROM events
    )
    SELECT event_type,
           CAST(sum(k) AS DECIMAL(38, 0)) AS sum_k,
           CAST(count(*) AS BIGINT) AS n_events
    FROM k
    GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VariantType path (Spark 4): parse_json into an
    open binary-encoded variant, variant_get typed extraction, then a
    relational aggregate over the extracted value.  Unlike
    get_json_object (per-access string re-parse), the variant encodes
    once and every subsequent access is a binary probe — the difference
    between O(accesses x parse) and O(parse) on a 100 TB scan.

    try_parse_json (json sweep r12): the bare parse_json RAISES
    MALFORMED_RECORD_IN_PARSING on the first truncated/non-JSON doc;
    the try_ form nulls it, and try_variant_get of a NULL variant is
    NULL — matching the oracle's json_valid guard.

    The sum runs in DECIMAL(38,0), not BIGINT (json sweep r12): a
    single int64-boundary token makes the exact group sum
    unrepresentable in 64 bits — Spark's long sum ANSI-raises
    ARITHMETIC_OVERFLOW where DuckDB silently widens to HUGEINT.
    Decimal sums are exact on both engines to 38 digits (10^19 rows
    of int64-max values away — unreachable at any physical scale),
    so this is also the correct 100 TB aggregate type, not just an
    adversarial-input guard."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(
                F.try_parse_json(F.col("props")), "$.k", "bigint"
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("k").cast("decimal(38,0)")).alias("sum_k"),
            F.count("*").alias("n_events"),
        )
    )
