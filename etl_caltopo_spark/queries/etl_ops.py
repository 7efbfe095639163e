"""ETL-lifecycle queries: CDC merge/upsert, data-quality report,
error-safe (try_*) expressions.

These are the batch-maintenance operators an ETL engine needs around
the reference's fetch-transform-submit loop: applying keyed deltas,
validating content, and surviving dirty values without job failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import (
    bucket_long,
    finite_or_null,
    sql_bucket_long,
)
from etl_caltopo_spark.functions.temporal import epoch_us
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.operators.merge import merge_upsert
from etl_caltopo_spark.operators.quality import quality_report
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_cdc_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
        FROM orders
    ), changes AS (
        SELECT k, CASE WHEN k % 7 = 3 THEN 'D' ELSE 'U' END AS op,
               price + 1000 AS price, status
        FROM base WHERE k % 7 = 3 OR k % 10 = 0
        UNION ALL
        SELECT -k AS k, 'U' AS op, 1.0 AS price, 'N' AS status
        FROM base WHERE k % 13 = 5
    ), merged AS (
        SELECT coalesce(b.k, c.k) AS k,
               CASE WHEN c.op = 'U' THEN c.price ELSE b.price END AS price,
               CASE WHEN c.op = 'U' THEN c.status ELSE b.status END AS status,
               c.op AS op
        FROM base b FULL OUTER JOIN changes c ON b.k = c.k
    )
    SELECT k AS o_orderkey, price AS o_totalprice, status AS o_orderstatus
    FROM merged WHERE op IS NULL OR op <> 'D'
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed CDC merge: updates (+1000 on every 10th key), deletes
    (every 7th≡3 key) and inserts (new keys derived from every
    13th≡5), applied in one full-outer-join pass."""
    apply_runtime_conf(spark)
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_totalprice"), F.col("o_orderstatus")
    )
    k = F.col("o_orderkey")
    mutations = base.filter((k % 7 == 3) | (k % 10 == 0)).select(
        k.alias("o_orderkey"),
        F.when(k % 7 == 3, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        F.col("o_orderstatus"),
    )
    # insert keys are NEGATED source keys: collision-free against the
    # positive orderkey space at ANY scale — the old k + 10,000,000
    # collided with real keys past ~SF1.7 and silently produced
    # duplicate-key merge outputs in both engines (code-review r6)
    inserts = base.filter(k % 13 == 5).select(
        (-k).alias("o_orderkey"),
        F.lit("U").alias("op"),
        F.lit(1.0).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    changes = mutations.unionByName(inserts)
    return merge_upsert(base, changes, key="o_orderkey", op_col="op")


@query(
    "q_dq_report",
    oracle="""
    SELECT 'o_custkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (o_totalprice IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT)
    FROM orders
    """,
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality report (null + distinct counts per
    column) — content-level validation beyond the reference's schema
    gate."""
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return quality_report(orders, ["o_custkey", "o_orderstatus", "o_totalprice"])


@query(
    "q_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_quantity - l_quantity) = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - l_quantity) END AS div_zero,
           l_extendedprice / 2.0 AS half_price,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip
    FROM lineitem
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions: try_divide / try_cast return null
    instead of failing under ANSI mode — dirty input survives the
    batch.  fan_out first (r14): the double→string→double roundtrip
    is ~10 µs/row and a one-row-group source ran all 600k rows on a
    single scan task (measured 6 s; no-op at scale)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.io import fan_out

    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_zero"),
        F.try_divide(F.col("l_extendedprice"), F.lit(2.0)).alias("half_price"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_roundtrip"),
    )


@query(
    "q_incr_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(sum(value), 2) / count(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_incr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup refresh: the daily (event_type) rollup is
    maintained as stored partials over history plus a freshly
    aggregated delta (last 5 days), merged by re-aggregation
    (operators/rollup.py).  The oracle is a FULL recompute — passing
    proves stored+delta merging is lossless, which is what makes the
    refresh O(delta) at 100 TB.  Sums recover the 2-dp grid; avg is
    derived from merged partials, never merged itself."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rollup import merge_rollups, partial_rollup

    # day in TIMESTAMP_NTZ (hostile-session probe r14): date_trunc's
    # LTZ output renders in the driver's local timezone at collect
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz")
    )
    # mid-day cutoff: the Jan-26 groups exist in BOTH stored and delta,
    # so the merge genuinely combines partials instead of concatenating
    # disjoint groups.  NTZ literal: the boundary is wall-clock,
    # session-timezone-independent (the stream_windows convention)
    cutoff = F.lit("2024-01-26 12:00:00").cast("timestamp_ntz")
    stored = partial_rollup(ev.filter(F.col("ts") < cutoff), ["day", "event_type"], "value")
    delta = partial_rollup(ev.filter(F.col("ts") >= cutoff), ["day", "event_type"], "value")
    merged = merge_rollups(stored, delta)
    return merged.select(
        "day",
        "event_type",
        F.col("_pcount").alias("n_events"),
        F.round(F.col("_psum"), 2).alias("sum_value"),
        (F.round(F.col("_psum"), 2) / F.col("_pcount")).alias("avg_value"),
    )


@query(
    "q_reconcile",
    oracle="""
    WITH li AS (
        SELECT l_orderkey AS o_orderkey,
               round(sum(l_extendedprice), 2) AS li_total,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_totalprice, li.li_total,
           coalesce(li.n_lines, 0) AS n_lines,
           o.o_totalprice - li.li_total AS diff
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.o_orderkey
    """,
)
def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation audit (operators/reconcile.py):
    partial-aggregated lineitem totals left-joined to orders; orders
    without lines audit as NULL rather than vanishing.  Sums recover
    the 2-dp grid, so diff is a subtraction of identical doubles."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.reconcile import reconcile_totals

    return reconcile_totals(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH ev AS (
        SELECT * FROM events
        WHERE value IS NULL
           OR (isfinite(value) AND abs(value * 100) < 9.223372036854776e18)
    ), moments AS (
        SELECT event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1c,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2c,
               CAST(count(*) AS BIGINT) AS n
        FROM ev
        GROUP BY event_type
    ), stats AS (
        SELECT event_type, n, s1c / (100.0 * n) AS mean,
               greatest(s2c / (10000.0 * n)
                        - (s1c / (100.0 * n)) * (s1c / (100.0 * n)), 0) AS var
        FROM moments
    )
    SELECT e.event_id, e.event_type,
           (e.value - m.mean) / sqrt(m.var) AS zscore
    FROM ev e JOIN stats m ON e.event_type = m.event_type
    WHERE m.var > 0
      AND abs((e.value - m.mean) / sqrt(m.var)) > 2.5
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection from EXACT integer moments:
    value sits on the 2-dp grid, so c = round(value·100) is an exact
    int64 and s1c = Σc, s2c = Σc² are order-free exact integers at any
    group size (bound: Σc² < 2⁶³ → ~9·10⁸ rows/group at value ≤ 1000;
    beyond, promote the partial to DECIMAL) — the earlier
    round(sum(value²), 4) form recovered the grid only while
    accumulated float error stayed under 5e-5, a margin that shrinks
    linearly with group size (code-review r6).  mean/var/z are then
    arithmetic over identical doubles in both engines — builtin
    stddev (Welford, order-dependent) would never hash-match.

    Degenerate groups (constant values or a single event → var = 0,
    and the clamp absorbs tiny negative cancellation) emit NO rows in
    either engine instead of crashing ANSI Spark with DIVIDE_BY_ZERO
    / DuckDB with sqrt(negative) (code-review r6).

    One aggregate + one broadcast join back; the anomaly scan of a
    100 TB table is two passes, no sort.

    Observations OFF the exact-cents grid are excluded (extremes
    sweep r11): the method's stated domain is value·100 exactly
    representable as int64, and outside it the cents cast
    ANSI-overflows in Spark (NaN/±inf/|v·100| ≥ 2^63) while z-scores
    over NaN-poisoned moments are meaningless in both engines."""
    apply_runtime_conf(spark)
    cents_ok = finite_or_null(F.col("value")) & (
        F.col("value").isNull()
        | (F.abs(F.col("value") * 100) < F.lit(9.223372036854776e18))
    )
    ev = load_table(spark, sf_dir, "events").where(cents_ok)
    c = F.round(F.col("value") * 100).cast("long")
    moments = ev.groupBy("event_type").agg(
        F.sum(c).alias("s1c"),
        F.sum(c * c).alias("s2c"),
        F.count("*").alias("n"),
    )
    mean = F.col("s1c") / (100.0 * F.col("n"))
    var = F.greatest(
        F.col("s2c") / (10000.0 * F.col("n")) - mean * mean, F.lit(0.0)
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(moments), "event_type")
        .filter((var > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", z.alias("zscore"))
    )


@query(
    "q_histogram",
    oracle=f"""
    SELECT event_type,
           {sql_bucket_long("value", 10.0)} AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, {sql_bucket_long("value", 10.0)}
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per group (floor-bucketed), the profiling
    primitive behind DQ dashboards — pure partial-aggregating
    group-by whose shuffle carries one row per (group, bucket).
    ROW-COMPLETE: values whose bucket is not representable on the
    int64 grid (NaN/±inf/|v/10| ≥ 2^63 — extremes sweep r11: Spark's
    long floor silently saturates where DuckDB's CAST raises) land in
    the NULL bucket together with NULL values, so bucket counts
    always sum to the table's row count."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    bucket = bucket_long(F.col("value"), 10.0)
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_scd2",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(lead(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
               AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM changes
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 compaction: collapse each
    user's event stream into validity intervals — a row per status
    *change* with [valid_from, valid_to) bounds and an is_current
    flag (valid_to NULL on the open interval).  Both windows share
    the user_id partitioning, so one shuffle serves the whole build;
    microsecond integers keep every boundary exact cross-engine."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    # same (ts, event_id) total order as the change-detection window:
    # ts-only ordering made valid_to/is_current nondeterministic for
    # same-timestamp change rows (code-review r6)
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        epoch_us("ts").alias("valid_from_us"),
        epoch_us(valid_to).alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )
