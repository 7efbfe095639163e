"""Time-series wave: ordered-fold EWMA, OHLC bars, month-over-month
growth, Pareto (cumulative-revenue-share) analysis.

These are the shapes a metrics/finance pipeline runs over an event
log: inherently *ordered* computations.  The engine's rule for them is
"shuffle each key's history exactly once, then do the ordered part
inside the group" — either a sorted-array fold (EWMA: higher-order
builtins, stays in whole-stage codegen) or an ordered aggregate
(OHLC: min_by/max_by over a composite sort key, one hash aggregate,
no window shuffle at all).  The reference's only ordered computation
is its per-feature coordinate walk (`task.ts:124-126`); these queries
generalize that to grouped temporal sequences.

Cross-engine float discipline (see functions/numeric.py): fold order
is pinned identically on both engines so EWMA doubles are
IEEE-identical with no rounding; revenue sums sit on the 2-dp source
grid and are recovered with round(sum, 2); ratios of recovered values
are row-level IEEE-identical after floor-scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import (
    cents,
    fround,
    sql_cents,
    sql_fround,
)
from etl_caltopo_spark.functions.temporal import epoch_us
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf

#: composite tick-order key: (ts, event_id) rendered as one sortable
#: string so min_by/max_by (Spark) and arg_min/arg_max (DuckDB) agree
#: on ties.  %020d is safe: epoch-µs and event_id are non-negative.
_TICK_KEY_SQL = "printf('%020d|%020d', epoch_us(ts), event_id)"


def _tick_key() -> F.Column:
    return F.format_string(
        "%020d|%020d", epoch_us("ts"), F.col("event_id")
    )


@query(
    "q_ewma",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> acc * CAST(0.7 AS DOUBLE)
                                   + x * CAST(0.3 AS DOUBLE)) AS ewma
    FROM events
    GROUP BY user_id
    """,
    headline=True,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (α = 0.3) of
    event values, evaluated as a left fold in (ts, event_id) order.

    EWMA is the canonical inherently-sequential aggregate — no
    commutative reformulation exists — so the Spark-first shape is
    collect → sort_array → aggregate() fold per key: one shuffle of
    each user's history, all fold arithmetic inside whole-stage
    codegen (higher-order builtins, no Python).  At 100 TB the
    grouping key (user) bounds state per task; a pathological user
    with unbounded history is the one case that needs windowed
    pre-chunking.  Fold order and per-step arithmetic are pinned
    identically on both engines (DuckDB list_reduce seeds with the
    first element; Spark seeds aggregate() with element 1 and folds
    the slice from 2), so the result doubles are IEEE-identical.
    """
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    grouped = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("xs"),
    )
    fold = F.aggregate(
        F.expr("slice(xs, 2, size(xs) - 1)"),
        F.expr("element_at(xs, 1).value"),
        lambda acc, x: acc * F.lit(0.7) + x["value"] * F.lit(0.3),
    )
    return grouped.select("user_id", "n_events", fold.alias("ewma"))


@query(
    "q_ohlc",
    oracle=f"""
    SELECT user_id,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_start,
           arg_min(value, {_TICK_KEY_SQL}) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, {_TICK_KEY_SQL}) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id, bar_start
    """,
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per user.

    Open/close are ordered picks, but they do NOT need a window: a
    single hash aggregate with min_by/max_by over a composite
    (ts, event_id) sort key computes all four legs in one pass — one
    shuffle on (user, hour), partial aggregation map-side, no sort.
    That is the plan that survives 100 TB: bar cardinality is
    users × hours, and every input row is touched exactly once.
    """
    apply_runtime_conf(spark)
    # a tick without a price is not a tick: dropped on both sides
    # (r8 NULL-injection sweep — Spark's min_by/max_by RETURN a NULL
    # value at the extreme key where DuckDB's arg_min/arg_max SKIP
    # null-value rows; filtering makes the question moot)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    key = _tick_key()
    # bar_start in TIMESTAMP_NTZ (hostile-session probe r14): LTZ
    # output renders in the driver's local timezone at collect
    return ev.groupBy(
        "user_id",
        F.date_trunc("hour", F.col("ts"))
        .cast("timestamp_ntz")
        .alias("bar_start"),
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").cast("bigint").alias("n_ticks"),
    )


@query(
    "q_mom_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT month_start, revenue,
           lag(revenue) OVER (ORDER BY month_start) AS prev_revenue,
           {sql_fround("(revenue - lag(revenue) OVER (ORDER BY month_start))"
                       " / lag(revenue) OVER (ORDER BY month_start)", 6)}
               AS mom_growth
    FROM monthly
    """,
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup + lag window.

    The aggregate runs first, so the unpartitioned window only ever
    sees one row per month — O(10²) rows on a single reducer no matter
    the input scale.  Revenue is recovered exactly on the 2-dp grid
    (round-after-sum); the growth ratio is then row-level
    floor-scaled, IEEE-identical across engines.
    """
    apply_runtime_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    # month_start in TIMESTAMP_NTZ (hostile-session probe r14)
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month_start")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month_start",
        "revenue",
        prev.alias("prev_revenue"),
        fround((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@query(
    "q_pareto",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum({sql_cents("o_totalprice")}) AS BIGINT)
                   AS revenue_c
        FROM orders GROUP BY o_custkey
        HAVING sum({sql_cents("o_totalprice")}) IS NOT NULL
    ), tot AS (
        SELECT CAST(sum(revenue_c) AS BIGINT) AS total_c FROM rev
    )
    SELECT o_custkey,
           revenue_c / 100.0 AS revenue,
           CAST(sum(revenue_c) OVER (ORDER BY revenue_c DESC, o_custkey
                ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 AS cum_revenue,
           {sql_fround("CAST(sum(revenue_c) OVER (ORDER BY revenue_c DESC,"
                       " o_custkey ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
                       " / total_c", 8)}
               AS cum_share
    FROM rev, tot
    """,
)
def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) analysis: customers ranked by revenue with their
    cumulative share of total revenue.

    Per-customer revenue reduces the data before any ordered step; the
    total joins back as a broadcast scalar rather than a second
    full-frame window.  The running sum runs on the distributed
    two-pass machinery (operators/rank.py global_running_sum —
    VERDICT r6 #1): per-bucket running sums plus broadcast per-bucket
    sum offsets — the customer frame never sorts into one task.
    Every sum — per-customer, cumulative, and total — runs over EXACT
    integer CENTS (round(price·100) int64), so order-of-accumulation
    can never flip a grid cell at any scale; the earlier
    round(sum, 2) form's 0.005 margin shrank as the running total
    grew (code-review r6).  int64 bound: total revenue < $9.2e16.
    """
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import global_running_sum, pin_frame

    orders = load_table(spark, sf_dir, "orders")
    # off-grid totals (NaN/±inf/huge — extremes r11 wave 2) yield NULL
    # cents (numeric.cents); a customer whose EVERY total is off-grid
    # is excluded like q_gini's — its NULL revenue would rank
    # engine-differently (NULLS FIRST vs LAST)
    rev = pin_frame(
        orders.groupBy("o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("revenue_c"))
        .where(F.col("revenue_c").isNotNull())
    )
    total = rev.agg(F.sum("revenue_c").alias("total_c"))
    cum = global_running_sum(
        rev,
        "revenue_c",
        [F.desc("revenue_c"), F.asc("o_custkey")],
        "revenue_c",
        out_col="_cum_c",
        ascending=False,
        tiebreak="o_custkey",
    )
    cum_c = F.col("_cum_c")
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            (F.col("revenue_c") / 100.0).alias("revenue"),
            (cum_c / 100.0).alias("cum_revenue"),
            fround(cum_c.cast("double") / F.col("total_c"), 8).alias(
                "cum_share"
            ),
        )
    )
