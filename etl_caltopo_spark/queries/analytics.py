"""Event-analytics wave: sequential funnel, cohort retention, RFM
scoring, robust (median/MAD/IQR) statistics.

These are the composite shapes product analysts run over an events
stream — each one decomposes into the primitive operators the engine
already exposes (conditional min-aggregates, broadcast joins back to
a per-key scalar, ntile windows), so they double as integration
coverage for those primitives at realistic query complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import finite_or_null, fround
from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf


@query(
    "q_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS ts1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS ts2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.ts1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS ts3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.ts2
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_clicked,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchased
    """,
    headline=True,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel (view → click → purchase): each
    step counts users whose step-N event happened after their step-N-1
    first occurrence.  Per-step min-aggregates keyed on user_id reuse
    one partitioning; the step tables are user-cardinality (tiny next
    to the event log), so the step joins broadcast — at 100 TB of
    events the heavy table is scanned once per step with a pushed
    event_type filter and never shuffled whole."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    return (
        s1.agg(F.count("*").cast("bigint").alias("n_viewed"))
        .crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_clicked")))
        .crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_purchased")))
    )


@query(
    "q_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS day0
        FROM events GROUP BY user_id
    )
    SELECT CAST(date_diff('day', DATE '2024-01-01', f.day0) AS INTEGER)
               AS cohort_day,
           CAST(floor(date_diff('day', f.day0, CAST(e.ts AS DATE)) / 7.0)
                AS INTEGER) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_day f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    bucketed into week offsets from that day, distinct users per
    (cohort, offset) cell.  The first-seen table is user-cardinality
    and broadcast back onto the log; day arithmetic stays in exact
    integers (no timestamp rendering in the output)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("day0")
    )
    joined = ev.join(F.broadcast(first_day), "user_id")
    cohort_day = F.datediff(F.col("day0"), F.lit("2024-01-01")).cast("int")
    week_offset = (
        F.floor(F.datediff(F.to_date("ts"), F.col("day0")) / 7.0).cast("int")
    )
    return joined.groupBy(
        cohort_day.alias("cohort_day"), week_offset.alias("week_offset")
    ).agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))


@query(
    "q_rfm",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
    base AS (
        SELECT o_custkey,
               CAST(date_diff('day', max(o_orderdate),
                              (SELECT ref_date FROM ref)) AS INTEGER)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey)
                AS INTEGER) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                AS INTEGER) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                AS INTEGER) AS m_score
    FROM base
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer quartile scoring
    — one aggregate over orders, then three exact quartile cuts over
    the customer-cardinality result (each with a custkey tie-break so
    the cut is deterministic).  The monetary sum sits on the 2-dp
    source grid, so round(sum, 2) is exact cross-engine.

    Scale shape (VERDICT r6 #1 + #3): the per-customer aggregate runs
    FIRST and the reference date joins onto the reduced frame (the old
    plan dragged the constant ref_date through the orders shuffle);
    each quartile score comes from the distributed two-pass rank
    (operators/rank.py) + the shared ntile row arithmetic — no
    single-partition window over the customer universe."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.operators.rank import (
        global_row_number,
        ntile_from_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    base0 = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last_order"),
        F.count("*").cast("bigint").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    ref = base0.agg(F.max("_last_order").alias("ref_date"))
    base = base0.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_date", "_last_order").cast("int").alias("recency_days"),
        "frequency",
        "monetary",
    )

    # ONE pin + ONE combined probe + three UN-CHAINED rank branches
    # (optimization r14; previously each pass pinned its predecessor
    # and ran its own eager probe — measured: ~30 sub-0.15 s stages,
    # wall dominated by driver job latency, not compute).  The three
    # quartile cuts are independent functions of the pinned base, so
    # all three approx_percentile probes run in one eager aggregate
    # (rank.cuts_probe_agg) and the branches re-join on the customer
    # key — at scale this also materializes the customer frame once
    # instead of three times.
    import os

    from etl_caltopo_spark.operators.rank import cuts_probe_agg
    from etl_caltopo_spark.operators.rank import pin_frame as _pin

    base = _pin(base)
    if os.environ.get("SPARK_GRAFT_LAZY_PLANS") == "1":
        # plan dumps must run zero jobs: fall back to the in-DAG
        # probe form inside each pass
        cut_r = cut_f = cut_m = None
    else:
        probes = base.agg(
            cuts_probe_agg("recency_days", alias="_c_r"),
            cuts_probe_agg("frequency", ascending=False, alias="_c_f"),
            cuts_probe_agg("monetary", ascending=False, alias="_c_m"),
        ).first()
        cut_r = probes["_c_r"] or []
        cut_f = probes["_c_f"] or []
        cut_m = probes["_c_m"] or []
    r = global_row_number(
        base,
        "recency_days",
        [F.col("recency_days"), F.col("o_custkey")],
        rn_col="_rn_r",
        total_col="_n",
        tiebreak="o_custkey",
        pinned_cuts=cut_r,
    )
    f = global_row_number(
        base,
        "frequency",
        [F.col("frequency").desc(), F.col("o_custkey")],
        ascending=False,
        rn_col="_rn_f",
        tiebreak="o_custkey",
        pinned_cuts=cut_f,
    ).select("o_custkey", "_rn_f")
    m = global_row_number(
        base,
        "monetary",
        [F.col("monetary").desc(), F.col("o_custkey")],
        ascending=False,
        rn_col="_rn_m",
        tiebreak="o_custkey",
        pinned_cuts=cut_m,
    ).select("o_custkey", "_rn_m")
    r = r.join(f, "o_custkey").join(m, "o_custkey")
    return r.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        ntile_from_rank(F.col("_rn_r"), F.col("_n"), 4).alias("r_score"),
        ntile_from_rank(F.col("_rn_f"), F.col("_n"), 4).alias("f_score"),
        ntile_from_rank(F.col("_rn_m"), F.col("_n"), 4).alias("m_score"),
    )


@query(
    "q_robust_stats",
    oracle="""
    WITH ev AS (
        SELECT event_type, value FROM events
        WHERE value IS NULL OR isfinite(value)
    ), med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM ev GROUP BY event_type
    ), mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM ev e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT m.event_type,
           floor(m.med * 10000) / 10000 AS median_value,
           floor((m.q3 - m.q1) * 10000) / 10000 AS iqr,
           floor(mad.mad * 10000) / 10000 AS mad
    FROM med m JOIN mad USING (event_type)
    """,
)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion statistics per group: median, interquartile
    range, and median absolute deviation — the outlier-resistant
    complement to q_anomaly_zscore.  MAD needs the two-pass shape
    (per-group median broadcast back under the second quantile);
    both engines use the same linear-interpolation quantile, and the
    |x - med| inputs are bitwise-identical doubles, so 4-dp flooring
    is safely inside the agreement margin.

    Non-finite observations are excluded (extremes sweep r11): the
    engines place NaN differently inside interpolated quantiles, and
    a ±inf observation makes IQR/MAD undefined (inf - inf)."""
    apply_runtime_conf(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(finite_or_null(F.col("value")))
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med"),
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias(
                "mad"
            )
        )
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            fround(F.col("med"), 4).alias("median_value"),
            fround(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            fround(F.col("mad"), 4).alias("mad"),
        )
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
               AS p_transition
    FROM cnt
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: lag pairs → counts → row-normalized probabilities.
    The lag window and nothing else touches the full log (one shuffle
    on user_id); the probability window runs over the 25-row count
    matrix.  Integer division of identical counts is bit-exact."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        (F.col("n").cast("double") / F.sum("n").over(w_from)).alias(
            "p_transition"
        ),
    )


@query(
    "q_dedup_latest",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_type, event_id,
           round(value, 2) AS last_value
    FROM r WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest compaction: one surviving row per (user, type) by
    event time — the upsert-log → current-state materialization every
    CDC consumer runs.  row_number desc with an event_id tie-break;
    WindowGroupLimit turns it into a map-side top-1 before the
    shuffle, so state size, not log size, bounds the exchange."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.round("value", 2).alias("last_value"),
        )
    )


@query(
    "q_user_paths",
    oracle="""
    WITH sessions AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn <= 5
        GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM sessions GROUP BY path
    """,
)
def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common user journeys: each user's first five events joined into
    an ordered path string, counted across users — the path-analysis /
    sequence-mining shape.  Ordering is pinned by sorting the
    collected (ts, event_id, event_type) structs inside the aggregate
    (array_sort on structs orders by fields left-to-right — same
    determinism as an ordered window, one pass instead of building
    the array once per event); truncated to 5 steps so the path
    vocabulary stays bounded.  One shuffle on user_id feeds both the
    row_number truncation (WindowGroupLimit: map-side top-5) and the
    per-user fold (VERDICT r6 #2 cleanup)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return per_user.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
