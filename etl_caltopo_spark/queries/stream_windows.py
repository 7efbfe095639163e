"""Time-window queries over the events table (SURVEY §2.3 "Streaming").

Each runs the batch form of a streaming aggregation (batch-first rule);
tests/test_streaming.py re-runs the identical operator as a real
Structured Streaming job and asserts equivalence.

Durability note on the streaming-PROTOCOL ids (the ones that run a
real two-phase availableNow job into a session-temp sink dir): the
result detaches from the sink via ``localCheckpoint(eager=True)``
before the dir is deleted — executor-side materialization, nothing
through the driver (VERDICT r5 #3).  localCheckpoint blocks are
NON-RELIABLE by contract: on a cluster, losing an executor after the
sink dir is gone would fail downstream actions with no recompute
path.  That trade is deliberate and scoped: these ids are harness
protocol probes that run local-mode; a production pipeline would keep
the sink directory (or use reliable ``checkpoint()``) instead of
deleting its source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.temporal import epoch_us
from etl_caltopo_spark.io import load_table, parquet_ts_bounds
from etl_caltopo_spark.queries.registry import query
from etl_caltopo_spark.session import apply_runtime_conf
from etl_caltopo_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


def _ts_bounds(sf_dir: str, ev: DataFrame) -> dict:
    """The streaming-protocol queries' phase-split probe: exact
    min/max of events.ts.  Footer statistics when they prove the
    bounds (zero Spark jobs; at 100 TB the old eager aggregate is a
    full-column scan — optimization r15, VERDICT r14 #7), the Spark
    aggregate otherwise (replica/session shapes the footer can't
    prove: rewritten ts dtypes, missing stats).  Value-identity with
    the aggregate is pinned in tests/test_r15_optimizations.py."""
    b = parquet_ts_bounds(sf_dir, "events", "ts")
    if b is not None:
        return {"lo": b[0], "hi": b[1]}
    row = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    return {"lo": row["lo"], "hi": row["hi"]}


def event_type_rank_dim(ev: DataFrame) -> DataFrame:
    """The q_stream_enrich lookup dim: dense rank of each DISTINCT
    event type.  The unpartitioned window here is a BOUNDED-GRID
    window — its input is the distinct-event_type aggregate (a
    value-domain-bounded frame, single-digit rows), never the event
    log itself.  Factored out so tests/test_plans.py can grade the
    plan directly (the enclosing query id runs the eager two-phase
    streaming protocol and cannot be lazily planned).

    A NULL event type is excluded (nullkeys sweep r12): it can never
    enrich anything through the equi-join, but ranked it would take
    rank 1 under Spark's ASC NULLS FIRST and shift every real type's
    rank, while DuckDB ranks it LAST — the joined output's ranks
    diverge even though the NULL rows themselves drop on both sides.
    The oracle mirrors with WHERE event_type IS NOT NULL."""
    from pyspark.sql import Window

    return (
        ev.select("event_type")
        .where(F.col("event_type").isNotNull())
        .distinct()
        .select(
            "event_type",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("bigint")
            .alias("type_rank"),
        )
    )


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT))
                AT TIME ZONE 'UTC' AS TIMESTAMP) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts per event type.  Spark's
    window() aligns to the 1970 epoch; the oracle reproduces that with
    epoch arithmetic."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    return out.drop("window_end")


@query(
    "q_stream_sliding",
    oracle="""
    WITH b AS (
        SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))
                    AT TIME ZONE 'UTC' AS TIMESTAMP) AS b5,
               event_type, value
        FROM events
    ), expanded AS (
        SELECT b5 AS window_start, event_type, value FROM b
        UNION ALL
        SELECT b5 - INTERVAL '5 minutes' AS window_start, event_type, value FROM b
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes — each event lands in
    two windows; the oracle expands the two bucket assignments with a
    UNION ALL."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        "10 minutes",
        "5 minutes",
        ["event_type"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    return out.drop("window_end")


@query(
    "q_stream_session",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT *, sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM seq
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap; the
    oracle is the classic gaps-and-islands formulation (new session
    when the gap is >= 30min, matching Spark's exclusive session end)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return session_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )


@query(
    "q_sessionize_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, event_id,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM marked
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a 30-minute-inactivity session
    id assigned with lag + running sum — the relational complement to
    session_window (q_stream_session; same >= gap boundary), and the
    shape analysts reach for
    when sessions must be numbered, not merely bounded.  One shuffle on
    user_id serves both windows and the final aggregate (microsecond integers
    are exact in both engines, so every measure and boundary is exact)."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # >= (not >): an inactivity gap of EXACTLY 30 minutes starts a
    # new session, matching session_window / q_stream_session's
    # exclusive session-end contract (code-review r6 — both sides
    # previously shared the off-by-one, so the grade was silently
    # inconsistent with the claimed twin)
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (
            (epoch_us("ts") - epoch_us(F.lag("ts").over(w)))
            >= 1_800_000_000
        ),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(epoch_us("ts")) - F.min(epoch_us("ts"))).alias(
            "duration_us"
        ),
    )


@query(
    "q_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_value
    FROM events
    """,
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (gap-filling): carry each user's most recent
    purchase value onto every subsequent event — last(ignorenulls)
    over a running frame, the canonical time-series imputation.  One
    shuffle on user_id; values are source-column pass-throughs so no
    rounding discipline is needed."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(marked, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "q_click_attribution",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL '30 minutes'
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution: views matched to same-user clicks within 30
    minutes, through the SAME interval_join operator the streaming mode
    uses (streaming/joins.py; withWatermark is a no-op in batch) — this
    id pins the operator's join semantics against the SQL oracle, and
    tests/test_streaming.py pins stream == batch."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    return interval_join(views, clicks, "user_id").select(
        "view_id", "click_id", "user_id"
    )


@query(
    "q_stream_watermark_late",
    oracle=None,
    note="genuine two-phase Structured Streaming run (availableNow, "
    "persisted watermark, update mode); emissions are deterministic "
    "(single-file micro-batches) but the run protocol is not "
    "SQL-expressible — rows-only.  Domain: the streaming watermark "
    "clock bottoms at epoch 0 (temporal r11) — pre-1970 event times "
    "are born late and future-side extremes legitimately advance the "
    "watermark, so the lateness contract is defined on in-domain "
    "event times only.",
)
def q_stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + late-data drop, end-to-end as a REAL streaming job
    under the correctness gate (the §2 'watermark / late data' row;
    previously integration-test only).

    Protocol: phase 1 streams only the newest 30 minutes of events
    (one parquet file → one micro-batch), advancing the persisted
    watermark to max(ts) - 1 hour.  Phase 2 restarts from the SAME
    checkpoint and feeds every older row as a late arrival: rows
    younger than the watermark are merged into open windows, rows
    older are DROPPED by the windowed-aggregate state — so the final
    emission set contains no window older than the watermark even
    though phase 2 delivered thousands of such rows.  Update output
    mode makes both the phase-1 windows and the accepted-late merges
    visible; single-file batches keep the emission multiset
    deterministic.  The result is driver-materialized (the emitted
    windows are bounded by the 90-minute protocol horizon, not by
    |events|).  Protocol plumbing: ingest.run_two_phase (foreachBatch
    is the only sink kind that can RESUME from the phase-1 checkpoint,
    which is what carries the watermark into phase 2)."""
    apply_runtime_conf(spark)
    from datetime import timedelta

    from etl_caltopo_spark.streaming.ingest import run_two_phase, with_watermark

    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    max_ts = _ts_bounds(sf_dir, ev)["hi"]
    if max_ts is None:
        # EMPTY-INPUT GUARD (empty-tables sweep r13; template:
        # q_stream_dedup's r11 guard): a stream over zero rows emits
        # nothing — return the batch-shaped empty OUTPUT frame and do
        # NOT run the availableNow protocol (an empty run writes no
        # epoch dirs and the sink read-back fails on schemaless
        # parquet).  Reachable at 100 TB: an empty partition/day.
        return (
            tumbling_agg(
                ev.limit(0),
                "ts",
                "10 minutes",
                [],
                [
                    F.count("*").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("sum_value"),
                ],
            )
            .drop("window_end")
            .select(
                F.col("window_start")
                .cast("timestamp_ntz")
                .alias("window_start"),
                "n_events",
                "sum_value",
            )
        )
    split = max_ts - timedelta(minutes=30)
    # build the split as an NTZ expression: a naive-datetime literal is
    # converted via the DRIVER system timezone while the NTZ ts column
    # is session-tz coerced, shifting the phase boundary off-UTC hosts
    split_lit = F.lit(split.isoformat(sep=" ")).cast("timestamp_ntz")

    def agg_plan(stream: DataFrame) -> DataFrame:
        return tumbling_agg(
            with_watermark(stream, "ts", "1 hour"),
            "ts",
            "10 minutes",
            [],
            [
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            ],
        ).drop("window_end")

    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") >= split_lit), ev.filter(F.col("ts") < split_lit)],
        agg_plan,
        output_mode="update",
        prefix="q_wm_late_",
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "n_events",
        "sum_value",
    ).orderBy("window_start")


@query(
    "q_stream_dedup",
    oracle="""
    -- DISTINCT (clones sweep r13): the operator dedups by the
    -- event_id KEY, so a source that re-delivers byte-identical
    -- rows under one id still emits that id once.  Rows sharing an
    -- id with DIFFERENT payloads resolve by arrival order (not
    -- SQL-expressible) — the id's domain contract is that payload
    -- is a function of the key, which every replica satisfies.
    SELECT DISTINCT event_id, user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
    WHERE epoch_us(ts) >= 0
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked dedup-in-stream as a REAL two-phase Structured
    Streaming run whose emission set the SQL oracle hash-checks — the
    graded complement to the rows-only q_stream_watermark_late.

    Protocol: every event is delivered TWICE (at-least-once source
    simulation).  Phase 1 streams the older half (both copies, one
    file → deterministic batching), advancing the persisted watermark
    to ~mid − 10 min.  Phase 2 restarts from the same checkpoint with
    the newer half (both copies) PLUS a third delivery of the oldest
    quarter — late rows far below the watermark.  The
    dropDuplicatesWithinWatermark state collapses same-key copies
    inside each phase, and the watermark drops the stale redelivery
    before the operator, so the emitted multiset is EXACTLY one row
    per source event: SELECT event_id, user_id, event_type, ts FROM
    events — which is what the oracle grades, making the dedup + late
    -drop semantics hash-checked, not just row-counted.  (The final
    driver materialization is harness plumbing for the grader;
    production streams keep the same plan and write to a durable
    sink.)  Protocol plumbing: ingest.run_two_phase.

    Domain (temporal sweep r11): event times >= epoch 0 — Spark's
    watermark clock bottoms at 1970-01-01, so a pre-epoch row is BORN
    LATE and dropped by the operator from the first batch; the
    operator filter makes that contract explicit and the oracle
    mirrors it (no-op on the seeded 2024 data).  The phase split
    likewise ignores pre-epoch rows when placing its boundaries."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.ingest import (
        run_two_phase,
        stream_dedup_within_watermark,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # boundaries from IN-DOMAIN (post-epoch) rows only: a pre-epoch
    # outlier would otherwise drag lo centuries down and degenerate
    # the older/newer split (temporal sweep r11)
    in_domain = ev.filter(
        F.col("ts").cast("timestamp_ntz")
        >= F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    )
    # footer fast path (optimization r15, see _ts_bounds): valid for
    # the FILTERED bounds only when the footer proves the whole table
    # is post-epoch (then the filter is a no-op); a pre-epoch or
    # unprovable footer falls back to the filtered aggregate.
    from datetime import datetime as _dt

    _b = parquet_ts_bounds(sf_dir, "events", "ts")
    if _b is not None and _b[0] is not None and _b[0] >= _dt(1970, 1, 1):
        bounds = {"lo": _b[0], "hi": _b[1]}
    else:
        bounds = in_domain.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).first()
    if bounds["lo"] is None:
        # no in-domain rows (empty table or all pre-epoch): the
        # stream would emit nothing — return the empty frame with the
        # output schema instead of a NoneType-arithmetic crash
        # (r11 continuation self-review)
        return ev.limit(0).select(
            "event_id",
            "user_id",
            "event_type",
            epoch_us(F.col("ts").cast("timestamp_ntz")).alias("ts_us"),
        )
    span = bounds["hi"] - bounds["lo"]
    mid = bounds["lo"] + span / 2
    early = bounds["lo"] + span / 4
    # NTZ-literal casts keep the phase boundaries timezone-independent
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")
    early_lit = F.lit(early.isoformat(sep=" ")).cast("timestamp_ntz")
    older = ev.filter(F.col("ts") < mid_lit)
    newer = ev.filter(F.col("ts") >= mid_lit)
    stale = ev.filter(F.col("ts") < early_lit)
    out = run_two_phase(
        spark,
        [older.unionAll(older), newer.unionAll(newer).unionAll(stale)],
        lambda s: stream_dedup_within_watermark(
            s, ["event_id"], "ts", "10 minutes"
        ),
        output_mode="append",
        prefix="q_stream_dedup_",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        epoch_us(F.col("ts").cast("timestamp_ntz")).alias("ts_us"),
    )


@query(
    "q_stream_stateful_totals",
    oracle="""
    -- finite |v| >= 1e100 is NULLed on both sides (ADVICE r11): the
    -- operator's arrival-order fold would otherwise be order-
    -- dependent at overflow magnitudes; NaN/inf stay in (they
    -- saturate the sum identically in any order).  See
    -- streaming/stateful._split_value_for_sum.
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CASE WHEN isfinite(value) AND abs(value) >= 1e100
                          THEN NULL ELSE value END), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state streaming (applyInPandasWithState) graded by
    hash: per-user running (count, sum) totals carried in the state
    store across a REAL two-phase availableNow run, with the final
    per-key emission checked against the batch GROUP BY oracle.

    Protocol: phase 1 streams the older half of events, accumulating
    one (n, total) tuple per user in state; phase 2 restarts from the
    same checkpoint with the newer half, so phase-2 emissions must
    resume from phase-1 state (a user seen in both halves emits a
    running total that spans the restart — that's what proves the
    state store round-trip, not just in-memory accumulation).  Update
    -mode emissions are appended per batch; the last emission per key
    (the one with the largest n_events — emissions for a key are
    strictly increasing in n) is the user's final total, which must
    equal SELECT user_id, count(*), round(sum(value),2) over the whole
    table.  State is O(1) per key (two scalars) and the grouping key
    is the shuffle key, so the operator holds at 100 TB; the driver
    materialization at the end is harness plumbing for the grader.
    Protocol plumbing: ingest.run_two_phase."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.ingest import run_two_phase
    from etl_caltopo_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): emit the protocol-output-shaped empty frame instead
        # of running availableNow over zero rows
        from etl_caltopo_spark.streaming.stateful import RUNNING_TOTALS_OUTPUT

        return (
            spark.createDataFrame([], RUNNING_TOTALS_OUTPUT)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.round(F.max_by("total_value", "n_events"), 2).alias(
                    "total_value"
                ),
            )
        )
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")
    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") < mid_lit), ev.filter(F.col("ts") >= mid_lit)],
        lambda s: running_user_totals(s.drop("ts")),
        output_mode="update",
        prefix="q_stream_stateful_",
    )
    # last emission per key = the row with the largest running count
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
    )


@query(
    "q_stream_incr_rollup",
    oracle="""
    SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_incr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance graded by hash: per-day
    /type partial aggregates merge into a parquet rollup STORE via
    foreachBatch upsert (partial_rollup + merge_rollups — the
    mergeable-aggregate pattern), across a REAL two-phase availableNow
    run with multiple micro-batches per phase (maxFilesPerTrigger),
    and the final store must equal the whole-table batch GROUP BY.

    What the protocol proves: cross-batch AND cross-restart merge
    correctness — phase 2 resumes from the committed offsets and its
    partials must combine with phase 1's stored partials, so a
    double-merge (replay) or a dropped batch breaks the hash.  The
    stage-then-swap localCheckpoint keeps the store readable while
    being overwritten.  This is the production shape for keeping a
    100 TB rollup fresh: the store carries one row per (day, type),
    and each micro-batch shuffles only its partials.  Protocol
    plumbing: ingest.run_two_phase."""
    apply_runtime_conf(spark)
    import os

    from etl_caltopo_spark.operators.rollup import merge_rollups, partial_rollup
    from etl_caltopo_spark.streaming.ingest import run_two_phase

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): the store-shaped empty frame via the SAME partial
        # aggregate the upsert uses — schema can't drift
        return partial_rollup(
            ev.limit(0).withColumn("day", F.date_trunc("day", F.col("ts"))),
            ["day", "event_type"],
            "value",
        ).select(
            epoch_us(F.col("day").cast("timestamp_ntz")).alias("day_us"),
            "event_type",
            F.col("_pcount").cast("bigint").alias("n_events"),
            F.round(F.col("_psum"), 2).alias("sum_value"),
        )
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")

    def upsert(batch: DataFrame, store: str) -> None:
        delta = partial_rollup(
            batch.withColumn("day", F.date_trunc("day", F.col("ts"))),
            ["day", "event_type"],
            "value",
        )
        if os.path.exists(store):
            merged = merge_rollups(batch.sparkSession.read.parquet(store), delta)
        else:
            merged = delta
        # stage-then-swap: materialize before overwriting the source
        staged = merged.localCheckpoint()
        staged.write.mode("overwrite").parquet(store)

    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") < mid_lit), ev.filter(F.col("ts") >= mid_lit)],
        lambda s: s,
        sink="store",
        store_upsert=upsert,
        files_per_phase=4,
        max_files_per_trigger=2,
        prefix="q_stream_incr_rollup_",
    )
    return out.select(
        epoch_us(F.col("day").cast("timestamp_ntz")).alias("day_us"),
        "event_type",
        F.col("_pcount").cast("bigint").alias("n_events"),
        F.round(F.col("_psum"), 2).alias("sum_value"),
    )


@query(
    "q_stream_cdc_apply",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
           round(value, 2) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'logout'
    """,
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming changelog apply (the Debezium-style CDC sink) graded
    by hash: events are read as an ordered changelog per user —
    'logout' rows act as DELETEs, everything else as UPSERTs — and a
    foreachBatch merge maintains a latest-wins keyed STORE across a
    two-phase availableNow run with multiple micro-batches.  The
    final store must equal the batch point-in-time state: each user's
    most recent row, absent entirely if that row is a delete.

    What the protocol proves: latest-wins merge correctness across
    batch AND restart boundaries — a user whose phase-1 upsert is
    followed by a phase-2 delete must vanish, one whose delete is
    followed by an upsert must reappear, and ties resolve by the
    deterministic (ts, event_id) order both engines share.  This is
    the keyed-state complement to q_stream_incr_rollup's additive
    merge; together they cover the two production shapes of
    streaming-maintained stores.  Protocol plumbing:
    ingest.run_two_phase."""
    apply_runtime_conf(spark)
    import os

    from etl_caltopo_spark.streaming.ingest import run_two_phase

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): the store-shaped empty frame via the upsert's own
        # delta projection
        empty_store = ev.limit(0).select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == "logout").alias("deleted"),
            "value",
        )
        return empty_store.filter(~F.col("deleted")).select(
            "user_id",
            epoch_us(F.col("ts").cast("timestamp_ntz")).alias("last_ts_us"),
            F.round("value", 2).alias("last_value"),
        )
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")

    def upsert(batch: DataFrame, store: str) -> None:
        delta = batch.select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == "logout").alias("deleted"),
            "value",
        )
        if os.path.exists(store):
            merged = batch.sparkSession.read.parquet(store).unionByName(delta)
        else:
            merged = delta
        latest = merged.groupBy("user_id").agg(
            F.max_by(
                F.struct("ts", "event_id", "deleted", "value"),
                F.struct("ts", "event_id"),
            ).alias("m")
        ).select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.deleted").alias("deleted"),
            F.col("m.value").alias("value"),
        )
        staged = latest.localCheckpoint()
        staged.write.mode("overwrite").parquet(store)

    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") < mid_lit), ev.filter(F.col("ts") >= mid_lit)],
        lambda s: s,
        sink="store",
        store_upsert=upsert,
        files_per_phase=3,
        max_files_per_trigger=2,
        prefix="q_stream_cdc_",
    )
    return out.filter(~F.col("deleted")).select(
        "user_id",
        epoch_us(F.col("ts").cast("timestamp_ntz")).alias("last_ts_us"),
        F.round("value", 2).alias("last_value"),
    )


@query(
    "q_stream_interval_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
           CAST(epoch_us(v.ts) AS BIGINT) AS view_ts_us,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL '30 minutes'
    WHERE v.event_type = 'view'
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join graded by hash: click attribution
    (views ⋈ same-user clicks within 30 minutes) run as a REAL
    two-phase availableNow stream-stream join whose emission multiset
    must equal the batch SQL join exactly.

    Protocol: both sides stream from their own directory; phase 1
    delivers the even event_ids of each side, phase 2 restarts from
    the same checkpoint with the odd ones — a parity split, so a
    large share of matches pair a phase-1 row with a phase-2 row and
    can only emit if the join state survived the restart (that's what
    the protocol proves beyond the single-run equivalence test; the
    parity-cross pytest pins it).  Because parity delivery is not
    time-ordered, the watermark is set beyond the data span so no
    legitimate phase-2 row is late-dropped and no matchable state is
    evicted — the state-BOUNDING behaviour of the normal 1-hour
    watermark is separately proven by the interval-join streaming
    tests; here the graded property is exactness of the emission
    multiset.  Timestamps return as NTZ-derived epoch micros so the
    grade is timezone-independent.  Protocol plumbing:
    ingest.run_two_phase (two-source form)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.ingest import run_two_phase
    from etl_caltopo_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    out = run_two_phase(
        spark,
        {
            "v": [
                views.filter(F.col("view_id") % 2 == 0),
                views.filter(F.col("view_id") % 2 == 1),
            ],
            "c": [
                clicks.filter(F.col("click_id") % 2 == 0),
                clicks.filter(F.col("click_id") % 2 == 1),
            ],
        },
        lambda s: interval_join(
            s["v"],
            s["c"],
            "user_id",
            watermark="3650 days",  # beyond the span: no late drops
        ),
        output_mode="append",
        prefix="q_stream_ssjoin_",
    )
    return out.select(
        "view_id",
        "click_id",
        "user_id",
        epoch_us(F.col("l_ts").cast("timestamp_ntz")).alias("view_ts_us"),
        epoch_us(F.col("r_ts").cast("timestamp_ntz")).alias("click_ts_us"),
    )


@query(
    "q_click_attribution_outer",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
    FROM events v
    LEFT JOIN events c
      ON v.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL '30 minutes'
    WHERE v.event_type = 'view'
    """,
)
def q_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer click attribution: every view row survives, with its
    attributed click or NULL — the same interval_join operator in
    ``how="left_outer"`` mode, whose streaming form emits the null
    rows on watermark expiry (stream/batch relationship pinned in
    tests/test_streaming.py)."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    return interval_join(views, clicks, "user_id", how="left_outer").select(
        "view_id", "click_id", "user_id"
    )


@query(
    "q_stream_topk",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10
    """,
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k maintenance graded by hash — the seventh
    streaming-protocol id: a parquet STORE holds the current top-10
    events by value (ties broken by event_id, a total order), and each
    micro-batch merges its own local top-10 into the store via
    foreachBatch (top-k is a monoid: union → re-limit — the same
    mergeability argument as q_stream_incr_rollup's partial sums).
    Runs as a REAL two-phase availableNow protocol with multiple
    micro-batches per phase (maxFilesPerTrigger); phase 2 resumes from
    committed offsets, so a dropped batch or a replay breaks the hash
    against the whole-table batch ORDER BY ... LIMIT 10 oracle.

    Scale shape: each micro-batch computes its local top-k with
    TakeOrderedAndProject (no global sort), and the merge touches
    2k rows — the store stays k rows forever.  This is how a 100 TB
    stream keeps a leaderboard fresh without ever re-scanning
    history.  Protocol plumbing: ingest.run_two_phase."""
    apply_runtime_conf(spark)
    import os

    from etl_caltopo_spark.streaming.ingest import run_two_phase

    K = 10
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): topk of nothing is nothing — same projection as the
        # store schema
        return ev.limit(0).select("event_id", "event_type", "value")
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.select("event_id", "event_type", "value")
            .orderBy(F.col("value").desc(), F.col("event_id"))
            .limit(K)
        )

    def upsert(batch: DataFrame, store: str) -> None:
        delta = topk(batch)
        if os.path.exists(store):
            merged = topk(batch.sparkSession.read.parquet(store).unionByName(delta))
        else:
            merged = delta
        staged = merged.localCheckpoint()
        staged.write.mode("overwrite").parquet(store)

    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") < mid_lit), ev.filter(F.col("ts") >= mid_lit)],
        lambda s: s,
        sink="store",
        store_upsert=upsert,
        files_per_phase=4,
        max_files_per_trigger=2,
        prefix="q_stream_topk_",
    )
    return out.select("event_id", "event_type", "value")


@query(
    "q_stream_enrich",
    oracle="""
    WITH dim AS (
        -- NULL types excluded (nullkeys r12): see event_type_rank_dim
        SELECT event_type,
               CAST(row_number() OVER (ORDER BY event_type) AS BIGINT)
                   AS type_rank
        FROM (SELECT DISTINCT event_type FROM events
              WHERE event_type IS NOT NULL)
    )
    SELECT e.event_id, e.event_type, d.type_rank
    FROM events e JOIN dim d USING (event_type)
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast-join enrichment through Spark's NATIVE
    parquet streaming sink — the eighth streaming-protocol id, and the
    first to grade the FileStreamSink path itself: every micro-batch
    joins the stream against a small static dimension (broadcast, so
    the join is map-side in every batch) and APPENDS to a parquet sink
    whose _spark_metadata commit log provides exactly-once file
    tracking.  Runs as a REAL two-phase availableNow protocol with
    multiple micro-batches per phase; phase 2 resumes from the same
    checkpoint + sink, so a replayed or dropped batch would surface as
    duplicate/missing event_ids and break the hash against the batch
    join oracle.

    This is the canonical 100 TB enrichment topology: dimension tables
    broadcast once per batch (no stream-side shuffle), the sink
    partitions by arrival, and downstream batch readers see the
    metadata-log view, never half-written files.  Protocol plumbing:
    ingest.run_two_phase (sink="files")."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    from etl_caltopo_spark.streaming.ingest import run_two_phase

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    dim = event_type_rank_dim(ev)
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): the enrich join over zero rows, batch-shaped
        return (
            ev.limit(0)
            .join(F.broadcast(dim), "event_type")
            .select("event_id", "event_type", "type_rank")
        )
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")
    out = run_two_phase(
        spark,
        [ev.filter(F.col("ts") < mid_lit), ev.filter(F.col("ts") >= mid_lit)],
        lambda s: s.join(F.broadcast(dim), "event_type").select(
            "event_id", "event_type", "type_rank"
        ),
        sink="files",
        files_per_phase=4,
        max_files_per_trigger=2,
        prefix="q_stream_enrich_",
    )
    return out.select("event_id", "event_type", "type_rank")


@query(
    "q_stream_hll",
    oracle="""
    WITH h AS (
        SELECT ((((user_id % 2147483648) * 1000003) % 2147483648)
                * 2654435761) % 4294967296 AS hv
        FROM events
    ), r AS (
        SELECT hv >> 28 AS bucket, hv & 268435455 AS w FROM h
    ), regs AS (
        SELECT bucket,
               max(CASE WHEN w = 0 THEN 29
                        ELSE 28 - CAST(floor(log2(w)) AS INT) END) AS mx
        FROM r GROUP BY bucket
    ), agg AS (
        SELECT sum(pow(2.0, -mx)) AS s, count(*) AS nz FROM regs
    )
    SELECT CAST(regs.bucket AS BIGINT) AS bucket,
           CAST(regs.mx AS BIGINT) AS max_rank,
           floor(CASE WHEN (0.673 * 256 / (s + 16 - nz)) <= 40 AND nz < 16
                      THEN 16 * ln(16.0 / (16 - nz))
                      ELSE 0.673 * 256 / (s + 16 - nz) END * 10000) / 10000 AS estimate
    FROM regs, agg
    """,
)
def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog maintenance graded by hash — the NINTH
    streaming-protocol id, and the first whose store merge is the MAX
    monoid rather than sum/top-k: a parquet store holds the 16
    portable-HLL registers and each micro-batch folds its own partial
    registers in by register-wise max via foreachBatch.  Runs as a
    REAL two-phase availableNow protocol (multiple micro-batches per
    phase); phase 2 resumes from committed offsets, and because max is
    idempotent a REPLAYED batch would go undetected — so the graded
    columns include the estimate whose linear-counting branch depends
    on exact register VALUES, and the companion test witnesses that
    both phases actually moved registers.

    This is how a 100 TB stream answers \"distinct users so far\"
    forever in 16 longs: per-batch partial-agg (map-side max), a
    16-row store, no distinct-set state to grow or expire.  Protocol
    plumbing: ingest.run_two_phase."""
    apply_runtime_conf(spark)
    import os

    from etl_caltopo_spark.streaming.ingest import run_two_phase

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    bounds = _ts_bounds(sf_dir, ev)
    if bounds["lo"] is not None:
        mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
        mid_lit = F.lit(mid.isoformat(sep=" ")).cast("timestamp_ntz")

    def regs_of(df: DataFrame) -> DataFrame:
        # id pre-reduced mod 2^31 before the Knuth multiply — identical
        # hv, no int64 overflow at snowflake-scale ids (bigids r14, #35)
        hv = (
            (((F.col("user_id") % 2147483648) * 1000003) % 2147483648)
            * 2654435761
            % 4294967296
        )
        r = df.select(
            F.shiftright(hv, 28).alias("bucket"),
            hv.bitwiseAND(F.lit(268435455)).alias("w"),
        )
        rank = F.when(F.col("w") == 0, F.lit(29)).otherwise(
            28 - F.floor(F.log2("w")).cast("int")
        )
        return r.groupBy("bucket").agg(F.max(rank).alias("mx"))

    def upsert(batch: DataFrame, store: str) -> None:
        delta = regs_of(batch)
        if os.path.exists(store):
            merged = (
                batch.sparkSession.read.parquet(store)
                .unionByName(delta)
                .groupBy("bucket")
                .agg(F.max("mx").alias("mx"))
            )
        else:
            merged = delta
        staged = merged.localCheckpoint()
        staged.write.mode("overwrite").parquet(store)

    if bounds["lo"] is None:
        # empty-input guard (empty sweep r13; see q_stream_watermark_
        # late): zero-row registers through the SAME regs_of — the
        # per-bucket output (regs ⨯ agg) is then empty on both
        # engines (the oracle's FROM regs, agg cross join likewise
        # yields 0 rows)
        regs = regs_of(ev.limit(0))
    else:
        regs = run_two_phase(
            spark,
            [
                ev.filter(F.col("ts") < mid_lit),
                ev.filter(F.col("ts") >= mid_lit),
            ],
            lambda s: s,
            sink="store",
            store_upsert=upsert,
            files_per_phase=4,
            max_files_per_trigger=2,
            prefix="q_stream_hll_",
        )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count("*").alias("nz"),
    )
    # empty registers contribute 2^0 = 1 each (sparse-correct HLL)
    raw = 0.673 * 256 / (F.col("s") + 16 - F.col("nz"))
    est = F.when(
        (raw <= 40) & (F.col("nz") < 16),
        16 * F.log(16.0 / (16 - F.col("nz"))),
    ).otherwise(raw)
    from etl_caltopo_spark.functions.numeric import fround

    return regs.crossJoin(F.broadcast(agg)).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("mx").cast("bigint").alias("max_rank"),
        fround(est, 4).alias("estimate"),
    )

@query(
    "q_stream_foreachbatch_exactly_once",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(event_id AS DECIMAL(38, 0))) AS DECIMAL(38, 0))
               AS sum_event_id
    FROM events
    GROUP BY event_type
    """,
)
def q_stream_foreachbatch_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once idempotent foreachBatch sink under DELIBERATE
    redelivery ([EXT], VERDICT r9 #6): every event streams through the
    two-phase availableNow protocol into the epoch-keyed-overwrite
    parquet sink, and then the FINAL epoch's batch is re-delivered to
    the writer — the at-least-once duplicate a crash between the sink
    write and the commit-log append produces.  The grade aggregates
    the sink contents against the plain batch oracle: the epoch
    overwrite makes the replay a no-op, so counts and exact int64
    sums hash-match; a blind-append sink would double the final
    batch's rows and fail.  This is the idempotence pattern every
    exactly-once file/table sink in the engine rides on
    (streaming/ingest.py epoch_overwrite_writer).

    Scale shape: the streamed plan is a stateless projection (map-only
    per micro-batch, no shuffle); the sink aggregate is one
    event_type groupBy (bounded output).  Redelivery replays ONE
    epoch, not the stream."""
    apply_runtime_conf(spark)
    from etl_caltopo_spark.streaming.ingest import run_two_phase

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    p0 = ev.filter(F.pmod(F.hash("event_id"), F.lit(2)) == 0)
    p1 = ev.filter(F.pmod(F.hash("event_id"), F.lit(2)) != 0)
    out = run_two_phase(
        spark,
        [p0, p1],
        lambda s: s,
        prefix="q_fb_once_",
        replay_last_epoch=True,
    )
    # sum in DECIMAL(38,0) on both sides (bigids r14, knowledge #30's
    # aggregate rule): a sum of snowflake-scale int64 ids overflows
    # long where DuckDB widens to HUGEINT — the decimal sum is exact
    # on both engines and the correct 100 TB aggregate type anyway
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("event_id").cast("decimal(38,0)")).alias("sum_event_id"),
    )
