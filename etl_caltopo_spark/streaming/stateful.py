"""Custom stateful streaming operators (applyInPandasWithState).

For semantics the built-in windowed aggregates can't express —
cross-batch accumulators, custom session logic, alert latches — Spark's
arbitrary-state API is the engine's extension point: state is a typed
tuple per group key, persisted in the state store across micro-batches,
with optional processing-time timeouts for eviction.

Design rules at scale: state per key stays O(1) (counters, not row
buffers); the grouping key is the shuffle key; timeouts bound total
state size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: user_id is NULLABLE (nullkeys sweep r12): a NULL grouping key is a
#: legal group in both engines (groupBy keeps one NULL group) — the
#: key round-trips as None through applyInPandasWithState, and a
#: non-nullable declaration crashes the Arrow read downstream
#: ("Value at index is null" in BigIntVector) the first time a NULL
#: key appears.
RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

#: persisted per-key state: (event count, value sum, non-null count).
#:
#: CHECKPOINT COMPATIBILITY: n_nonnull was added by the r11 extremes
#: sweep (same upgrade contract as SESSION_STATE's r7 note — drain on
#: the old code, restart fresh on this one).
#: total is NULLABLE (ADVICE r11): a NaN total is nan_as_null'd to
#: None on the state round-trip and restored by the ``total is None``
#: branch below — the schema must admit the NULL the design stores.
RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), True),
        StructField("n_nonnull", LongType(), False),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches;
    emit the updated running totals each batch.

    SQL-sum semantics over the Arrow boundary (extremes sweep r11):
    Arrow hands pandas a float64 column in which SQL NULL and a true
    NaN value are the SAME NaN, and pandas ``.sum()`` default-skips
    both — so a genuine NaN observation silently vanished where
    SQL sum propagates it.  The caller therefore pre-splits the
    column into ``_v_filled`` (NULL→0.0, real values untouched) and
    ``_v_nonnull`` (0/1); the fold sums ``_v_filled`` with
    ``skipna=False`` so NaN/±inf propagate exactly like SQL sum, and
    the emitted total is NULL iff no non-null value was ever seen —
    the SQL all-NULL-group result."""
    (user_id,) = key
    n, total, n_nonnull = state.get if state.exists else (0, 0.0, 0)
    if total is None:  # a NaN total nan_as_null'd on the state round-trip
        total = float("nan")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["_v_filled"].sum(skipna=False))
        n_nonnull += int(pdf["_v_nonnull"].sum())
    state.update((n, total, n_nonnull))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": _float_or_null(total, bool(n_nonnull)),
        }
    )


def _float_or_null(value: float, valid: bool):
    """One-element nullable float column that can carry a TRUE NaN.

    A plain float64 NaN is re-read as SQL NULL on the Arrow boundary
    out of a pandas UDF (nan_as_null) — so a NaN running total (a
    genuine NaN observation, extremes r11) silently became NULL where
    SQL sum yields NaN.  FloatingArray's explicit mask separates the
    two: masked → NULL, unmasked NaN → NaN."""
    import numpy as np

    return pd.arrays.FloatingArray(
        np.array([value if valid else 0.0], dtype=np.float64),
        np.array([not valid]),
    )


SESSION_OUTPUT = StructType(
    [
        # nullable for the same NULL-grouping-key reason as
        # RUNNING_TOTALS_OUTPUT (nullkeys r12)
        StructField("user_id", LongType(), True),
        StructField("session_start_ms", LongType(), False),
        StructField("session_end_ms", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

#: per-key PENDING sessions (closed-in-batch but not yet watermark-
#: final, plus the open one), as parallel arrays sorted by start —
#: a session leaves state only when the watermark proves no more
#: events can join it (advisor r6: eager batch-time emission let a
#: within-watermark late event belong to an already-emitted session,
#: bridge two sessions, or arrive before the open session's start)
#:
#: CHECKPOINT COMPATIBILITY (advisor r7): this schema replaced the
#: r6 three-scalar state (start_ms, last_ms, n_events).  A stream
#: restarted from an r6-era checkpoint will fail to deserialize its
#: state — an in-place upgrade of a long-running sessionizer stream
#: must drain (finish with availableNow) on the old code and start a
#: fresh checkpoint on this version.  No migration shim is carried:
#: the suite's checkpoints are per-run temp dirs, so the shim would
#: be untestable dead code here; this note is the contract.
SESSION_STATE = StructType(
    [
        StructField("starts", ArrayType(LongType(), False), False),
        StructField("lasts", ArrayType(LongType(), False), False),
        StructField("ns", ArrayType(LongType(), False), False),
    ]
)


def _make_session_fn(gap_ms: int):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        sessions: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns)]
        if not state.hasTimedOut:
            # collect the batch's timestamps (micro-batch row order is
            # not time order) and take the interval UNION of pending
            # sessions + single-event intervals: a late-but-within-
            # watermark event extends a pending session backwards or
            # forwards, bridges two pending sessions into one, and
            # inactivity >= gap still splits — all from one sort+merge
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
            if ts_all:
                intervals = sessions + [[t, t, 1] for t in ts_all]
                intervals.sort(key=lambda iv: (iv[0], iv[1]))
                merged = [intervals[0]]
                for iv in intervals[1:]:
                    cur = merged[-1]
                    if iv[0] - cur[1] < gap_ms:
                        cur[1] = max(cur[1], iv[1])
                        cur[2] += iv[2]
                    else:
                        merged.append(iv)
                sessions = merged
        # emit ONLY sessions the watermark has sealed (no event can
        # merge into [start, last] once wm >= last + gap: later input
        # below the watermark is dropped before this operator) — the
        # docstring contract, on both the row and the timeout path
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in sessions if s[1] + gap_ms <= wm]
        pending = [s for s in sessions if s[1] + gap_ms > wm]
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_ms": [c[0] for c in closed],
                    "session_end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )
        if pending:
            state.update(
                (
                    [s[0] for s in pending],
                    [s[1] for s in pending],
                    [s[2] for s in pending],
                )
            )
            # wake when the earliest pending session can be sealed
            # (> wm by construction of `pending`, as EventTimeTimeout
            # requires)
            state.setTimeoutTimestamp(min(s[1] for s in pending) + gap_ms)
        else:
            state.remove()
        return
        yield  # pragma: no cover - makes fn a generator

    return fn


def sessionize_with_timeout(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Watermark-driven sessionization with event-time state timeout:
    a session row is emitted only when the watermark proves no more
    events can join it (the state-eviction pattern that bounds memory
    on unbounded keys).  ``events`` must already carry a watermark on
    ``ts``."""
    n, unit = gap.split()
    unit = unit.rstrip("s") + "s"  # accept '1 hour' as well as '2 hours'
    gap_ms = int(n) * {"minutes": 60_000, "seconds": 1_000, "hours": 3_600_000}[unit]
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same semantics as :func:`running_user_totals`, implemented on
    Spark 4's ``transformWithStateInPandas`` — the arbitrary-state v2
    API (typed state handles, timers, TTL, state schema evolution)
    that succeeds applyInPandasWithState.  Requires the RocksDB state
    store provider (tests set
    ``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` wheel (Spark's TWS python runner imports
    google.protobuf at runtime; absent in this sandbox, so the test
    importorskips — :func:`running_user_totals` is the always-on
    twin)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", RUNNING_TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            # same SQL-sum-over-Arrow discipline as _running_totals_fn
            n, total, n_nonnull = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            if total is None:  # NaN nan_as_null'd on the state round-trip
                total = float("nan")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["_v_filled"].sum(skipna=False))
                n_nonnull += int(pdf["_v_nonnull"].sum())
            self._state.update((n, total, n_nonnull))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": _float_or_null(total, bool(n_nonnull)),
                }
            )

        def close(self) -> None:
            pass

    return _split_value_for_sum(events).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def _split_value_for_sum(events: DataFrame):
    """Pre-split ``value`` so the pandas fold can honor SQL sum
    semantics (see :func:`_running_totals_fn`): NULLs become 0.0 +
    a zero non-null flag BEFORE Arrow conflates them with NaN.

    Magnitude bound (ADVICE r11): a FINITE observation with
    ``|v| >= 1e100`` is treated as NULL — the skipna=False running
    sum is otherwise ORDER-DEPENDENT at extreme magnitudes (the
    arrival-order fold can overflow to ±inf, e.g. 1.7e308 + 1.7e308
    - 1.7e308, where a different accumulation order stays finite),
    and micro-batch arrival order is not a portable quantity.  NaN
    and ±inf themselves stay IN: once present they saturate the sum
    identically in any order (x + NaN = NaN; inf folds to inf or,
    meeting -inf, to NaN — both order-independent), matching SQL sum
    on both engines.  Same 1e100 bound as the variance family
    (functions/numeric._VAR_SAFE); the oracle mirror is
    ``CASE WHEN isfinite(value) AND abs(value) >= 1e100 THEN NULL
    ELSE value END`` (q_stream_stateful_totals)."""
    from pyspark.sql import functions as F

    from etl_caltopo_spark.functions.numeric import _VAR_SAFE, finite

    v = F.col("value")
    oversized = finite(v) & (F.abs(v) >= F.lit(_VAR_SAFE))
    v_dom = F.when(oversized, F.lit(None).cast("double")).otherwise(v)
    return events.select(
        "user_id",
        F.coalesce(v_dom, F.lit(0.0)).alias("_v_filled"),
        v_dom.isNotNull().cast("long").alias("_v_nonnull"),
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cross-batch per-user running totals — a custom stateful
    operator the built-in aggregates can't express in update mode with
    arbitrary state shape.  Works on a streaming DataFrame grouped by
    user_id; one state tuple per user."""
    return _split_value_for_sum(events).groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
