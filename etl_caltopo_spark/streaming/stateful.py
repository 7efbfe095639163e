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

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

#: persisted per-key state: (event count, value sum)
RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches;
    emit the updated running totals each batch."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
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
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cross-batch per-user running totals — a custom stateful
    operator the built-in aggregates can't express in update mode with
    arbitrary state shape.  Works on a streaming DataFrame grouped by
    user_id; one state tuple per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
