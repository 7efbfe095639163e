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

#: per-key open-session state: (start epoch-ms, last epoch-ms, count)
SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def _make_session_fn(gap_ms: int):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the session is closed
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                }
            )
            return
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        # collect and SORT the batch's timestamps: micro-batch row
        # order is not time order, and the session walk below is
        # order-sensitive (code-review r6 — the old loop latched
        # start_ms to the first row seen and never split on gap)
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
        ts_all.sort()
        closed: list[tuple[int, int, int]] = []
        for t in ts_all:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms >= gap_ms:
                # inactivity >= gap splits sessions EVEN WITHIN ONE
                # micro-batch — the old code merged any same-batch
                # events into one session regardless of gap, diverging
                # from session_window / q_stream_session semantics
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms = max(last_ms, t)
                n += 1
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_ms": [c[0] for c in closed],
                    "session_end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )
        state.update((start_ms, last_ms, n))
        # close when the event-time watermark passes last event + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)
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
