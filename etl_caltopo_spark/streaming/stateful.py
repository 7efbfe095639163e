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
