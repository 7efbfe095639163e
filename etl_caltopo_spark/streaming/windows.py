"""Windowed aggregations — batch/stream polymorphic.

Each operator takes any DataFrame (batch or streaming) and returns the
windowed aggregate.  Batch-first rule (SURVEY §2.3): the batch result
over events.parquet is the semantic contract; streaming equivalence is
asserted in tests via ``availableNow`` runs.

Tumbling/sliding windows align to the 1970-01-01 UTC epoch (Spark's
``window()`` origin).  Session windows close after ``gap`` of
inactivity: an event at exactly ``prev_ts + gap`` starts a NEW session
(Spark's session end bound is exclusive).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(df: DataFrame, window_fields: dict[str, str]) -> DataFrame:
    """Replace the struct-typed window column 'w' with flat timestamp
    columns; keep every other column (keys + aggregate aliases)."""
    others = [c for c in df.columns if c != "w"]
    return df.select(
        *[F.col(f"w.{src}").alias(dst) for src, dst in window_fields.items()],
        *others,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling window aggregate; emits ``window_start``/``window_end``."""
    out = df.groupBy(F.window(ts_col, duration).alias("w"), *keys).agg(*aggs)
    return _flatten(out, {"start": "window_start", "end": "window_end"})


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding (hopping) window aggregate — each event lands in
    ``duration/slide`` windows."""
    out = df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys).agg(*aggs)
    return _flatten(out, {"start": "window_start", "end": "window_end"})


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session window aggregate: per-key sessions separated by >= gap
    of inactivity.  ``session_start`` is the first event's timestamp
    (== min(ts) — what a gaps-and-islands SQL oracle computes)."""
    out = df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys).agg(*aggs)
    return _flatten(out, {"start": "session_start"})
