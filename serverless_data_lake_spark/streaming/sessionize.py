"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stateful streaming (SURVEY §2.6) — this is one
of the parity-plus operators a training-data/event pipeline needs:
group events into sessions that close after ``gap_seconds`` of
inactivity per key.

Two implementations with identical semantics:

- ``sessionize_batch`` — pure DataFrame ops (window lag + cumulative
  session ids); used for backfills and as the correctness oracle.
- ``sessionize_stream`` — ``applyInPandasWithState`` over a stream:
  per-key state carries the open session; events roll into it or
  close it; closed sessions are emitted, the open one is held in
  state (flushed on watermark-driven timeout). This is the canonical
  Spark pattern for custom stateful operators — state is
  partition-local, scales horizontally with keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization: a new session starts where the gap from
    the previous event of the same key exceeds ``gap_seconds``; the
    session id is the running count of such boundaries (two window
    passes over one shuffle-partitioning by key)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    with_bounds = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0),
    ).withColumn(
        "__session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_bounds.groupBy(key_col, "__session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_col).cast("double").alias("total_value"),
        )
        .drop("__session_id")
    )


def _session_fn(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ms, end_ms, n, total = state.get
                state.remove()
                yield _emit(user_id, start_ms, end_ms, n, total)
            return

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        vals = rows["value"].fillna(0.0).tolist()

        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start_ms, end_ms, n, total = state.get
        else:
            start_ms, end_ms, n, total = None, None, 0, 0.0

        for t, v in zip(ts_ms, vals):
            if start_ms is None:
                start_ms, end_ms, n, total = t, t, 1, float(v)
            elif t - end_ms > gap_ms:
                closed.append((start_ms, end_ms, n, total))
                start_ms, end_ms, n, total = t, t, 1, float(v)
            else:
                end_ms = max(end_ms, t)
                n += 1
                total += float(v)

        state.update((start_ms, end_ms, n, total))
        # Close the open session after gap_seconds of event-time
        # silence (watermark advances the clock).
        state.setTimeoutTimestamp(end_ms + gap_ms)
        for s in closed:
            yield _emit(user_id, *s)

    def _emit(user_id, start_ms, end_ms, n, total) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming sessionization over an event stream with columns
    (user_id, ts, value). Emits a row per *closed* session; open
    sessions close via event-time timeout once the watermark passes
    session_end + gap."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
