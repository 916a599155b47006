"""Windowed event aggregation — one declaration for batch AND stream.

The reference has no streaming aggregation (SURVEY §2.6 notes its
silver loop is micro-batch upserts); this is the parity-plus operator
an event pipeline needs: tumbling or sliding event-time windows with
counts/sums per key.

``windowed_event_counts`` is a plain DataFrame transformation built
on ``F.window`` — applied to a batch DataFrame it is an ordinary
grouped aggregation; applied to a streaming DataFrame (via
:func:`windowed_event_counts_stream`, which adds the watermark) the
SAME plan runs incrementally with append-mode emission once the
watermark passes each window's end. That one-declaration/two-runtimes
property is the point: the batch run doubles as the correctness
oracle for the stream (see tests/test_windowed.py), exactly like
``sessionize_batch``/``sessionize_stream``.

Scale notes: the aggregation state is per (window, key) — bounded by
watermark horizon × key cardinality, not by event volume; sliding
windows multiply input rows by ``window/slide`` (each event belongs
to that many windows), which is the documented cost of overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "15 minutes",
    slide: str | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-window, per-key count + value sum.

    Returns ``win_start, win_end, <key_col>, n_events, total_value``.
    ``slide`` < ``window_duration`` makes the windows sliding
    (overlapping); default is tumbling. The value sum goes through
    the exact-decimal trick so batch results hash-match a DuckDB
    oracle."""
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        events.groupBy(win.alias("__w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.col(value_col).cast("decimal(38,6)")
            ).cast("double").alias("total_value"),
        )
        .select(
            F.col("__w.start").alias("win_start"),
            F.col("__w.end").alias("win_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def windowed_event_counts_stream(
    events: DataFrame,
    window_duration: str = "15 minutes",
    slide: str | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """The streaming twin: watermark + the identical window plan.
    Append mode emits each (window, key) row exactly once, when the
    watermark passes ``win_end`` — late events inside the delay still
    fold in; later ones are dropped (the standard trade)."""
    return windowed_event_counts(
        events.withWatermark(ts_col, watermark_delay),
        window_duration,
        slide,
        key_col,
        ts_col,
        value_col,
    )
