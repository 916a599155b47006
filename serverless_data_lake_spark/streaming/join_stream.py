"""Stream-stream interval join — correlate two event streams by key
within a time window.

The reference has no stream-stream correlation (its streams terminate
in per-object silver upserts); this is the parity-plus operator an
event pipeline needs for enrichment at ingest time: e.g. click
streams joined to impression streams within an attribution window.

Structured Streaming executes this with state on BOTH sides, bounded
by the watermarks plus the interval: a left row is held until the
right watermark passes ``left_ts + upper`` (no more matches can
arrive), then evicted — state is O(rows within the interval horizon),
not O(stream). The same plan on batch DataFrames is an ordinary
range-condition join, which is the correctness oracle
(tests/test_join_stream.py) — one declaration, two runtimes, like
``windowed.py`` / ``sessionize.py`` / ``dedup_stream.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
) -> DataFrame:
    """Equi-join on ``on`` with ``right_ts`` constrained to
    ``[left_ts − lower, left_ts + upper]``. Works identically on
    batch and streaming DataFrames (streaming callers add watermarks
    first — see :func:`interval_join_stream`). Both inputs must have
    disjoint non-key column names (rename before joining); the key
    columns appear once in the output."""
    cond = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, on=on, how="inner").where(cond)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """The streaming twin: watermark both sides, then the identical
    interval join. The watermark delay is the reordering tolerance;
    the interval (``lower``/``upper``) is the correlation window —
    together they bound the join state Spark keeps per side."""
    return interval_join(
        left.withWatermark(left_ts, watermark_delay),
        right.withWatermark(right_ts, watermark_delay),
        on,
        left_ts,
        right_ts,
        lower,
        upper,
    )
