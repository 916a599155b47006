"""Streaming deduplication — the streaming twin of the silver
pipeline's PK dedup (reference R12; ``operators/dedup.py``).

The reference dedups per micro-batch inside its event-driven silver
job (``serverless_processing_iceberg/main.py:64-74``) — duplicates
*across* batches are only caught by the MERGE's key match. A true
streaming source (at-least-once delivery: Kinesis, Kafka) needs
dedup across batches too, which is exactly Structured Streaming's
``dropDuplicates`` family:

- :func:`dedup_stream` — watermark-bounded state
  (``dropDuplicatesWithinWatermark``): a key is suppressed for the
  watermark horizon after first sight, then its state is evicted.
  State is O(keys seen within the horizon), the production shape —
  at-least-once sources re-deliver within bounded lag, so a horizon
  ≥ the delivery lag gives effectively-exactly-once.
- :func:`dedup_stream_exact` — unbounded state (``dropDuplicates``):
  exact forever, state grows with distinct keys. Only for bounded
  key spaces; kept for parity with batch semantics.

Both emit in append mode and share their contract with the batch
``dropDuplicates(keys)`` — the batch run is the correctness oracle
(tests/test_dedup_stream.py), the same one-declaration/two-runtimes
property as ``windowed.py`` and ``sessionize.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """First event per key wins; re-deliveries of the same key within
    the watermark horizon are dropped and the key's state is evicted
    once the watermark passes. ``events`` must be a streaming
    DataFrame with an event-time column ``ts_col``."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_stream_exact(events: DataFrame, keys: list[str]) -> DataFrame:
    """First event per key wins, forever — unbounded state. Prefer
    :func:`dedup_stream` for unbounded key spaces."""
    return events.dropDuplicates(keys)
