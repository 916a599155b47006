"""Sessionization: batch (oracle) + streaming applyInPandasWithState
agree; streaming emits closed sessions and times out open ones."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from serverless_data_lake_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


EVENTS = [
    # user 1: two sessions separated by a >30-minute gap
    (1, _t(0), 1.0),
    (1, _t(5), 2.0),
    (1, _t(50), 3.0),
    (1, _t(55), 4.0),
    # user 2: one session
    (2, _t(10), 10.0),
    (2, _t(12), 10.0),
]


class TestBatch:
    def test_sessions(self, spark):
        df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        out = sessionize_batch(df, gap_seconds=1800).orderBy(
            "user_id", "session_start"
        ).collect()
        assert len(out) == 3
        s1, s2, s3 = out
        assert (s1.user_id, s1.n_events, s1.total_value) == (1, 2, 3.0)
        assert s1.session_start == _t(0) and s1.session_end == _t(5)
        assert (s2.user_id, s2.n_events, s2.total_value) == (1, 2, 7.0)
        assert (s3.user_id, s3.n_events, s3.total_value) == (2, 2, 20.0)

    def test_matches_reference_gap_edge(self, spark):
        # Exactly-gap spacing does NOT split (strictly greater splits).
        df = spark.createDataFrame(
            [(1, _t(0), 1.0), (1, _t(30), 1.0)], EVENT_SCHEMA
        )
        assert sessionize_batch(df, gap_seconds=1800).count() == 1


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _session_fn."""

    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self._wm = watermark_ms

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def setTimeoutTimestamp(self, ms):
        if ms <= self._wm:
            raise AssertionError(
                f"timeout {ms} <= watermark {self._wm}: Spark would abort"
            )
        self.timeout_set = ms

    def getCurrentWatermarkMs(self):
        return self._wm


class TestStateFn:
    """Out-of-order/late-event semantics of the stateful function
    (r1 advice): late events extend start_ms; events older than the
    open session by more than the gap form their own session; the
    timeout timestamp never lands at/below the watermark."""

    def _run(self, fn, user, events_ms, state):
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "user_id": [user] * len(events_ms),
                "ts": [pd.Timestamp(t, unit="ms") for t in events_ms],
                "value": [1.0] * len(events_ms),
            }
        )
        return list(fn((user,), iter([pdf]), state))

    def test_late_event_extends_session_start(self):
        from serverless_data_lake_spark.streaming.sessionize import _session_fn

        fn = _session_fn(gap_seconds=60)
        # Open session [100_000, 100_000]; late event at 70_000 is
        # within the gap → merges AND start_ms moves back.
        state = _FakeState(value=(100_000, 100_000, 1, 1.0))
        out = self._run(fn, 1, [70_000], state)
        assert out == []  # nothing closed
        assert state.get == (70_000, 100_000, 2, 2.0)

    def test_event_before_session_beyond_gap_closes_own_session(self):
        from serverless_data_lake_spark.streaming.sessionize import _session_fn

        fn = _session_fn(gap_seconds=60)
        state = _FakeState(value=(500_000, 500_000, 1, 1.0))
        out = self._run(fn, 1, [100_000, 110_000], state)
        # The two old events merge into one bygone session, emitted
        # closed; the open session is untouched.
        assert len(out) == 1
        row = out[0].iloc[0]
        assert int(row.n_events) == 2
        assert state.get == (500_000, 500_000, 1, 1.0)

    def test_timeout_clamped_above_watermark(self):
        from serverless_data_lake_spark.streaming.sessionize import _session_fn

        fn = _session_fn(gap_seconds=60)
        # Watermark far past session end + gap: raw timeout would be
        # 160_000 <= watermark → must clamp (FakeState asserts).
        state = _FakeState(watermark_ms=10_000_000)
        self._run(fn, 1, [100_000], state)
        assert state.timeout_set == 10_000_001

    def test_in_order_batch_splits_on_gap(self):
        from serverless_data_lake_spark.streaming.sessionize import _session_fn

        fn = _session_fn(gap_seconds=60)
        state = _FakeState()
        out = self._run(fn, 1, [0, 10_000, 200_000], state)
        assert len(out) == 1  # first session closed
        assert state.get[0] == 200_000  # second stays open


class TestStream:
    def test_stream_agrees_with_batch(self, spark, tmp_path):
        src = tmp_path / "events_in"
        src.mkdir()
        batch_df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        expected = {
            (r.user_id, r.session_start, r.n_events, r.total_value)
            for r in sessionize_batch(batch_df, gap_seconds=1800).collect()
        }

        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .json(str(src))
        )
        sessions = sessionize_stream(stream, gap_seconds=1800)
        query = (
            sessions.writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            # Feed events, then an event far in the future so the
            # watermark passes every session's timeout.
            batch_df.coalesce(1).write.mode("append").json(str(src))
            flush = spark.createDataFrame(
                [(99, _t(0) + dt.timedelta(days=1), 0.0)], EVENT_SCHEMA
            )
            deadline = time.time() + 90
            flushed = False
            got = set()
            while time.time() < deadline:
                query.processAllAvailable()
                got = {
                    (r.user_id, r.session_start, r.n_events, r.total_value)
                    for r in spark.table("sessions_out").collect()
                }
                if got >= expected:
                    break
                if not flushed:
                    flush.coalesce(1).write.mode("append").json(str(src))
                    flushed = True
                    # second micro-batch advances the watermark; a third
                    # empty-ish pass fires the event-time timeouts
                    flush.coalesce(1).write.mode("append").json(str(src))
                time.sleep(1)
            assert got >= expected, f"missing: {expected - got}"
        finally:
            query.stop()
