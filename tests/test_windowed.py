"""Windowed aggregation: batch/stream agreement (the one-declaration
two-runtimes property) and sliding-window membership."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from serverless_data_lake_spark.streaming.windowed import (
    windowed_event_counts,
    windowed_event_counts_stream,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 10, minute, second)


EVENTS = [
    ("click", _t(0, 10), 1.0, 1),
    ("click", _t(4, 50), 2.0, 2),
    ("view", _t(2, 0), 5.0, 3),
    ("click", _t(7, 30), 3.0, 4),   # next 5-min window
    ("view", _t(11, 0), 7.0, 5),    # third window
]


class TestBatch:
    def test_tumbling_counts(self, spark):
        df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        out = {
            (r.win_start, r.event_type): (r.n_events, r.total_value)
            for r in windowed_event_counts(df, "5 minutes").collect()
        }
        assert out[(_t(0), "click")] == (2, 3.0)
        assert out[(_t(0), "view")] == (1, 5.0)
        assert out[(_t(5), "click")] == (1, 3.0)
        assert out[(_t(10), "view")] == (1, 7.0)

    def test_sliding_window_membership(self, spark):
        df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        rows = windowed_event_counts(
            df, "10 minutes", slide="5 minutes"
        ).collect()
        # event at 07:30 belongs to windows [00,10) and [05,15)
        starts = {
            r.win_start for r in rows if r.event_type == "click" and r.n_events
        }
        assert _t(0) in starts and _t(5) in starts

    def test_window_bounds(self, spark):
        df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        r = next(
            r
            for r in windowed_event_counts(df, "5 minutes").collect()
            if r.win_start == _t(0) and r.event_type == "click"
        )
        assert r.win_end == _t(5)


class TestStream:
    def test_stream_agrees_with_batch(self, spark, tmp_path):
        src = tmp_path / "win_in"
        src.mkdir()
        batch_df = spark.createDataFrame(EVENTS, EVENT_SCHEMA)
        expected = {
            (r.win_start, r.event_type, r.n_events, r.total_value)
            for r in windowed_event_counts(batch_df, "5 minutes").collect()
        }

        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        out = windowed_event_counts_stream(
            stream, "5 minutes", watermark_delay="5 seconds"
        )
        query = (
            out.writeStream.format("memory")
            .queryName("win_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            batch_df.coalesce(1).write.mode("append").json(str(src))
            flush = spark.createDataFrame(
                [("flush", _t(0) + dt.timedelta(days=1), 0.0, 99)],
                EVENT_SCHEMA,
            )
            deadline = time.time() + 90
            flushed = False
            got: set = set()
            while time.time() < deadline:
                query.processAllAvailable()
                got = {
                    (r.win_start, r.event_type, r.n_events, r.total_value)
                    for r in spark.table("win_out").collect()
                }
                if got >= expected:
                    break
                if not flushed:
                    flush.coalesce(1).write.mode("append").json(str(src))
                    flushed = True
                    flush.coalesce(1).write.mode("append").json(str(src))
                time.sleep(1)
            assert got >= expected, f"missing: {expected - got}"
        finally:
            query.stop()
