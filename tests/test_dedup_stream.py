"""Streaming dedup: cross-micro-batch duplicate suppression agrees
with the batch ``dropDuplicates`` oracle."""

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

from serverless_data_lake_spark.streaming.dedup_stream import (
    dedup_stream,
    dedup_stream_exact,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 10, minute, second)


# Duplicate event_ids carry IDENTICAL payloads (at-least-once
# redelivery), so whichever copy wins, the surviving row is the same
# — making the batch/stream comparison deterministic.
BATCH_1 = [
    (1, "u1", _t(0, 10), 1.0),
    (2, "u2", _t(0, 20), 2.0),
    (1, "u1", _t(0, 10), 1.0),  # in-batch duplicate
]
BATCH_2 = [
    (2, "u2", _t(0, 20), 2.0),  # cross-batch duplicate
    (3, "u1", _t(0, 40), 3.0),
]


def _run_stream(spark, tmp_path, make_out):
    src = tmp_path / "dedup_in"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = make_out(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for batch in (BATCH_1, BATCH_2):
            spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
                "append"
            ).json(str(src))
            query.processAllAvailable()
        deadline = time.time() + 60
        rows: list = []
        while time.time() < deadline:
            query.processAllAvailable()
            rows = spark.table("dedup_out").collect()
            if len(rows) >= 3:
                break
            time.sleep(1)
    finally:
        query.stop()
    spark.catalog.dropTempView("dedup_out")
    return rows


class TestDedupStream:
    def test_watermark_dedup_agrees_with_batch(self, spark, tmp_path):
        rows = _run_stream(
            spark,
            tmp_path,
            lambda s: dedup_stream(
                s, ["event_id"], ts_col="ts", watermark_delay="1 hour"
            ),
        )
        batch = (
            spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA)
            .dropDuplicates(["event_id"])
            .collect()
        )
        got = sorted((r.event_id, r.user_id, r.value) for r in rows)
        want = sorted((r.event_id, r.user_id, r.value) for r in batch)
        assert got == want

    def test_exact_dedup_agrees_with_batch(self, spark, tmp_path):
        rows = _run_stream(
            spark, tmp_path, lambda s: dedup_stream_exact(s, ["event_id"])
        )
        got = sorted(r.event_id for r in rows)
        assert got == [1, 2, 3]
