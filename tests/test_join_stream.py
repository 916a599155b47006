"""Stream-stream interval join: the streaming result must agree with
the batch interval join (one declaration, two runtimes)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from serverless_data_lake_spark.streaming.join_stream import (
    interval_join,
    interval_join_stream,
)

IMP_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("imp_id", LongType()),
        StructField("imp_ts", TimestampType()),
    ]
)
CLK_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("clk_id", LongType()),
        StructField("clk_ts", TimestampType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 10, minute, second)


IMPRESSIONS = [
    ("u1", 1, _t(0)),
    ("u1", 2, _t(20)),
    ("u2", 3, _t(5)),
]
CLICKS = [
    ("u1", 10, _t(2)),    # within 5 min of imp 1
    ("u1", 11, _t(21)),   # within 5 min of imp 2
    ("u1", 12, _t(40)),   # matches nothing
    ("u2", 13, _t(4, 59)),  # just inside imp 3's window... arrives BEFORE imp
]


class TestBatchIntervalJoin:
    def test_window_bounds(self, spark):
        imps = spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA)
        clks = spark.createDataFrame(CLICKS, CLK_SCHEMA)
        out = interval_join(
            imps, clks, ["user_id"], "imp_ts", "clk_ts",
            lower="30 seconds", upper="5 minutes",
        )
        got = {(r.imp_id, r.clk_id) for r in out.collect()}
        # clk 13 at 04:59 is 1 s BEFORE imp 3 (05:00) — inside the
        # 30 s lower tolerance.
        assert got == {(1, 10), (2, 11), (3, 13)}


class TestStreamIntervalJoin:
    def test_stream_agrees_with_batch(self, spark, tmp_path):
        imps_b = spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA)
        clks_b = spark.createDataFrame(CLICKS, CLK_SCHEMA)
        expected = {
            (r.imp_id, r.clk_id)
            for r in interval_join(
                imps_b, clks_b, ["user_id"], "imp_ts", "clk_ts",
                lower="30 seconds", upper="5 minutes",
            ).collect()
        }

        imp_dir = tmp_path / "imps"
        clk_dir = tmp_path / "clks"
        imp_dir.mkdir()
        clk_dir.mkdir()
        imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
        clks = spark.readStream.schema(CLK_SCHEMA).json(str(clk_dir))
        out = interval_join_stream(
            imps, clks, ["user_id"], "imp_ts", "clk_ts",
            lower="30 seconds", upper="5 minutes",
            watermark_delay="10 seconds",
        )
        query = (
            out.writeStream.format("memory")
            .queryName("ij_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            imps_b.coalesce(1).write.mode("append").json(str(imp_dir))
            clks_b.coalesce(1).write.mode("append").json(str(clk_dir))
            deadline = time.time() + 90
            got: set = set()
            flushed = False
            while time.time() < deadline:
                query.processAllAvailable()
                got = {
                    (r.imp_id, r.clk_id)
                    for r in spark.table("ij_out").collect()
                }
                if got >= expected:
                    break
                if not flushed:
                    # Advance both watermarks past every window.
                    late = _t(0) + dt.timedelta(days=1)
                    spark.createDataFrame(
                        [("zz", 99, late)], IMP_SCHEMA
                    ).coalesce(1).write.mode("append").json(str(imp_dir))
                    spark.createDataFrame(
                        [("zz", 99, late)], CLK_SCHEMA
                    ).coalesce(1).write.mode("append").json(str(clk_dir))
                    flushed = True
                time.sleep(1)
            assert got == expected, f"got {got}, want {expected}"
        finally:
            query.stop()
        spark.catalog.dropTempView("ij_out")
