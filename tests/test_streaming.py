"""Structured-Streaming bronze→silver: the foreachBatch path shares
the batch merge code, with a file-source checkpoint (reference §2.6:
Firehose micro-batching → per-object merge)."""

from __future__ import annotations

import time

from pyspark.sql.types import StructType

from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
    to_struct_type,
)
from serverless_data_lake_spark.streaming import start_silver_stream


def _wait(predicate, timeout=60.0, interval=0.5):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


def test_stream_merges_batches(spark, lake):
    schema = EndpointSchema(
        domain="iot", name="readings",
        columns=[
            ColumnDef("device_id", DataType.INTEGER, required=True,
                      primary_key=True),
            ColumnDef("temp", DataType.DOUBLE),
        ],
    )
    lake.create_endpoint(schema)
    lake.ingest_batch("iot", "readings",
                      [{"device_id": 1, "temp": 20.0},
                       {"device_id": 2, "temp": 21.0}])

    stream_schema: StructType = to_struct_type(schema.columns)
    for meta in ("_insert_date", "_domain", "_endpoint"):
        stream_schema = stream_schema.add(meta, "string")

    query = start_silver_stream(
        spark, lake.config, "iot", "readings",
        schema=stream_schema, trigger_seconds=1,
    )
    try:
        # processAllAvailable blocks until every currently-available
        # file is processed — deterministic, no sleep-polling.
        query.processAllAvailable()
        assert lake.store.table_exists("iot_silver", "readings")
        assert lake.store.read("iot_silver", "readings").count() == 2
        # Late update for device 1 + new device 3 in a second object.
        lake.ingest_batch("iot", "readings",
                          [{"device_id": 1, "temp": 25.0},
                           {"device_id": 3, "temp": 19.0}])
        query.processAllAvailable()
        rows = {
            r.device_id: r.temp
            for r in lake.store.read("iot_silver", "readings").collect()
        }
        assert len(rows) == 3
        assert rows[1] == 25.0  # micro-batch upsert overwrote
        assert rows[3] == 19.0
    finally:
        query.stop()
