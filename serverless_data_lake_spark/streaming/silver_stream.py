"""Continuous bronze→silver processing via Structured Streaming.

The reference's ingestion is event-driven micro-batching: Firehose
buffers 5 MB / 60 s into S3, an S3 event fires a per-object merge
Lambda (SURVEY §2.6). The Spark-native equivalent is a file-source
stream over the bronze prefix with a 60 s trigger and a
``foreachBatch`` that runs **the same dedup+MERGE code** as the batch
path — identical semantics, exactly-once per micro-batch via the
checkpointed file-source log.

No watermarks are required for parity (the reference has none; late
and duplicate data are handled by the idempotent PK upsert). Windowed
/ stateful extensions can be layered on the same stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from serverless_data_lake_spark.config import LakeConfig
from serverless_data_lake_spark.pipeline.silver import SilverProcessor


def start_silver_stream(
    spark: SparkSession,
    config: LakeConfig,
    domain: str,
    endpoint: str,
    schema: StructType,
    checkpoint_dir: str | None = None,
    trigger_seconds: int = 60,
) -> StreamingQuery:
    """Start the continuous bronze→silver job for one endpoint.

    ``schema`` is required (streaming file sources don't infer); take
    it from the registry (``to_struct_type``) plus the metadata
    columns. The per-batch work is delegated to
    :meth:`SilverProcessor.process_batch`, so batch and streaming can
    never diverge semantically."""
    processor = SilverProcessor(spark, config)
    path = config.bronze_path(domain, endpoint)
    checkpoint = checkpoint_dir or f"{config.root}/_checkpoints/{domain}/{endpoint}"

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1000)
        .json(path)
    )

    def handle_batch(batch_df, batch_id: int) -> None:  # noqa: ANN001
        if batch_df.isEmpty():
            return
        processor.process_batch(domain, endpoint, batch_df)

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
