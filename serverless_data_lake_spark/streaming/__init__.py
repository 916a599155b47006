"""Structured Streaming variants of the pipeline."""

from serverless_data_lake_spark.streaming.silver_stream import start_silver_stream

__all__ = ["start_silver_stream"]
