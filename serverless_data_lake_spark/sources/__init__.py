"""Data sources and sinks: bronze JSONL zone, REST connector."""

from serverless_data_lake_spark.sources.bronze import BronzeZone

__all__ = ["BronzeZone"]
