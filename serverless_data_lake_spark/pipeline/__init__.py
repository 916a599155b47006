"""Pipeline jobs: bronze→silver processing, gold transform jobs."""

from serverless_data_lake_spark.pipeline.gold import GoldRunner, compute_effective_tags
from serverless_data_lake_spark.pipeline.silver import SilverProcessor

__all__ = ["GoldRunner", "SilverProcessor", "compute_effective_tags"]
