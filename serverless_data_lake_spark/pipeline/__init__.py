"""Pipeline jobs: bronze→silver processing, gold transform jobs,
declarative corpus curation."""

from serverless_data_lake_spark.pipeline.curation import (
    CurationPipeline,
    StageReport,
)
from serverless_data_lake_spark.pipeline.gold import (
    GoldRunner,
    compute_effective_tags,
)
from serverless_data_lake_spark.pipeline.silver import SilverProcessor

__all__ = [
    "CurationPipeline",
    "GoldRunner",
    "SilverProcessor",
    "StageReport",
    "compute_effective_tags",
]
