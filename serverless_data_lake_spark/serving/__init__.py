"""Serving layer: HTTP facade over the Lake + chart heuristic."""

from serverless_data_lake_spark.serving.chart import suggest_chart
from serverless_data_lake_spark.serving.api import LakeServer

__all__ = ["LakeServer", "suggest_chart"]
