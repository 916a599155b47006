"""Scheduling anchors: tag fixed-point inheritance (reference
compute_effective_tags, entrypoint.py:111-160) and DAG ordering."""

from __future__ import annotations

import pytest

from serverless_data_lake_spark.pipeline.gold import (
    compute_effective_tags,
    topo_sort,
)
from serverless_data_lake_spark.schema.registry import GoldJobConfig


def job(name, schedule_type="cron", cron="day", deps=()):
    return GoldJobConfig(
        domain="d", name=name, query="SELECT 1",
        schedule_type=schedule_type, cron_schedule=cron,
        dependencies=list(deps),
    )


class TestEffectiveTags:
    def test_cron_keeps_own_tag(self):
        tags = compute_effective_tags([job("a", cron="hour")])
        assert tags["d.a"] == "hour"

    def test_dependency_inherits_consumer(self):
        jobs = [job("base", "dependency"), job("top", cron="hour", deps=["base"])]
        assert compute_effective_tags(jobs)["d.base"] == "hour"

    def test_dependency_inherits_highest_frequency(self):
        jobs = [
            job("base", "dependency"),
            job("daily", cron="day", deps=["base"]),
            job("hourly", cron="hour", deps=["base"]),
            job("monthly", cron="month", deps=["base"]),
        ]
        assert compute_effective_tags(jobs)["d.base"] == "hour"

    def test_transitive_inheritance_fixed_point(self):
        jobs = [
            job("leaf", "dependency"),
            job("mid", "dependency", deps=["leaf"]),
            job("top", cron="hour", deps=["mid"]),
        ]
        tags = compute_effective_tags(jobs)
        assert tags["d.mid"] == "hour"
        assert tags["d.leaf"] == "hour"

    def test_orphan_dependency_defaults_daily(self):
        assert compute_effective_tags([job("solo", "dependency")])["d.solo"] == "day"


class TestTopoSort:
    def test_orders_dependencies_first(self):
        jobs = [job("top", deps=["base"]), job("base")]
        assert [j.name for j in topo_sort(jobs)] == ["base", "top"]

    def test_chain(self):
        jobs = [job("c", deps=["b"]), job("a"), job("b", deps=["a"])]
        names = [j.name for j in topo_sort(jobs)]
        assert names.index("a") < names.index("b") < names.index("c")

    def test_cycle_raises(self):
        jobs = [job("a", deps=["b"]), job("b", deps=["a"])]
        with pytest.raises(ValueError, match="cycle"):
            topo_sort(jobs)

    def test_missing_dep_tolerated(self):
        # A dependency not registered as a job is ignored (it may be a
        # plain silver table name).
        jobs = [job("a", deps=["not_a_job"])]
        assert [j.name for j in topo_sort(jobs)] == ["a"]
