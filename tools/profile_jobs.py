"""Per-entry Spark job/stage profiler (r11, verdict #2).

Runs selected `queries()` entries warm at a given sf_dir and reports,
per entry: wall seconds, number of Spark JOBS, number of STAGES, and
total task count — via `statusTracker` + a per-entry job group (a
py4j callback-server listener can't open its socket in this
sandbox). The dedup family's sf0.1 cost is hypothesized to be
`stages × ~0.25 s` scheduling floor (every member already crosses
over to beat the DuckDB oracle at sf1), so the lever is stage COUNT,
not per-stage work. This tool makes that visible before/after a cut.

Usage:
    python tools/profile_jobs.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_ENTRIES = [
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "ngram_jaccard_prefix",
    "minhash_lsh_pairs",
    "exact_substring_dedup",
]


def _group_counts(spark, group: str) -> tuple[int, int, int]:
    """(jobs, stages, tasks) recorded under a job group."""
    tracker = spark.sparkContext.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stages = 0
    tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                stages += 1
                tasks += sinfo.numTasks
    return len(job_ids), stages, tasks


def main() -> None:
    import __spark_entry__ as entry
    from serverless_data_lake_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_ENTRIES
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entry.queries()

    for name in names:
        # warm rep (not measured): codegen + worker pool + memos
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        spark.catalog.clearCache()
        jobs, stages, tasks = _group_counts(spark, group)
        print(
            f"{name:28s} {dt:6.2f}s  jobs={jobs:3d} "
            f"stages={stages:3d} tasks={tasks:5d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
