"""Per-stage timeline profiler (r15): for each selected entry, run it
warm and print every completed stage's wall window, executor run/CPU
time, task count and shuffle bytes — the same evidence format as
docs/records/r14/prof_substr_stages.txt. Reads the in-process
AppStatusStore through py4j (the UI/REST server is disabled in this
sandbox).

Usage:
    python tools/profile_stages.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from serverless_data_lake_spark.session import get_spark


def _stage_rows(spark, min_submit_ms: int):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    out = []
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus); empty statuses = all stages.
    jvm = sc._jvm
    gw = sc._gateway
    it = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    ).iterator()
    while it.hasNext():
        s = it.next()
        sub = s.submissionTime()
        if not sub.isDefined():
            continue
        t_sub = sub.get().getTime()
        if t_sub < min_submit_ms:
            continue
        comp = s.completionTime()
        t_comp = comp.get().getTime() if comp.isDefined() else None
        out.append(
            {
                "id": s.stageId(),
                "submit": t_sub,
                "complete": t_comp,
                "tasks": s.numCompleteTasks(),
                "exec_ms": s.executorRunTime(),
                "cpu_ms": s.executorCpuTime() / 1e6,
                "sr_mb": s.shuffleReadBytes() / 1e6,
                "sw_mb": s.shuffleWriteBytes() / 1e6,
            }
        )
    return sorted(out, key=lambda r: r["id"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["exact_substring_dedup"]
    spark = get_spark(
        app_name="sdls-profile-stages",
        extra_conf={
            # mirror bench.py's scan-split sizing (r15) so profiled
            # stage shapes match bench sittings
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SDLS_MAX_PARTITION_BYTES", "4m"
            ),
            "spark.sql.files.openCostInBytes": os.environ.get(
                "SDLS_OPEN_COST_BYTES", "1m"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        # warm rep: codegen + worker pool + memos, not measured
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0_ms = int(time.time() * 1000)
        c0 = time.time()
        df = qs[name](spark, sf_dir)
        t_run = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_end = time.time()
        spark.catalog.clearCache()
        rows = _stage_rows(spark, t0_ms)
        active = [r for r in rows if r["tasks"] > 0]
        skipped = [r["id"] for r in rows if r["tasks"] == 0]
        print(
            f"== {name}: wall {t_end - t_run:.2f} s "
            f"(construct {t_run - c0:.2f} s), {len(active)} active stages "
            f"({len(rows)} total, {sum(r['tasks'] for r in active)} tasks)",
            flush=True,
        )
        for r in active:
            # a stage with no completionTime is still running (or a
            # zombie) — say so instead of printing a 0.00 end window
            # (r16, r15 ADVICE)
            end = (
                f"{r['complete'] / 1000.0 - t0_ms / 1000.0:6.2f}"
                if r["complete"]
                else "..running"
            )
            start = r["submit"] / 1000.0 - t0_ms / 1000.0
            print(
                f" {r['id']:4d} t={start:6.2f}..{end} "
                f"exec={r['exec_ms']:6.0f}ms cpu={r['cpu_ms']:6.0f}ms "
                f"tasks={r['tasks']:4d} shuffleR={r['sr_mb']:5.1f}MB "
                f"shuffleW={r['sw_mb']:5.1f}MB",
                flush=True,
            )
        if skipped:
            print(f" skipped (exchange reuse / no tasks): {skipped}", flush=True)


if __name__ == "__main__":
    main()
