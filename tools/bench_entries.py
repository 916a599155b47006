"""Focused entry timing for A/Bs (r15): bench.py's exact methodology
(warm pass at a 100× smaller SF, then interleaved reps, noop sink,
best-of-reps, eager-construct folding) over a SUBSET of entries, so a
candidate change can be measured without a full 50-entry sitting.

Usage:
    python tools/bench_entries.py [--reps N] entry [entry ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_WARMUP_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from serverless_data_lake_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args or ["sketch_quality_gates", "ann_topk_gates"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark(
        app_name="sdls-bench-entries",
        extra_conf={
            # mirror bench.py's scan-split sizing so A/B numbers here
            # are comparable to full-bench sittings
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SDLS_MAX_PARTITION_BYTES", "4m"
            ),
            "spark.sql.files.openCostInBytes": os.environ.get(
                "SDLS_OPEN_COST_BYTES", "1m"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._ensure_catalog(spark, sf_dir)
    spark.range(32).repartition(1).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    for name in names:
        for d in (warm_dir, sf_dir):
            try:
                qs[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                # A broken entry would otherwise enter the timed reps
                # cold and produce misleading A/B numbers with no
                # signal (r16, r15 ADVICE) — surface it.
                print(
                    f"WARMUP FAILED {name} @ {d}: {exc!r}",
                    file=sys.stderr,
                )
            spark.catalog.clearCache()
    draws: dict[str, list[float]] = {n: [] for n in names}
    constr: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            c0 = time.time()
            df = qs[name](spark, sf_dir)
            t0 = time.time()
            constr[name].append(t0 - c0)
            df.write.format("noop").mode("overwrite").save()
            draws[name].append(time.time() - t0)
        spark.catalog.clearCache()
    out = {}
    for name in names:
        t = min(draws[name])
        if name in benchmod.EAGER_CONSTRUCT:
            t += min(constr[name])
        out[name] = round(t, 3)
    print(json.dumps({"queries": out, "construct": {
        n: round(min(v), 3) for n, v in constr.items()
    }, "sf_dir": sf_dir, "reps": reps}))


if __name__ == "__main__":
    main()
