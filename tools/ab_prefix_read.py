"""Read-strategy A/B for ngram_jaccard_prefix with statistical power
(r16, r15 verdict #2: the r15 decision shipped on a 3-draw A/B whose
within-condition spread exceeded the delta).

Conditions:
  plain — ``_read(spark, sf_dir, "documents")`` (shipped in r15)
  sized — ``_read_parallel(spark, sf_dir, "documents",
          _DOC_ROWS_PER_TASK)`` (the sibling entries' read)

Methodology: one warm session (bench conf: 4 MB scan splits, warmup
pass per condition at the 100x-smaller SF then at the target SF),
then N alternating draws per condition (P S P S ...), noop sink,
every raw draw printed. The DECISION RULE is pre-committed in
docs/records/r16/ab_prefix_protocol.txt — this tool only produces
the draws.

Usage:
    python tools/ab_prefix_read.py [--draws N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from serverless_data_lake_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_prefix,
)
from serverless_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    draws = 7
    if args and args[0] == "--draws":
        draws = int(args[1])
        args = args[2:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark(
        app_name="sdls-ab-prefix",
        extra_conf={
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

    def build(cond: str, d: str):
        if cond == "plain":
            docs = entrymod._read(spark, d, "documents")
        else:
            docs = entrymod._read_parallel(
                spark, d, "documents", entrymod._DOC_ROWS_PER_TASK
            )
        return ngram_jaccard_prefix(
            docs, "doc_id", "text", n=3, threshold=0.8
        )

    # warmup: both conditions, small SF then target SF (codegen +
    # worker pool), unmeasured
    for cond in ("plain", "sized"):
        for d in (warm_dir, sf_dir):
            if os.path.isdir(d) or os.path.exists(d):
                build(cond, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()

    out: dict[str, list[float]] = {"plain": [], "sized": []}
    for i in range(draws):
        for cond in ("plain", "sized"):
            spark.sparkContext.setJobDescription(
                f"prefix-ab {cond} draw {i + 1}"
            )
            t0 = time.time()
            build(cond, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            out[cond].append(round(dt, 3))
            spark.catalog.clearCache()
            print(
                f"draw {i + 1} {cond}: {dt:.3f}s "
                f"(load {os.getloadavg()[0]:.2f})",
                flush=True,
            )
    print(json.dumps({
        "sf_dir": sf_dir,
        "draws": out,
        "median": {
            k: round(statistics.median(v), 3) for k, v in out.items()
        },
    }))


if __name__ == "__main__":
    main()
