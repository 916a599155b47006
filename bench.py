"""Headline benchmark.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": ...}

Each query is forced end-to-end with a ``noop``-format write (full
computation, no driver-side result transfer skewing the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from serverless_data_lake_spark.session import get_spark

# Every oracle-checked query plus the rows-only scale operators —
# the full declared surface is the benchmark, no cherry-picking.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "cross_join_counts",
    "window_top3_orders",
    "qualify_top_order",
    "cte_semi_anti",
    "rollup_cube_order_stats",
    "count_distinct_segments",
    "monthly_revenue",
    "ann_topk_gates",
    "nonequi_price_pairs",
    "pack_sequences",
    "list_agg_segments",
    "dialect_text_funcs",
    "top_tokens",
    "json_dialect_shims",
    "tumbling_window_counts",
    "merge_upsert_endstate",
    "partitioned_merge_endstate",
    "bucketed_join_revenue",
    "profile_orders",
    "sketch_quality_gates",
    "chunk_documents",
    "repetition_stats",
    "interval_join_attribution",
    "sampling_and_splits",
    "sessionize_events",
    "salted_aggregate_events",
    "redact_pii",
    "dedup_first_event_per_user",
    "dedup_exact_documents",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "ngram_jaccard_prefix",
    "minhash_lsh_pairs",
    "simhash_hamming_histogram",
    "dedup_corpus_survivors",
    "decontaminate_train",
    "exact_substring_dedup",
    "bronze_jsonl_scan",
    "embedding_similarity_pairs",
    "cosine_topk",
    "text_analysis",
    "multimodal_features",
    "semantic_dedup_gate",
    "multimodal_metadata_stats",
    "lm_perplexity",
    "mixing_controls",
    "star_replace_orders",
]

# Entries whose DuckDB oracle replays work the Spark side performs
# EAGERLY at construction time (the connected-components closure runs
# localCheckpoint during query construction; pack_sequences runs its
# quantile sketch + per-bucket micro-collect). For these, construct
# time is folded INTO the reported per-query seconds so paired
# Spark-vs-oracle comparisons measure the same work on both sides
# (r5 advisory: the closure was excluded from the headline while the
# oracle's recursive CTE paid it).
EAGER_CONSTRUCT = {
    "dedup_corpus_survivors",
    "pack_sequences",
    # the bigram-LM training collect runs at construction; the
    # oracle trains inside its measured time, so the construct
    # belongs in the headline (r5-advisory accounting).
    "lm_perplexity",
    # the decontamination stream gate (r9) RUNS its streaming query
    # at construction — a streaming query has no lazy form — and its
    # oracle row replays the survivor count with a real anti-join in
    # measured time, so the same accounting rule applies.
    "sketch_quality_gates",
    # the ANN gate memoizes its exact top-k baselines + kmeans
    # training at construction (per applicationId, so min-of-reps
    # would otherwise keep only the post-memo draws) while the
    # paired oracle re-pays those scans every rep — fold construct
    # into the reported seconds so both sides measure the same work
    # (r11 advisory: the memo reversed the r9 eager-work rule for
    # this entry's headline).
    "ann_topk_gates",
}


def _host_note() -> dict:
    """Host context stamped into the record (r14, r13-verdict ask
    #6): the 1-min load at launch (captured before Spark starts) so
    cross-round BENCH file comparisons carry their own tide
    disclaimer, plus the sitting runner's settle seconds when it
    exports ``SDLS_SETTLE_S``. ``end_load_1m`` is added at emit."""
    note = {"launch_load_1m": round(os.getloadavg()[0], 2)}
    settle = os.environ.get("SDLS_SETTLE_S")
    if settle:
        # numeric like the load fields (r15, r14 ADVICE) — downstream
        # consumers of host_note get one JSON type, not str-or-float
        try:
            note["settle_s"] = float(settle)
        except ValueError:
            note["settle_s"] = settle
    return note


def main() -> None:
    host_note = _host_note()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        app_name="sdls-bench",
        extra_conf={
            # The cached testdata copies carry ~64 row groups per file
            # (see __spark_entry__._data_path); sizing file splits
            # down lets the scan fan out across cores. At production
            # scale the default 128m is right — this matches splits
            # to the small local files. Env-overridable for split-size
            # A/Bs (r15); the committed default is the measured best.
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SDLS_MAX_PARTITION_BYTES", "4m"
            ),
            "spark.sql.files.openCostInBytes": os.environ.get(
                "SDLS_OPEN_COST_BYTES", "1m"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + the parquet layout cache outside the timed
    # region, then one UNMEASURED complex warmup query so the first
    # measured query doesn't absorb whole-stage-codegen compilation
    # and decimal-aggregate setup (r1: q1 paid ~4.5 s of it).
    entrymod._ensure_catalog(spark, sf_dir)
    for t in entrymod.TABLES:
        entrymod._data_path(sf_dir, t)
    spark.range(1000).selectExpr("sum(id)").collect()
    # Warm the Python worker pool + Arrow serialization path once:
    # workers are reused across queries (spark.python.worker.reuse),
    # so without this the first mapInPandas query measured would pay
    # the fork/import cost that every later one skips.
    spark.range(32).repartition(1).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    qs_all = entrymod.queries()
    qs_all["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Unmeasured warmup pass: every benched query once at a 100×
    # smaller scale factor. Whole-stage-codegen source is
    # scale-independent, so this compiles each query's generated
    # stages into the Janino cache (and JIT-warms the interpreted
    # HOF paths) for pennies of data — the measured sf0.1 loop then
    # isolates data-proportional execution from one-time per-plan
    # compilation (2-4 s for the widest dedup plans). Delete this
    # loop to measure cold-start instead.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            try:
                qs_all[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
            spark.catalog.clearCache()

    # Best-of-N per query (default 2): single draws on this host
    # carry ±30% scheduler/GC noise (r3/r4 both flagged phantom
    # regressions that re-measurement dissolved); the minimum of two
    # runs is the stable data-proportional cost. Reps interleave
    # whole passes (A B C, A B C) rather than back-to-back repeats so
    # rep 2 never reuses rep 1's OS page cache state unfairly.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    qs = entrymod.queries()
    draws: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    constr: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(reps):
        for name in BENCH_QUERIES:
            # Construction is timed SEPARATELY and disclosed: most
            # entries build a lazy plan in ~ms, but the write-path
            # end-states (ingest + merges through TableStore), the
            # IVF trainer, and the iterative connected-components
            # closure do real eager work here. "queries"/"value"
            # stay execution-only for round-over-round
            # comparability; "construct"/"construct_total" carry the
            # eager-work cost so nothing is hidden from the record.
            c0 = time.time()
            df = qs[name](spark, sf_dir)
            started = time.time()
            constr[name].append(started - c0)
            df.write.format("noop").mode("overwrite").save()
            draws[name].append(time.time() - started)
        # Hygiene at the REP boundary (untimed), not between
        # queries: ngram_jaccard_pairs PUBLISHES its pair set
        # (persisted result) and dedup_corpus_survivors consumes it
        # downstream in the same rep — the pipeline shape, disclosed
        # in both entry docstrings and docs/bench.md; clearing
        # per-query would force the dedup entry to recompute the
        # pairs its sibling already paid for. Persists are small
        # (the pair set is a few hundred rows) and operators that
        # cache large intermediates unpersist themselves
        # (connected_components), so per-rep clearing keeps later
        # queries untaxed without defeating the publish.
        spark.catalog.clearCache()
    timings = {
        name: round(
            min(ts)
            + (min(constr[name]) if name in EAGER_CONSTRUCT else 0.0),
            3,
        )
        for name, ts in draws.items()
    }
    constructs = {
        name: round(min(ts), 3)
        for name, ts in constr.items()
        if min(ts) >= 0.05
    }

    total = round(sum(timings.values()), 3)
    # Two output lines (r5: the driver's tail-capture window truncated
    # the single 3.5 kB record and lost the headline). The driver's
    # tail window is 2000 chars and the compact line is ~1.6 kB, so
    # the detail line is BUDGETED to the leftover (~400 chars): the
    # construct total plus only the top construct costs, rest summed
    # (r8 — r6/r7 tails still opened mid-dict because the full
    # construct breakdown overflowed the window). Full per-construct
    # numbers stay available locally via tools/bench_gate.py records.
    top = dict(
        sorted(constructs.items(), key=lambda kv: -kv[1])[:6]
    )
    rest = round(sum(v for k, v in constructs.items() if k not in top), 3)
    print(
        json.dumps(
            {
                "metric": "detail",
                "construct_total": round(
                    sum(min(ts) for ts in constr.values()), 3
                ),
                "construct_top": top,
                "construct_rest": rest,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "total_headline_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "sf": sf,
                "reps": reps,
                "agg": "best_of_reps",
                "host_note": {
                    **host_note,
                    "end_load_1m": round(os.getloadavg()[0], 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
