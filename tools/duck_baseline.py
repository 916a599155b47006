"""DuckDB baseline for the bench comparison.

Runs every ``oracle_sql()`` text on DuckDB over the same parquet the
Spark bench reads (default sf0.1), best-of-N (default 2, matching
bench.py), and prints one JSON line::

    {"metric": "duckdb_oracle_seconds", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "reps": N, "threads": N}

Purpose: the reference publishes no numbers, so the judged baseline
is DuckDB executing the oracle texts on the same box. Measuring it
in the same session/methodology as bench.py (best-of-N, identical
files) keeps the Spark-vs-baseline ratio an apples-to-apples number
instead of depending on who measured the oracle side and when.

Caveats on interpretation (same as VERDICT r4): gate-style oracles
(`ann_*_topk`, `sketch_quality_gates`, `simhash_near_duplicates`)
are literal SELECTs that do none of the work, and the similarity
oracles compute exact answers without the LSH machinery — per-query
ratios against those overstate or understate honestly-incomparable
work. The headline comparison is the matched-entry total.

Usage: python tools/duck_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _host_note() -> dict:
    """Launch-load stamp, mirroring bench.py's (r14 ask #6) — the
    paired records carry their own host-tide context."""
    note = {"launch_load_1m": round(os.getloadavg()[0], 2)}
    settle = os.environ.get("SDLS_SETTLE_S")
    if settle:
        # numeric like the load fields (r15, r14 ADVICE) — one JSON
        # type in archived records, matching bench.py's coercion
        try:
            note["settle_s"] = float(settle)
        except ValueError:
            note["settle_s"] = settle
    return note


def main() -> None:
    host_note = _host_note()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = entrymod.oracle_sql()

    # Publish/consume parity with bench.py (r9, closes the r7/r8
    # ADVICE asymmetry): on the Spark side ngram_jaccard_pairs
    # PUBLISHES its persisted pair set within its own measured time
    # and dedup_corpus_survivors consumes it later in the same rep,
    # caches clearing at rep boundaries. Mirror that here: the
    # jaccard entry's measured step ALSO materializes the pair CTE
    # into a temp table, the survivors entry's measured step reads
    # the materialized pairs instead of recomputing the CTE, and the
    # table drops at the rep boundary — so neither engine's headline
    # double-charges (or skips) the pair computation.
    pair_cte = f"({entrymod._JACCARD_ORACLE})"
    consume = "(SELECT id_a, id_b, jaccard FROM __published_pairs)"

    def published_pairs_exist() -> bool:
        return bool(
            con.execute(
                "SELECT 1 FROM information_schema.tables "
                "WHERE table_name = '__published_pairs'"
            ).fetchall()
        )

    def run(name: str, sql: str) -> None:
        if name == "ngram_jaccard_pairs":
            con.execute(
                "CREATE OR REPLACE TEMP TABLE __published_pairs AS "
                + sql
            )
            con.execute("SELECT * FROM __published_pairs").fetchall()
        elif (
            name == "dedup_corpus_survivors"
            and pair_cte in sql
            # Guard on the temp table actually existing (r10
            # advisory): the consume branch engages on CTE-text
            # match, so a registry reorder that runs survivors
            # before the jaccard publish would otherwise raise on
            # the missing table — fall back to the self-contained
            # SQL instead (costed like any other entry).
            and published_pairs_exist()
        ):
            con.execute(sql.replace(pair_cte, consume, 1)).fetchall()
        else:
            con.execute(sql).fetchall()

    draws: dict[str, list[float]] = {name: [] for name in oracles}
    # Warmup pass (parity with bench.py's unmeasured warmup): page
    # cache + DuckDB's own readers warm before the measured reps.
    for name, sql in oracles.items():
        try:
            run(name, sql)
        except Exception:
            pass
    for _ in range(reps):
        for name, sql in oracles.items():
            started = time.time()
            run(name, sql)
            draws[name].append(time.time() - started)
        con.execute("DROP TABLE IF EXISTS __published_pairs")
    timings = {name: round(min(ts), 3) for name, ts in draws.items()}
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "threads": threads,
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
