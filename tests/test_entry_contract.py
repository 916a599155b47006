"""Registry-shape invariants for the driver contract.

The driver's correctness gate records rows for the FIRST 50 entries
of ``queries()`` only (observed in CORRECTNESS_r02: exactly the first
50 of 52 registry entries got rows, so the rows-only ``simhash``
entry at position 45 consumed a slot while ``multimodal_metadata_stats``
at position 52 — which HAS an oracle — was never checked).  These
tests pin the ordering discipline that keeps every oracle-checked
entry inside that window.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50


def test_every_unique_oracle_entry_inside_driver_window():
    # An entry past position 50 gets NO correctness row at all (r02
    # showed the driver drops them, not even rows-only), so every
    # UNIQUE oracle-checked entry must sit inside the window. Beyond
    # the window, only continuity aliases are allowed — same callable
    # AND same oracle text as an in-window entry, so local tooling
    # (tools/parity_check.py) still fully checks them while the
    # driver loses nothing it would otherwise record.
    qs = entrymod.queries()
    names = list(qs)
    oracles = entrymod.oracle_sql()
    window = names[:DRIVER_WINDOW]
    wset = set(window)
    for n in names:
        if n in wset:
            continue
        twins = [
            m
            for m in window
            if qs[m] is qs[n] and oracles.get(m) == oracles.get(n)
        ]
        assert twins, (
            f"registry entry outside the driver's {DRIVER_WINDOW}-row "
            f"window is not an alias of an in-window entry: {n}"
        )


def test_rows_only_entries_come_last():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    flags = [n in oracles for n in names]
    first_rows_only = flags.index(False) if False in flags else len(flags)
    assert all(not f for f in flags[first_rows_only:]), (
        "rows-only entries must be contiguous at the END of queries() "
        "so they never displace an oracle-checked entry from the "
        "driver's correctness window"
    )


def test_oracle_keys_subset_of_queries():
    names = set(entrymod.queries())
    extra = [k for k in entrymod.oracle_sql() if k not in names]
    assert not extra, f"oracle_sql() keys without a queries() entry: {extra}"


def test_no_complex_types_in_entry_schemas(spark):
    # The driver canonicalizes results with pandas sort_values →
    # factorize, which raises `TypeError: unhashable type` on cells
    # holding lists/dicts/Rows (CORRECTNESS_r07: decontaminate_train
    # went red when a consolidation added an array<bigint> column).
    # Every entry must therefore emit only atomic column types —
    # stringify arrays with array_join(sort_array(...), ',') on BOTH
    # the Spark and oracle sides.
    # Constructing every entry is not schema-only in cost: several
    # entries do eager driver work at construction (embedding count
    # + PQ/IVF k-means training, connected-components closure), so
    # this test pays real execution time and needs the driver's
    # testdata tree — skip cleanly where it is absent.
    import os

    import pytest
    from pyspark.sql.types import ArrayType, MapType, StructType

    sf = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    if not os.path.isdir(sf):
        pytest.skip(f"driver testdata not present at {sf}")
    qs = entrymod.queries()
    seen = set()
    offenders = []
    for name, fn in qs.items():
        if id(fn) in seen:
            continue
        seen.add(id(fn))
        df = fn(spark, sf)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, (
        "driver-breaking complex-typed columns in queries() entries "
        f"(pandas canonicalizer cannot hash them): {offenders}"
    )


def test_planted_complex_column_fails_local_canonicalizer():
    # Guard the guard: tools/parity_check.py must canonicalize the
    # driver's way (pandas sort_values), so a list-valued column
    # raises locally exactly as it does in the driver harness. The
    # old repr()-based rowset silently passed lists (r7 regression).
    import pytest

    from tools.parity_check import rowset

    with pytest.raises(TypeError):
        rowset(["a", "b"], [[1, [1, 2]], [2, [3, 4]], [1, [1, 2]]])
    # Single-column results take pandas' argsort path unless the
    # canonicalizer forces the factorize path (dummy second key) —
    # list cells must raise there too, not sort by comparison.
    with pytest.raises(TypeError):
        rowset(["a"], [[[1, 2]], [[3, 4]], [[1, 2]]])


def test_bench_eager_construct_accounting_contract():
    """Entries whose DuckDB oracle replays work the Spark side does
    at CONSTRUCTION time must stay in bench.py's EAGER_CONSTRUCT set
    (the r5-advisory symmetry rule) — dropping one silently flatters
    the paired ratio. The set is pinned here with the reason each
    member qualifies; removing an entry requires removing the eager
    work too."""
    import importlib

    bench = importlib.import_module("bench")
    must_fold = {
        # iterative connected-components closure runs eagerly; the
        # oracle's recursive CTE pays it in measured time
        "dedup_corpus_survivors",
        # quantile sketch + per-bucket micro-collect at construct;
        # oracle packs inside its measured query
        "pack_sequences",
        # bigram-LM training collect at construct; oracle trains in
        # its measured CTEs
        "lm_perplexity",
        # the decontamination stream gate RUNS its streaming query at
        # construct (no lazy form); oracle replays the survivor
        # fingerprint with a real anti-join
        "sketch_quality_gates",
    }
    assert must_fold <= bench.EAGER_CONSTRUCT, (
        "bench.py EAGER_CONSTRUCT lost a member whose oracle pays "
        f"construct-time work: {sorted(must_fold - bench.EAGER_CONSTRUCT)}"
    )


def test_minhash_entry_recycles_persisted_index(spark):
    """r10 (the r9 verdict's cache-lifecycle ask): the minhash
    entry's persisted full-corpus LshIndex is load-bearing during
    execution, so it can't be unpersisted in-entry — instead each
    construction releases the PREVIOUS invocation's index, and an
    explicit release empties the handle. A long-lived session must
    never accumulate stale index caches (the r7 CacheManager
    replay-credit rule)."""
    import os

    import pytest

    sf = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    if not os.path.isdir(sf):
        pytest.skip(f"driver testdata not present at {sf}")

    def n_persistent() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    entrymod._release_minhash_index()
    base = n_persistent()
    qs = entrymod.queries()
    df = qs["minhash_lsh_pairs"](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    assert len(entrymod._MINHASH_IDX) == 1
    after_exec = n_persistent()
    assert after_exec > base  # the index IS cached during execution
    # next construction releases the previous invocation's cache
    qs["minhash_lsh_pairs"](spark, sf)
    assert len(entrymod._MINHASH_IDX) == 1
    assert n_persistent() <= after_exec
    entrymod._release_minhash_index()
    assert len(entrymod._MINHASH_IDX) == 0
    assert n_persistent() == base

