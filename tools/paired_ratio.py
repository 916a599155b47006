"""Compute the paired Spark-vs-DuckDB ratio from one sitting's two
bench records — the comparison protocol in one command.

Usage::

    python bench.py              2>/dev/null | tail -1 > /tmp/spark.json
    python tools/duck_baseline.py 2>/dev/null | tail -1 > /tmp/duck.json
    python tools/paired_ratio.py /tmp/spark.json /tmp/duck.json

Prints the matched-entry totals, the ratio, and the ratio excluding
the literal-oracle gate entries (whose DuckDB side does none of the
work — the exclusion the r6 verdict used), plus the top per-entry
gaps. Reads the compact JSON line each tool already emits, so a
sitting's record stays reproducible from its artifacts alone.
"""

from __future__ import annotations

import json
import sys

#: Entries whose oracle is a literal SELECT (deterministic gates) —
#: excluded in the like-for-like ratio, per the r6 verdict's method.
GATE_ENTRIES = {
    "ann_topk_gates",
    "sketch_quality_gates",
    "simhash_hamming_histogram",
    "multimodal_features",
    "semantic_dedup_gate",
}


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read().strip()
    rec = json.loads(text.splitlines()[-1])
    return {k: float(v) for k, v in rec["queries"].items()}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    spark = _load(sys.argv[1])
    duck = _load(sys.argv[2])
    matched = sorted(set(spark) & set(duck))
    if not matched:
        print("no matched entries between the two records")
        return 1
    st = sum(spark[k] for k in matched)
    dt = sum(duck[k] for k in matched)
    core = [k for k in matched if k not in GATE_ENTRIES]
    st2 = sum(spark[k] for k in core)
    dt2 = sum(duck[k] for k in core)
    print(
        f"matched-{len(matched)}: spark {st:.2f}s duck {dt:.2f}s "
        f"ratio {st / dt:.2f}x"
    )
    print(
        f"excl {len(matched) - len(core)} gates: spark {st2:.2f}s "
        f"duck {dt2:.2f}s ratio {st2 / dt2:.2f}x"
    )
    gaps = sorted(
        ((spark[k] - duck[k], k) for k in core), reverse=True
    )
    print("top gaps (spark - duck):")
    for d, k in gaps[:8]:
        print(f"  {k}: {spark[k]:.2f} vs {duck[k]:.2f} (+{d:.2f})")
    wins = [(d, k) for d, k in gaps if d < 0]
    if wins:
        print("spark wins:")
        for d, k in sorted(wins)[:5]:
            print(f"  {k}: {spark[k]:.2f} vs {duck[k]:.2f} ({d:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
