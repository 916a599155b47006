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

Multi-sitting form (r10, the median protocol — single sittings on
this host spread ±15% on identical code, so any one draw against a
2× bar is a coin flip)::

    python tools/paired_ratio.py s1.json d1.json s2.json d2.json ...

Each (spark, duck) pair must be from the SAME sitting (run
back-to-back on a quiet host); the tool prints every sitting's two
ratios plus the across-sitting MEDIAN — the number to report — and
best.
"""

from __future__ import annotations

import json
import statistics
import sys

#: Entries whose oracle is a literal SELECT (deterministic gates) —
#: excluded in the like-for-like ratio, per the r6 verdict's method.
#: FROZEN: this 5-entry set was fixed in r6, before the excl-gates
#: ratio carried any weight, and is append-only with judge sign-off
#: (r9 verdict) — reclassification must never become a dial that
#: tunes the headline.
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


def _sitting(spark_path: str, duck_path: str, detail: bool) -> tuple:
    """One sitting's (matched_ratio, excl_gates_ratio); prints the
    per-entry gap detail when ``detail``."""
    spark = _load(spark_path)
    duck = _load(duck_path)
    matched = sorted(set(spark) & set(duck))
    if not matched:
        raise SystemExit(
            f"no matched entries between {spark_path} and {duck_path}"
        )
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
    if detail:
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
    return st / dt, st2 / dt2


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2 or len(args) % 2 != 0:
        print(__doc__)
        return 2
    pairs = [(args[i], args[i + 1]) for i in range(0, len(args), 2)]
    ratios = []
    for i, (sp, dp) in enumerate(pairs):
        if len(pairs) > 1:
            print(f"— sitting {i + 1} ({sp} / {dp})")
        ratios.append(_sitting(sp, dp, detail=len(pairs) == 1))
    if len(pairs) > 1:
        m = [r[0] for r in ratios]
        e = [r[1] for r in ratios]
        print(f"— {len(pairs)} sittings")
        print(
            f"matched: median {statistics.median(m):.2f}x "
            f"best {min(m):.2f}x worst {max(m):.2f}x"
        )
        print(
            f"excl gates: median {statistics.median(e):.2f}x "
            f"best {min(e):.2f}x worst {max(e):.2f}x"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
