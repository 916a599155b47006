"""Exact-substring (duplicated-span) removal —
operators/dedup.py::remove_duplicate_spans, the distributed k-gram
analogue of Lee et al. 2021's suffix-array ExactSubstr dedup.
Verified against an independent brute-force Python reference on
planted and hypothesis-fuzzed corpora."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Brute-force reference (independent of the Spark implementation)
# ---------------------------------------------------------------------------
def ref_remove_duplicate_spans(rows, k):
    """rows: [(id, text)] → {id: (text_dedup, n_kept, n_removed)}.

    Collect every k-gram occurrence corpus-wide, keep the
    (id, pos)-first occurrence of each duplicated gram, mark every
    token covered by a non-first occurrence, rebuild texts."""
    toks = {i: [t for t in re.split(r"\s+", txt) if t] for i, txt in rows}
    occs: dict[tuple, list] = {}
    for i, ts in sorted(toks.items()):
        for p in range(len(ts) - k + 1):
            occs.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    removed = {i: set() for i in toks}
    for positions in occs.values():
        if len(positions) < 2:
            continue
        for i, p in sorted(positions)[1:]:
            removed[i].update(range(p, p + k))
    out = {}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in removed[i]]
        out[i] = (" ".join(kept), len(kept), len(ts) - len(kept))
    return out


def run_spark(spark, rows, k):
    from serverless_data_lake_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.text_dedup, r.n_kept, r.n_removed)
        for r in remove_duplicate_spans(df, "doc_id", "text", k=k).collect()
    }


# ---------------------------------------------------------------------------
# Planted cases
# ---------------------------------------------------------------------------
class TestPlanted:
    def test_cross_doc_span_removed_from_later_doc(self, spark):
        span = "the quick brown fox jumps over the lazy dog today"
        rows = [
            (1, span),
            (2, f"prefix words then {span} and more"),
        ]
        got = run_spark(spark, rows, k=5)
        assert got == ref_remove_duplicate_spans(rows, 5)
        # doc 1 is canonical (untouched); doc 2 loses the whole span.
        assert got[1] == (span, 10, 0)
        assert got[2] == ("prefix words then and more", 5, 10)

    def test_within_doc_repetition(self, spark):
        rows = [(3, "a a a a a a")]
        got = run_spark(spark, rows, k=2)
        # gram ("a","a") at pos 0..4; canonical pos 0; positions
        # 1..5 covered → only token 0 survives.
        assert got == {3: ("a", 1, 5)}

    def test_short_and_empty_docs_pass_through(self, spark):
        rows = [(4, "short doc"), (5, ""), (6, "   ")]
        got = run_spark(spark, rows, k=5)
        assert got == {
            4: ("short doc", 2, 0),
            5: ("", 0, 0),
            6: ("", 0, 0),
        }

    def test_overlapping_duplicated_spans_merge(self, spark):
        # Two docs share a 7-token run; with k=3 the run's 5
        # constituent grams cover all 7 tokens of the later copy.
        run = "one two three four five six seven"
        rows = [(1, run), (2, f"{run} tail words")]
        got = run_spark(spark, rows, k=3)
        assert got == ref_remove_duplicate_spans(rows, 3)
        assert got[2] == ("tail words", 2, 7)

    def test_case_sensitive_tokens(self, spark):
        # Unlike the similarity family, span removal does NOT
        # lowercase: "The" and "the" are different tokens.
        rows = [(1, "The cat sat"), (2, "the cat sat")]
        got = run_spark(spark, rows, k=3)
        assert got[1] == ("The cat sat", 3, 0)
        assert got[2] == ("the cat sat", 3, 0)

    def test_multiple_whitespace_normalized(self, spark):
        rows = [(1, "a  b\tc\n d"), (2, "x a b c d y z w")]
        got = run_spark(spark, rows, k=4)
        assert got == ref_remove_duplicate_spans(rows, 4)


# ---------------------------------------------------------------------------
# Randomized equivalence vs the brute-force reference
# ---------------------------------------------------------------------------
@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee".split()), min_size=0,
            max_size=24,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=5),
)
def test_matches_bruteforce_reference(spark, texts, k):
    # ``spark`` is session-scoped, so hypothesis's function-scoped-
    # fixture health check does not apply.
    rows = [(i, t) for i, t in enumerate(texts)]
    got = run_spark(spark, rows, k)
    assert got == ref_remove_duplicate_spans(rows, k)


# ---------------------------------------------------------------------------
# Plan quality
# ---------------------------------------------------------------------------
def test_plan_no_cartesian_no_python_partial_min(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["exact_substring_dedup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # The canonical-occurrence groupBy must reduce map-side (the
    # skew argument for groupBy-min over a per-gram window).
    assert "partial_min" in plan


# ---------------------------------------------------------------------------
# Differential fuzz of the DRIVER ORACLE formula itself: random
# corpora through the Spark operator vs the DuckDB oracle template —
# three-way agreement with the brute-force reference above.
# ---------------------------------------------------------------------------
def run_duckdb_oracle(rows, k):
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.execute(entrymod._substring_dedup_oracle(k)).fetchall()
    con.close()
    return {r[0]: (r[1], r[2], r[3]) for r in out}


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("x1 x2 x3 yy".split()), min_size=0, max_size=20
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_oracle_template_matches_spark_and_bruteforce(spark, texts, k):
    rows = [(i, t) for i, t in enumerate(texts)]
    got_spark = run_spark(spark, rows, k)
    got_duck = run_duckdb_oracle(rows, k)
    got_ref = ref_remove_duplicate_spans(rows, k)
    assert got_spark == got_ref
    assert got_duck == got_ref
