"""Randomized reference tests for the exact-Jaccard family.

The three exact operators (inverted-index, df-capped-with-full-frac,
PPJoin prefix) must agree exactly with a brute-force pure-Python
reference on random corpora — guarding the r6 plan restructure
(in-row sizes, shared token exchange, shuffle-hash pin) against
semantic drift that the fixed oracle corpus might not expose.
Seeded RNG, not hypothesis: each example costs Spark jobs, so we
draw a handful of diverse corpora instead of hundreds.
"""

from __future__ import annotations

import numpy as np
import pytest

from serverless_data_lake_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_prefix,
)

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
]


def make_corpus(seed: int, n_docs: int = 60):
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        ln = int(rng.integers(1, 40))
        texts.append(" ".join(rng.choice(VOCAB, ln)))
    # Planted structure: exact dup, near dup (one token changed),
    # prefix/suffix overlap — the regimes dedup must catch.
    texts[10] = texts[0]
    toks = texts[1].split()
    if len(toks) > 3:
        toks[len(toks) // 2] = "zzz"
        texts[11] = " ".join(toks)
    texts[12] = texts[2] + " " + texts[3]
    return list(enumerate(texts))


def ref_pairs(rows, n: int, threshold: float):
    """Brute-force exact n-gram Jaccard (same tokenization contract:
    lowercase, whitespace split, distinct gram SETS)."""
    grams = {}
    for i, text in rows:
        toks = [t for t in text.lower().split() if t]
        grams[i] = (
            {tuple(toks[j:j + n]) for j in range(len(toks) - n + 1)}
            if len(toks) >= n
            else set()
        )
    out = {}
    ids = sorted(grams)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ga, gb = grams[ids[a]], grams[ids[b]]
            inter = len(ga & gb)
            if not inter:
                continue
            j = inter / (len(ga) + len(gb) - inter)
            if j >= threshold:
                out[(ids[a], ids[b])] = j
    return out


@pytest.mark.parametrize("seed,n,threshold", [
    (1, 3, 0.8),
    (2, 2, 0.5),
    (3, 3, 0.3),
    (4, 1, 0.6),
    (5, 4, 0.8),
])
def test_exact_family_matches_reference(spark, seed, n, threshold):
    rows = make_corpus(seed)
    expect = ref_pairs(rows, n, threshold)
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)

    for op, kw in [
        (ngram_jaccard_pairs, {}),
        # frac=1.0 caps nothing: must equal the exact path while
        # running the windowed-df + broadcast-total plan.
        (ngram_jaccard_pairs, {"max_doc_frac": 1.0}),
        (ngram_jaccard_prefix, {}),
    ]:
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in op(
                df, "doc_id", "text", n=n, threshold=threshold, **kw
            ).collect()
        }
        assert set(got) == set(expect), (op.__name__, kw)
        for k, v in expect.items():
            assert got[k] == pytest.approx(v, abs=1e-12), (
                op.__name__, kw, k
            )


def test_minhash_verified_is_sound_and_finds_exact_dups(spark):
    rows = make_corpus(7)
    expect = ref_pairs(rows, 3, 0.8)
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            df, "doc_id", "text",
            num_hashes=64, bands=16, shingle_size=3,
            verify_threshold=0.8,
        ).collect()
    }
    # Sound: every emitted pair is a true pair with the exact value.
    for k, v in got.items():
        assert k in expect and v == pytest.approx(expect[k], abs=1e-12)
    # Complete for identical documents: equal gram sets -> equal
    # signatures -> same bands, guaranteed candidate.
    assert (0, 10) in got


def test_prefix_integral_boundary_not_truncated(spark):
    """Exact-boundary inclusion gate (r9): the subset pair here has
    J = 16/20 = 0.8, exactly ON the threshold, and the superset
    doc's 4 unique grams are its rarest — so the pair survives ONLY
    if both the prefix length (|d| − ceil(t·|d|) + 1 = 5 slots, the
    5th being the rarest SHARED gram) and the size-ratio filter
    (min/max = t exactly) are computed without upward float bias.
    Guards the 1e-9 slack in both places in ngram_jaccard_prefix —
    a one-too-high ceil (possible for thresholds whose t·sz rounds
    up in binary, e.g. 1/75·525) would truncate the prefix to the
    4 unique grams and silently miss the pair."""
    base = [f"w{i}" for i in range(18)]          # 16 trigrams
    extra = ["x1", "x2", "x3", "x4"]             # +4 unique trigrams
    rows = [(0, " ".join(base)), (1, " ".join(base + extra))]
    expect = ref_pairs(rows, 3, 0.8)
    assert (0, 1) in expect and expect[(0, 1)] == pytest.approx(0.8)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_prefix(
            df, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert got == {(0, 1): pytest.approx(0.8)}
