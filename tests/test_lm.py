"""Bigram-LM perplexity scoring (operators/lm.py) against an
independent brute-force reference, plus the CurationPipeline hook."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from serverless_data_lake_spark.operators.lm import (
    NGramLM,
    perplexity_score,
    train_bigram_lm,
)

SCHEMA = "doc_id long, text string"

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog sat together"),
]


def ref_lm(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi, len(uni) + 1, sum(uni.values())


def ref_score(text, uni, bi, vocab, total, alpha=0.1, lam=0.7):
    toks = text.lower().split()
    if len(toks) < 2:
        return 0, None
    lps = []
    for a, b in zip(toks, toks[1:]):
        c1 = uni.get(a, 0)
        lam_eff = lam * c1 / (c1 + 1)
        p_bi = (bi.get((a, b), 0) + alpha) / (c1 + alpha * vocab)
        p_uni = (uni.get(b, 0) + alpha) / (total + alpha * vocab)
        lps.append(math.log(lam_eff * p_bi + (1 - lam_eff) * p_uni))
    return len(lps), sum(lps) / len(lps)


@pytest.fixture(scope="module")
def lm(spark):
    return train_bigram_lm(
        spark.createDataFrame(REF, SCHEMA)
    ).persist()


class TestLM:
    def test_counts_match_reference(self, spark, lm):
        uni, bi, vocab, total = ref_lm([t for _i, t in REF])
        assert lm.vocab_size == vocab
        assert lm.total_tokens == total
        got_uni = {
            r["w1"]: r["c1"] for r in lm.unigrams.collect()
        }
        assert sorted(got_uni.values()) == sorted(uni.values())
        assert lm.bigrams.count() == len(bi)

    def test_scores_match_bruteforce(self, spark, lm):
        uni, bi, vocab, total = ref_lm([t for _i, t in REF])
        docs = [
            (10, "the cat sat on the rug"),       # in-distribution
            (11, "rug mat dog the on sat a"),     # shuffled words
            (12, "completely novel tokens here"),  # all-unseen
            (13, "single"),                        # no bigrams
            (14, ""),
        ]
        out = {
            r["doc_id"]: r
            for r in perplexity_score(
                spark.createDataFrame(docs, SCHEMA), "doc_id", lm
            ).collect()
        }
        for i, text in docs:
            n, lp = ref_score(text, uni, bi, vocab, total)
            assert out[i]["n_bigrams"] == n
            if lp is None:
                assert out[i]["avg_logp"] is None
            else:
                assert out[i]["avg_logp"] == pytest.approx(lp, rel=1e-12)
                assert out[i]["perplexity"] == pytest.approx(
                    math.exp(-lp), rel=1e-12
                )
        # The in-distribution doc must beat the shuffled one.
        assert (
            out[10]["perplexity"] < out[11]["perplexity"]
        )
        assert out[11]["perplexity"] < out[12]["perplexity"]

    def test_plan_is_jvm_only(self, spark, lm):
        df = spark.createDataFrame(REF, SCHEMA)
        plan = (
            perplexity_score(df, "doc_id", lm)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_curation_hook(self, spark, lm):
        from serverless_data_lake_spark.pipeline.curation import (
            CurationPipeline,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "zz qq ww ee rr tt yy"),  # far out of distribution
            ],
            SCHEMA,
        )
        # Threshold between the two measured perplexities.
        ppl = {
            r["doc_id"]: r["perplexity"]
            for r in perplexity_score(docs, "doc_id", lm).collect()
        }
        cut = (ppl[1] + ppl[2]) / 2
        pipe = CurationPipeline("doc_id", "text").perplexity_filter(
            lm, max_perplexity=cut
        )
        kept = {}
        _out, report = pipe.execute(
            docs, sink=lambda d: kept.update(
                {r["doc_id"]: True for r in d.collect()}
            )
        )
        assert sorted(kept) == [1]
        assert report[-1].rows_out == 1
