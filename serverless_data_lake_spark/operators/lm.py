"""N-gram language-model perplexity scoring — the CCNet-style
quality signal (Wenzek et al. 2020 filter web text by the perplexity
of a reference-corpus LM; documents far from the reference
distribution are boilerplate, gibberish, or another register).

Spark-first shape: the LM IS two DataFrames of hashed-gram counts
(unigrams, bigrams) built with plain groupBys; scoring explodes each
document's bigram positions ONCE and resolves probabilities through
two keyed equi-joins (broadcast when the LM is small — e.g. a
Wikipedia reference model — else AQE plans shuffle joins). Jelinek-Mercer
interpolated, add-alpha smoothed bigram:

    lam_w1     = lam * C(w1) / (C(w1) + 1)            # Witten-Bell
    p(w2 | w1) = lam_w1 * (C(w1,w2) + a) / (C(w1) + a*V)
               + (1 - lam_w1) * (C(w2) + a) / (T + a*V)

where V is the training vocabulary size (+1 for the unseen class)
and T the training token total. The CONTEXT-DEPENDENT weight is
load-bearing: a fixed-lambda add-alpha bigram gives an unseen
context the 1/V floor — higher than a seen context with a wrong
continuation — so all-gibberish documents would outscore shuffled
in-vocabulary text. Witten-Bell-style weighting sends unseen
contexts entirely to the unigram term, where an unseen token earns
the a/(T+aV) floor it deserves (the unit tests pin this ordering). Everything is deterministic column arithmetic on xxhash64
token hashes — no Python in the row path, reproducible across runs
and partitionings.

This is deliberately NOT Kneser-Ney: a 100 TB filter pass needs a
monotone, explainable score more than the last 10% of LM quality,
and add-alpha keeps the scorer a pure two-join plan. Swap the count
tables for externally-trained ones (same schema) when a stronger LM
exists.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_hashes(text_col: str, token_mode: str = "whitespace"):
    """Token-id array for LM counting. ``whitespace``: xxhash64 of
    lowercased words (JVM-side). ``bpe``: the frozen byte-level BPE
    ids (operators/bpe.py, Arrow UDF) — ids are stable small longs,
    so the same 8-byte-key count tables and joins apply unchanged;
    train and score MUST use the same mode (the id spaces are
    disjoint by construction, so a mismatch scores everything as
    unseen rather than silently blending)."""
    if token_mode == "bpe":
        from serverless_data_lake_spark.operators.bpe import (
            bpe_encode_udf,
        )

        return bpe_encode_udf()(F.col(text_col))
    if token_mode != "whitespace":
        raise ValueError(f"unknown token mode: {token_mode}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != ""
    )
    return F.transform(toks, lambda t: F.xxhash64(t))


@dataclass
class NGramLM:
    """A trained bigram LM: hashed-token count tables + scalars.

    ``unigrams``: (w1, c1) — token counts (used both as bigram
    contexts and as the interpolation distribution). ``bigrams``:
    (w1, w2, c12). ``vocab_size`` includes one unseen-token slot;
    ``total_tokens`` is the training token count.
    ``persist()`` both tables when scoring multiple corpora."""

    unigrams: DataFrame
    bigrams: DataFrame
    vocab_size: int
    total_tokens: int
    #: The persisted reference-corpus token-array projection when the
    #: model was trained with ``persist=True`` (r9) — retained so the
    #: largest cache the training leaves behind stays unpersistable;
    #: before this handle existed it could only be freed with a
    #: session-wide clearCache().
    token_arrays: DataFrame | None = None

    def persist(self) -> "NGramLM":
        self.unigrams.persist()
        self.bigrams.persist()
        return self

    def unpersist(self) -> "NGramLM":
        """Release every cache this model holds — the count tables
        AND the token-array projection ``train_bigram_lm`` persists
        alongside them."""
        self.unigrams.unpersist()
        self.bigrams.unpersist()
        if self.token_arrays is not None:
            self.token_arrays.unpersist()
        return self


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    token_mode: str = "whitespace",
    persist: bool = False,
) -> NGramLM:
    """Count unigrams and bigrams over a reference corpus — two
    groupBys on 8-byte hashes, map-side combined. The vocabulary
    size (distinct tokens + 1 unseen slot) is the one driver-side
    scalar. ``persist=True`` caches both count tables BEFORE the
    stats collect, so the reference corpus is tokenized once total
    rather than once per scoring pass — the right call whenever the
    model scores anything (the stats collect doubles as the unigram
    materializer; the bigram table caches on first use). The token
    ARRAYS persist too: both count tables derive from the same
    tokenization, and without the shared cache the bigram table's
    first materialization (usually a broadcast build inside the
    scoring job) re-tokenizes the whole reference corpus (r9:
    measured as the train-side half of the lm_perplexity entry's
    floor gap)."""
    th = df.select(_token_hashes(text_col, token_mode).alias("__th"))
    if persist:
        th = th.persist()
    toks = th.select(F.explode_outer("__th").alias("w1")).filter(
        F.col("w1").isNotNull()
    )
    unigrams = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    pairs = th.select(
        F.explode_outer(
            F.when(
                F.size("__th") < 2, F.array().cast("array<struct<w1:bigint,w2:bigint>>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size("__th") - 2),
                    lambda i: F.struct(
                        F.get(F.col("__th"), i).alias("w1"),
                        F.get(F.col("__th"), i + 1).alias("w2"),
                    ),
                )
            )
        ).alias("bg")
    ).filter(F.col("bg").isNotNull())
    bigrams = pairs.select("bg.w1", "bg.w2").groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    if persist:
        unigrams = unigrams.persist()
        bigrams = bigrams.persist()
    stats = unigrams.agg(
        F.count("*").alias("v"), F.sum("c1").alias("t")
    ).collect()[0]
    return NGramLM(
        unigrams=unigrams,
        bigrams=bigrams,
        vocab_size=int(stats["v"]) + 1,  # +1 = unseen class
        total_tokens=int(stats["t"]),
        token_arrays=th if persist else None,
    )


def perplexity_score(
    df: DataFrame,
    id_col: str,
    lm: NGramLM,
    text_col: str = "text",
    alpha: float = 0.1,
    lam: float = 0.7,
    broadcast: bool = True,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Per-document mean bigram log-probability and perplexity under
    ``lm``. Returns ``(id, n_bigrams, avg_logp, perplexity)``;
    documents with < 2 tokens score NULL (no bigram evidence).

    Plan: one positional explode of (w1, w2) per document, keyed
    left joins against the bigram counts on (w1, w2) and the unigram
    counts on w1 (context) and w2 (interpolation term; unseen counts
    coalesce to 0), smoothed probability in-row, one groupBy back to
    documents. Short documents ride the same explode: explode_outer
    emits one null-struct row for a <2-token document, the null join
    keys match nothing, and the aggregate counts only non-null
    bigrams — so no second scan of ``df`` and no join-back is needed
    to emit their NULL score (r9: the join-back was a whole extra
    shuffle join on every scoring pass).
    ``broadcast=True`` hints both LM sides map-side — right for a
    bounded reference LM; pass ``False`` for corpus-scale LMs and
    let AQE pick the join."""
    th = df.select(
        F.col(id_col), _token_hashes(text_col, token_mode).alias("__th")
    )
    pairs = th.select(
        F.col(id_col),
        F.explode_outer(
            F.when(
                F.size("__th") < 2,
                F.array().cast("array<struct<w1:bigint,w2:bigint>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size("__th") - 2),
                    lambda i: F.struct(
                        F.get(F.col("__th"), i).alias("w1"),
                        F.get(F.col("__th"), i + 1).alias("w2"),
                    ),
                )
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bi = F.broadcast(lm.bigrams) if broadcast else lm.bigrams
    uni1 = F.broadcast(lm.unigrams) if broadcast else lm.unigrams
    uni2 = (
        F.broadcast(
            lm.unigrams.select(
                F.col("w1").alias("w2"), F.col("c1").alias("c2")
            )
        )
        if broadcast
        else lm.unigrams.select(
            F.col("w1").alias("w2"), F.col("c1").alias("c2")
        )
    )
    av = float(alpha) * lm.vocab_size
    c1d = F.coalesce(F.col("c1"), F.lit(0)).cast("double")
    lam_eff = F.lit(float(lam)) * c1d / (c1d + F.lit(1.0))
    p_bi = (
        F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(float(alpha))
    ) / (
        F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(av)
    )
    p_uni = (
        F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(alpha))
    ) / F.lit(float(lm.total_tokens) + av)
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni1, ["w1"], "left")
        .join(uni2, ["w2"], "left")
        .select(
            F.col(id_col),
            # w1 rides along so the aggregate can count TRUE bigram
            # rows (null w1 = a short document's padding row).
            F.col("w1"),
            # Null w1 marks a short document's padding row — it must
            # not score (the coalesced-to-0 counts would otherwise
            # produce a REAL unseen-bigram probability for it).
            F.when(
                F.col("w1").isNotNull(),
                F.log(lam_eff * p_bi + (F.lit(1.0) - lam_eff) * p_uni),
            ).alias("__logp"),
        )
    )
    # n_bigrams counts BIGRAM rows (non-null w1), not non-null log
    # probabilities: at alpha=0 an unseen bigram's probability is 0
    # and F.log(0) is NULL in Spark, which avg() already skips (the
    # pre-r9 join-back shape behaved the same) — but the COUNT must
    # keep reporting the document's true bigram total (r9 review).
    return scored.groupBy(id_col).agg(
        F.count("w1").cast("bigint").alias("n_bigrams"),
        F.avg("__logp").alias("avg_logp"),
        F.exp(-F.avg("__logp")).alias("perplexity"),
    )
