"""Byte-level BPE tokenization — real token budgets for the
training-data pipeline, no external dependencies.

Every token count in the engine is whitespace-based by default
(:func:`operators.text.token_count`), which is JVM-side and fast but
does not match how a trainer consumes the data: context windows are
budgeted in SUBWORD tokens. This module implements byte-pair
encoding in the GPT-2 style (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; Radford et al. 2019
§2.2 for the byte-level formulation) from its public description:

- text is pre-tokenized into word-ish chunks (an ASCII-class
  approximation of GPT-2's regex — contractions, letter runs, digit
  runs, punctuation runs, with the leading-space convention);
- each chunk's UTF-8 bytes are the base alphabet (ids 0-255);
- a FROZEN, ordered merge list (``bpe_vocab.py``, trained by
  ``tools/train_bpe_vocab.py`` and committed — the data file is the
  vocabulary) is applied greedily by merge rank, exactly as at
  training time.

Intentional simplifications, stated plainly: no printable-byte
remapping (GPT-2's is a reversible display trick — token IDENTITY
and counts are unaffected), ASCII letter/digit classes instead of
``\\p{L}``/``\\p{N}`` (non-ASCII scripts fall through to the
punctuation-run rule; the shipped vocab is trained with this same
pre-tokenizer, so encoding is self-consistent), and a small vocab
(256 bytes + the shipped merges) — swap ``bpe_vocab.py`` for a
larger trained file to change that; nothing else needs touching.

Scale shape: encoding is genuinely Python (a data-dependent merge
loop has no Column-expression form), so the Spark surface is an
Arrow-batched pandas UDF (:func:`bpe_token_count_udf`) with a
per-executor LRU over pre-token chunks — natural-language corpora
repeat chunks heavily (Zipf), so steady-state cost is a dict lookup
per chunk, not a merge loop per word. This is the documented
"UDF only where the built-ins genuinely can't express it" boundary.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# infers the eval type from REAL pd.Series annotations, and the
# future import would stringify them into unresolvable names.
import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

# GPT-2-style pre-tokenizer, ASCII approximation (see module
# docstring). Order matters: contractions first, then " ?"-prefixed
# letter/digit/other runs, then whitespace runs.
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)


def pretokenize(text: str) -> list[str]:
    """Split text into BPE pre-token chunks (GPT-2 convention: a
    word carries its leading space, so merges never cross word
    boundaries)."""
    return _PRETOKEN_RE.findall(text)


# ---------------------------------------------------------------------------
# Encoding against a frozen merge list
# ---------------------------------------------------------------------------
def _merge_ranks(merges: list[tuple[int, int]]) -> dict[tuple[int, int], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


def encode_chunk(
    chunk: str, ranks: dict[tuple[int, int], int], base: int = 256
) -> list[int]:
    """BPE-encode ONE pre-token chunk: start from UTF-8 bytes, then
    repeatedly merge the lowest-rank adjacent pair — the standard
    greedy procedure that reproduces training-time segmentation."""
    ids = list(chunk.encode("utf-8"))
    while len(ids) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(ids) - 1):
            r = ranks.get((ids[i], ids[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        ids[best_i : best_i + 2] = [base + best_rank]
    return ids


class BpeTokenizer:
    """Frozen-vocab byte-level BPE encoder/counter.

    ``merges`` is the ordered merge list; token id of merge k is
    ``256 + k``. ``decode`` inverts exactly (byte-level BPE is
    lossless by construction)."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = list(merges)
        self.ranks = _merge_ranks(self.merges)
        # token id -> byte string, built once.
        table: list[bytes] = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            table.append(table[a] + table[b])
        self._bytes = table
        # Per-chunk memoization: Zipfian chunk reuse makes this the
        # hot-path fast path (maxsize bounds executor memory).
        self._encode_cached = lru_cache(maxsize=262_144)(
            lambda ch: tuple(encode_chunk(ch, self.ranks))
        )

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for ch in pretokenize(text):
            out.extend(self._encode_cached(ch))
        return out

    def decode(self, ids: list[int]) -> str:
        return b"".join(self._bytes[i] for i in ids).decode(
            "utf-8", errors="replace"
        )

    def decode_window(self, ids: list[int]) -> str:
        """Decode a token-id WINDOW (a slice of a longer encoding),
        trimming incomplete UTF-8 sequences at both edges instead of
        emitting U+FFFD: base tokens are single bytes, so a window
        boundary can split a multi-byte character — the leading
        orphan continuation bytes and any trailing incomplete
        sequence (≤ 3 bytes each side) belong to characters whose
        remainder sits in the adjacent window. Full-encoding decodes
        should use :meth:`decode`, which is exactly lossless."""
        raw = b"".join(self._bytes[i] for i in ids)
        start = 0
        while start < len(raw) and (raw[start] & 0xC0) == 0x80:
            start += 1
        end = len(raw)
        i = end - 1
        ncont = 0
        while i >= start and (raw[i] & 0xC0) == 0x80:
            i -= 1
            ncont += 1
        if i >= start:
            b0 = raw[i]
            if b0 >= 0xC0:  # multi-byte start: complete iff all
                need = 2 if b0 < 0xE0 else 3 if b0 < 0xF0 else 4
                if 1 + ncont < need:
                    end = i
        return raw[start:end].decode("utf-8", errors="replace")

    def count(self, text: str) -> int:
        return sum(len(self._encode_cached(ch)) for ch in pretokenize(text))


_DEFAULT: BpeTokenizer | None = None


def default_tokenizer() -> BpeTokenizer:
    """The shipped frozen vocabulary (``bpe_vocab.py``), loaded
    lazily once per process (driver or executor)."""
    global _DEFAULT
    if _DEFAULT is None:
        from serverless_data_lake_spark.operators.bpe_vocab import MERGES

        _DEFAULT = BpeTokenizer([tuple(m) for m in MERGES])
    return _DEFAULT


# ---------------------------------------------------------------------------
# Training (offline: tools/train_bpe_vocab.py; also used by tests)
# ---------------------------------------------------------------------------
def train_bpe(texts: list[str], num_merges: int) -> list[tuple[int, int]]:
    """Learn an ordered merge list from a corpus — the classic
    frequency-greedy BPE trainer over pre-token chunks (chunk
    frequencies weight pair counts, merges never cross chunks).
    Deterministic: ties break on the lexicographically smallest
    pair, so the same corpus always yields the same vocab file."""
    from collections import Counter

    chunk_freq = Counter()
    for t in texts:
        chunk_freq.update(pretokenize(t))
    # chunk -> current id sequence
    seqs: dict[str, list[int]] = {
        ch: list(ch.encode("utf-8")) for ch in chunk_freq
    }
    merges: list[tuple[int, int]] = []
    for k in range(num_merges):
        pair_counts: Counter = Counter()
        for ch, ids in seqs.items():
            f = chunk_freq[ch]
            for i in range(len(ids) - 1):
                pair_counts[(ids[i], ids[i + 1])] += f
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < 2:
            break
        new_id = 256 + k
        merges.append(best)
        for ch, ids in seqs.items():
            i = 0
            while i < len(ids) - 1:
                if (ids[i], ids[i + 1]) == best:
                    ids[i : i + 2] = [new_id]
                else:
                    i += 1
    return merges


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------
def bpe_token_count_udf() -> Column:
    """Factory for the Arrow-batched BPE token-count UDF; apply as
    ``bpe_token_count_udf()(F.col("text"))``. Executors each build
    the frozen tokenizer once (lazy module singleton) and share the
    chunk LRU across batches via worker reuse."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        tok = default_tokenizer()
        return texts.map(lambda t: 0 if t is None else tok.count(t))

    return _count


def bpe_encode_udf() -> Column:
    """Factory for the Arrow-batched BPE encode UDF: text →
    ``array<long>`` of token ids under the frozen vocab. Token ids
    are already stable small integers, so downstream consumers (the
    bigram LM's count tables) use them directly where they would
    xxhash64 word strings — same 8-byte key shape, same joins."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _encode(texts: pd.Series) -> pd.Series:
        tok = default_tokenizer()
        return texts.map(lambda t: [] if t is None else tok.encode(t))

    return _encode
