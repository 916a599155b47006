"""Vectorized XXH64 primitives, bit-exact to Spark's ``xxhash64``.

Spark's ``XxHash64`` expression folds its children left-to-right:
``hash = hashLong(c1, 42); hash = hashType(c2, hash); ...`` with the
per-type single-value XXH64 paths (8-byte little-endian for
LongType, 4-byte for IntegerType). These numpy ports reproduce those
paths exactly (constants and rounds from the public xxHash spec,
github.com/Cyan4973/xxHash), so an Arrow kernel can compute the SAME
hash values the JVM expressions produce — equality is pinned against
``F.xxhash64`` on random draws in tests/test_operators.py.

Used by the MinHash-LSH banding kernel (operators/dedup.py,
``_banded_rows``): the per-(band, row) derived hash
``xxhash64(gram, b*rows + j)`` costs one 8-byte round (seed 42) per
gram PLUS one 4-byte round per (gram, index) pair; interpreted JVM
HOFs walk the expression tree per element, while these run the
identical arithmetic as ~15 fused uint64 numpy ops per round.

All functions take/return ``np.uint64`` arrays (or scalars) —
callers ``.view()`` between int64 (Spark's bigint) and uint64, which
reinterprets bits and never copies. Overflow is the algorithm
(mod-2^64 wraparound), hence the local ``errstate`` guards.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SEED = np.uint64(42)  # Spark's fixed xxhash64 seed


def _rotl(x, r: int):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h):
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_long(value, seed):
    """XXH64 of one 8-byte (long) input — Spark's ``hashLong``.

    ``value``/``seed``: uint64 scalars or arrays (broadcasting ok).
    """
    with np.errstate(over="ignore"):
        h = seed + _P5 + np.uint64(8)
        k1 = _rotl(value * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def xxh64_int(value, seed):
    """XXH64 of one 4-byte (int) input — Spark's ``hashInt``.

    ``value`` is masked to its low 32 bits (the JVM widens the int
    unsigned), so callers may pass the index as uint64 directly.
    """
    with np.errstate(over="ignore"):
        h = seed + _P5 + np.uint64(4)
        h ^= (value & np.uint64(0xFFFFFFFF)) * _P1
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)
