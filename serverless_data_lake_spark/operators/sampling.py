"""Deterministic sampling and dataset splitting.

Training pipelines need samples and train/val/test splits that are
**reproducible** (same rows on every run, any cluster size, any
partitioning) and **leakage-safe** (all rows of a group — document,
user, session — land on the same side). Random-number sampling
(``df.sample``) is neither: it depends on partition layout and seed
plumbing. These operators instead hash a stable key to a uniform
[0, 1) value — pure column arithmetic, embarrassingly parallel, no
shuffle, and exactly reproducible in any engine that has md5 (the
DuckDB oracles reproduce the selections bit-for-bit).

- :func:`hash_unit`            — md5-prefix → uniform [0, 1).
- :func:`deterministic_sample` — keep rows with unit(key) < rate.
- :func:`assign_splits`        — named splits from cumulative rate
  bounds; key on a *group* column for leakage-safe splits.

The ``salt`` decorrelates different samples over the same keys
(sample for eval vs sample for inspection) — change the salt, get an
independent selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def hash_unit(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) from a stable key: the first 8 hex chars of
    ``md5(salt || key)`` as an integer over 2^32. Deterministic
    across runs, partitionings, and engines."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash — the same keys are
    kept on every run. Sampling a *group* key keeps groups intact."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(hash_unit(F.col(key_col), salt) < rate)


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    cumulative hash-unit bounds (e.g. train [0, .8), val [.8, .9),
    test [.9, 1)). Keying on a group column (user, document) makes
    the split leakage-safe: every row of a group gets the same
    assignment. Weights must sum to 1 (±1e-9)."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_unit(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(splits.items())
    for name, w in names[:-1]:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
