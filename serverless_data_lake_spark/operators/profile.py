"""Table profiling: per-column statistics in one action.

A data-quality staple the reference exposes indirectly (its
transformation agent samples tables to reason about shape;
``lambdas/transformation_agent/agents/transformation_agent/
analyzer.py`` builds its prompt from schema + sample rows).

Plan shape (r12, measured): the no-distinct stats (count, nulls,
min/max) are ONE wide aggregation; each EXACT ``COUNT(DISTINCT)``
is its own one-row aggregate subtree cross-joined in (a one-row
cross join is a broadcast nested-loop of single rows — free). A
single fused aggregate plans every distinct through an ``Expand``
(one projection per distinct column + the null group), multiplying
every row ×(n_distinct_cols+1) through the partial aggregate; the
subtree shape instead scans per column — column-pruned at the
parquet reader, so total bytes are the same on columnar storage —
and its stages schedule in PARALLEL. Measured at sf0.1 over three
orders columns (5-rep medians): fused-Expand 1.0-1.17 s, subtrees
0.36-0.42 s. Caveat: over a NON-columnar source (JSON/CSV) the
subtrees re-parse the input once per distinct column — set
``split_distinct=False`` there to keep the single-scan Expand plan.

``approx=True`` swaps COUNT(DISTINCT) for HyperLogLog++
(``approx_count_distinct``): one pass, mergeable sketches, bounded
memory — the only viable distinct-counter at 100 TB, and a plain
(non-Expand) aggregate, so it always rides the single wide agg. The
exact mode is the correctness oracle for the approximate one (see
the ``approx_distinct_gate`` driver entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    split_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: ``column, n_rows, n_nulls, n_distinct,
    min_value, max_value`` (min/max as strings so heterogeneous
    column types fit one result schema; NULL for unordered types).

    One ACTION regardless of column count — the aggregate row is a
    few KB, unpivoted with ``stack``. In exact mode each
    COUNT(DISTINCT) runs as its own parallel one-row subtree by
    default (see module docstring for the measured Expand-vs-subtree
    trade; ``split_distinct=False`` restores the single fused
    scan for expensive-to-rescan sources)."""
    cols = columns or df.columns
    n = F.count(F.lit(1))
    split = split_distinct and not approx
    aggs = [n.alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        if not split:
            aggs.append(
                (
                    F.approx_count_distinct(c)
                    if approx
                    else F.count_distinct(F.col(c))
                ).alias(f"__dist_{c}")
            )
        try:
            orderable = df.schema[c].dataType.typeName() not in (
                "array",
                "map",
                "struct",
                "binary",
            )
        except KeyError:
            orderable = False
        if orderable:
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs)
    if split:
        for c in cols:
            row = row.crossJoin(
                df.agg(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
            )
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"`__nulls_{c}`",
            f"`__dist_{c}`",
            f"`__min_{c}`",
            f"`__max_{c}`",
        ]
    return row.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )
