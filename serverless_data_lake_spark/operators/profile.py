"""Table profiling: per-column statistics in ONE pass.

A data-quality staple the reference exposes indirectly (its
transformation agent samples tables to reason about shape;
``lambdas/transformation_agent/agents/transformation_agent/
analyzer.py`` builds its prompt from schema + sample rows). At
100 TB, profiling must be a single scan: this computes every
column's stats as one wide aggregation — count, nulls, distinct
(exact or HLL approximate), min/max — then unpivots driver-side
(``stack`` over the one aggregated row; zero extra scans).

``approx=True`` swaps COUNT(DISTINCT) for HyperLogLog++
(``approx_count_distinct``): one pass, mergeable sketches, bounded
memory — the only viable distinct-counter at 100 TB. The exact mode
is the correctness oracle for the approximate one (see the
``approx_distinct_gate`` driver entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: ``column, n_rows, n_nulls, n_distinct,
    min_value, max_value`` (min/max as strings so heterogeneous
    column types fit one result schema; NULL for unordered types).

    One aggregation job regardless of column count — the aggregate
    row is a few KB, unpivoted with ``stack``, so profiling cost is
    one table scan plus (in exact mode) the distinct shuffles."""
    cols = columns or df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
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
