"""Table profiling: the per-column stats report every ingest job runs first.

One aggregate pass computes, for every requested column: row count,
non-null count, exact distinct count, and min/max (rendered as strings so
heterogeneous column types melt into one tidy [column, ...] result). The
melt happens AFTER the aggregate — the wide 1-row stats frame pivots to
rows driver-free via ``stack``.

Scale: a single scan; the distinct counts share one Expand-based
aggregate (Spark's standard multi-count-distinct plan). For 100 TB
profiling runs swap ``exact_distinct=False`` to HLL
``approx_count_distinct`` — same call shape, no Expand, fully
map-side-combined.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """[column, n_rows, n_nonnull, n_distinct, min_value, max_value] —
    one row per profiled column; min/max as strings."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"`__nn_{c}`", f"`__nd_{c}`", f"`__mn_{c}`", f"`__mx_{c}`"
        ]
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nonnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value"
    )
