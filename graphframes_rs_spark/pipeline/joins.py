"""Temporal joins over keyed event/metric streams.

``asof_join`` — the point-in-time ("as-of") join: for every left row,
attach the LATEST right row with ``right.ts <= left.ts`` for the same
key (ties: the right row at the exact same timestamp matches). The
standard primitive for joining facts to slowly-changing state — trades
to quotes, events to feature snapshots, training examples to
point-in-time labels — without future leakage.

Spark-first plan (NO join operator at all): both sides are unioned with
a side tag and sorted within each key partition by (ts, side); a
carry-forward window (``last(..., ignorenulls=True)`` over the preceding
frame) propagates the most recent right-side values onto every left row.
One shuffle on the key, work linear in |left| + |right| — versus the
naive equi-join + filter + row_number which materializes every
(left, earlier-right) pair (quadratic per hot key) before discarding all
but one. This union-sort-carry shape is how kdb/QuestDB/DuckDB implement
ASOF natively; the window is its direct Spark expression.

The DuckDB oracle uses the engine's built-in ``ASOF LEFT JOIN`` — an
entirely independent implementation — so the gate cross-checks semantics,
not a shared replay.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_cols: Optional[List[str]] = None,
    suffix: str = "_right",
    tolerance_seconds: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus, for each of
    ``value_cols`` (default: every non-key, non-ts right column), the
    value from the latest ``right`` row at or before its timestamp —
    NULL if none (or none within ``tolerance_seconds``). The matched
    right timestamp is exposed as ``<ts_col><suffix>``.

    Both timestamp columns must be comparable (both TIMESTAMP or both
    numeric). ``tolerance_seconds`` bounds staleness: matches older than
    ``left.ts - tolerance`` are nulled (TIMESTAMP columns only)."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key_col, ts_col)]
    overlap = set(left.columns) & {v + suffix for v in value_cols}
    if overlap:
        raise ValueError(f"suffixed right columns collide with left: {overlap}")

    l_tag = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__rv_{v}") for v in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__rts"),
    )
    r_tag = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(l_tag.schema["__lrow"].dataType)
        .alias("__lrow"),
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols],
        F.col(ts_col).alias("__rts"),
    )
    merged = l_tag.unionByName(r_tag)
    # among right rows sharing (key, ts), the LAST in (all value columns)
    # order wins — an arbitrary but deterministic pick, stable across
    # partitionings (real feeds rarely duplicate (key, ts); dedupe
    # upstream if the pick matters)
    tiebreak = [F.col(f"__rv_{v}") for v in value_cols]
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__side"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side",
        "__lrow",
        "__ts",
        F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(f"__rv_{v}", ignorenulls=True).over(w).alias(f"__m_{v}")
            for v in value_cols
        ],
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = F.col("__m_ts").isNotNull() & (
            F.unix_timestamp("__ts") - F.unix_timestamp("__m_ts")
            <= tolerance_seconds
        )
    else:
        fresh = F.col("__m_ts").isNotNull()
    return carried.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        F.when(fresh, F.col("__m_ts")).alias(ts_col + suffix),
        *[
            F.when(fresh, F.col(f"__m_{v}")).alias(v + suffix)
            for v in value_cols
        ],
    )
