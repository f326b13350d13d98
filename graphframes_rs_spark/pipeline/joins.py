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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
    start_col: str = "start",
    end_col: str = "end",
    cell: int = 3600,
) -> DataFrame:
    """Keyed interval-overlap (range) join: one output row per pair of
    intervals on the same key that overlap (``l.start <= r.end AND
    r.start <= l.end``; closed ends). Both inputs carry
    ``[key_col, id_col, start_col, end_col]`` with numeric bounds; output
    is ``[<key>, l_id, r_id, overlap_start, overlap_end]``.

    Spark-first plan — the GRID join: a plain equi-join on the key plus
    inequality filters makes every hot key a quadratic cross product
    (10^5 intervals on one key = 10^10 filtered pairs). Instead each
    interval explodes to the ``cell``-width grid cells it touches and the
    join runs on ``(key, cell)`` — per-task work is (intervals per cell)²,
    dialed by ``cell``, not by key popularity. A pair overlapping several
    shared cells is emitted EXACTLY once with zero dedup shuffle: only
    the cell containing ``max(l.start, r.start)`` — the first cell both
    occupy — reports it (the standard dedup-free grid-join trick; a
    distinct would shuffle the full pair set a second time).

    Pick ``cell`` near the typical interval length: explode factor is
    ~len/cell + 1 per row, per-cell density is load per task."""
    if cell <= 0:
        raise ValueError("cell must be a positive grid width")

    def gridded(df, side):
        s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
        # degenerate rows (end < start) would make sequence() run
        # backwards and emit wrong cells; they can never overlap anything
        df = df.filter(e >= s)
        return df.select(
            F.col(key_col).alias("__k"),
            F.col(id_col).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            e.alias(f"{side}_e"),
            F.explode(
                F.sequence(F.floor(s / cell), F.floor(e / cell))
            ).alias("__cell"),
        )

    lg = gridded(left, "l")
    rg = gridded(right, "r")
    joined = lg.join(rg, ["__k", "__cell"])
    overlap = (F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e"))
    first_shared_cell = F.col("__cell") == F.floor(
        F.greatest("l_s", "r_s") / cell
    )
    return (
        joined.filter(overlap & first_shared_cell)
        .select(
            F.col("__k").alias(key_col),
            "l_id",
            "r_id",
            F.greatest("l_s", "r_s").alias("overlap_start"),
            F.least("l_e", "r_e").alias("overlap_end"),
        )
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    end_open: int = 9223372036854775807,
    tiebreak_cols: tuple = (),
) -> DataFrame:
    """Build slowly-changing-dimension type-2 validity intervals from a
    change log: for each key's change ordered by time, ``valid_from`` is
    the change time and ``valid_to`` the next change's time (the current
    version gets the ``end_open`` sentinel). ``is_current`` marks the
    open row. The standard warehouse primitive that turns event-sourced
    state into point-in-time joinable dimensions (pair with
    :func:`asof_join` or :func:`interval_join`).

    One key-partitioned window (lead) — per-key work linear, parallel
    across keys. Pass ``tiebreak_cols`` when a key can change twice at
    the same timestamp, so version order (and thus the interval chain)
    is deterministic."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    nxt = F.lead(F.col(ts_col).cast("long")).over(w)
    return changes.select(
        "*",
        F.col(ts_col).cast("long").alias("valid_from"),
        F.coalesce(nxt, F.lit(end_open)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
