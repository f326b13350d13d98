"""Skew-handling primitives: salted aggregation and salted broadcast join.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`) repairs SORT-MERGE
joins at runtime, but two hot-key shapes still funnel into single tasks
on a 1000-executor cluster:

* a high-cardinality aggregate where a handful of keys own most rows
  (`groupBy(key)` puts each key in exactly ONE task no matter how many
  rows it has) — when the per-key STATE is large (collect_list / exact
  distinct), the hot key's task spills or dies;
* a shuffle join whose build side is small enough to broadcast but whose
  probe side is so hot-keyed that even AQE's splits leave stragglers.

``salted_agg`` implements the standard two-stage repair: append a
deterministic salt (``xxhash64(row) % buckets``), aggregate on
(key, salt) — the hot key fans out over ``buckets`` tasks — then
re-aggregate the partial states by key. Works for any algebraic
aggregate (sum/count/min/max, and mergeable sketches); the caller
supplies the partial and merge expression lists, mirroring how Spark
itself splits partial/final aggregation.

``replicated_broadcast_join`` handles the join side: replicate the SMALL
side ``buckets`` times (explode over the salt range), salt the big side's
rows, and equi-join on (key, salt) — every task sees 1/buckets of each
hot key. With a broadcast build side this is pure belt-and-suspenders vs
plain broadcast; its real use is when the build side is JUST too big to
broadcast and the shuffle join would skew.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: List[Column],
    merge_aggs: List[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregate: partial on (keys, salt), merge on
    keys. ``partial_aggs`` run against raw rows; ``merge_aggs`` run
    against the partial columns (refer to their aliases). The salt is
    ``xxhash64`` of the whole row (deterministic, partition-independent) —
    NOT rand(), which breaks retry idempotency under task re-execution."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2 (1 bucket = plain groupBy)")
    # pmod, not abs(h) % b: abs(Long.MIN_VALUE) overflows under ANSI.
    # Identical-duplicate rows hash to one salt — if the hot key's rows are
    # byte-identical, pre-mix a line number (e.g. from the source) first.
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def replicated_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: big side gets a deterministic row salt, small side
    is replicated once per salt value, join keys become (on..., salt).
    Output columns = big's ∪ small's non-key columns (the salt never
    escapes). Only 'inner' and 'left' are meaningful for this shape."""
    if how not in ("inner", "left"):
        raise ValueError("replicated join supports how in ('inner', 'left')")
    keys = list(on)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(buckets)).cast("long")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = salted_big.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")
