"""Embedding clustering: deterministic distributed Lloyd k-means.

Training-data pipelines cluster embeddings constantly — SemDeDup prunes
within clusters, domain balancing samples per cluster, IVF indexes are
built on one. The engine's IVF path (``pipeline/similarity.py``) uses
MLlib KMeans whose kmeans|| init is seed-dependent across engines; this
operator is the *auditable* variant: hash-chosen initial centers and a
fixed iteration count make the result reproducible bit-for-bit across
runs AND re-derivable in plain SQL, so cluster assignments feeding a
data recipe can be checked by an external gate.

Spark-first scaling shape:
- assignment is a pure column expression against a BROADCAST centroid
  literal (k·d doubles — kilobytes): one narrow map stage, no shuffle,
  whole-stage codegen, no Python in the loop;
- the centroid update is ONE combine-enabled aggregation per iteration
  (``groupBy(cluster).avg(component...)`` — map-side partial means), so
  each Lloyd round is exactly one shuffle of k·d partials per task;
- centroids live driver-side between rounds (they are aggregate results,
  k·d values — the same contract as MLlib's).

Cross-engine determinism: distances and refreshed centroid coordinates
are rounded to ``decimals`` before comparison/reuse, argmin tie-breaks
on the lower cluster id via struct ordering, and init picks the k
lowest ``hash60(vec_id)`` vectors (ties impossible — md5 of distinct
ids). Identical rules express in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline.text import hash60


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Returns DataFrame[<id_col>, cluster, dist2] — the assignment of
    the ``iters``-th Lloyd round from the deterministic hash-ranked init
    (centroids refresh between consecutive rounds, so ``iters`` rounds
    perform ``iters - 1`` refreshes). ``dist2`` is the squared L2
    distance to the winning centroid, rounded to ``decimals``."""
    pts = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    dim = pts.select(F.size("v")).limit(1).collect()[0][0]

    # Init: the k vectors with the lowest md5-based hash of their id —
    # order-independent, sample-free, one TakeOrderedAndProject job.
    seed_rows = (
        pts.select("v", hash60(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids: List[List[float]] = [list(r["v"]) for r in seed_rows]

    def assign(df: DataFrame) -> DataFrame:
        # Higher-order functions keep the expression tree O(1) in k and d
        # (an unrolled k·d literal sum measurably stalls codegen: 48s vs
        # ~2s at k=16, d=64); the distance loop runs at evaluation time.
        # left-to-right aggregate() matches the oracle's list_sum fold.
        cen = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
        d2s = F.transform(
            cen,
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                decimals,
            ),
        )
        best = F.array_min(
            F.zip_with(
                d2s,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda d, i: F.struct(d.alias("d2"), i.alias("cid")),
            )
        )
        return df.select(
            id_col,
            "v",
            best["cid"].alias("cluster"),
            best["d2"].alias("dist2"),
        )

    for _ in range(iters - 1):
        assigned = assign(pts)
        # One combine-enabled aggregation: per-cluster coordinate means.
        new_rows = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        by_cid = {r["cluster"]: r for r in new_rows}
        centroids = [
            [round(by_cid[j][f"m{i}"], decimals) for i in range(dim)]
            if j in by_cid
            else centroids[j]  # empty cluster keeps its previous center
            for j in range(k)
        ]

    return assign(pts).select(id_col, "cluster", "dist2")
