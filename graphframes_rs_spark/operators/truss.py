"""k-truss: the maximal subgraph whose every edge closes >= k-2
triangles inside the subgraph — the edge-analogue of k-core and the
standard cohesive-community primitive one step stronger than triangles.

Not in the reference (empty community placeholder) or GraphFrames.

Peeling loop, each round pure DataFrame ops:

  1. canonical undirected simple edges (u < v);
  2. per-edge triangle support via the same oriented wedge-close joins
     as ``triangle_count`` (each triangle found once, credited to its
     three edges by an explode);
  3. drop edges with support < k-2; repeat until no edge drops.

Each round checkpoints the surviving edge set (lineage truncation,
exactly like the Pregel supersteps) and pays one count action for the
convergence check. Rounds are bounded by the peeling depth — on real
graphs a handful; the per-round cost is triangle counting on the
shrinking survivor set, so later rounds get cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, SRC, symmetrize_edges


class KTrussBuilder:
    def __init__(self, graph: GraphFrame, k: int):
        if k < 3:
            raise ValueError("k-truss requires k >= 3 (k=2 is the whole graph)")
        self.graph = graph
        self.k = k
        self.max_iter = 50
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "KTrussBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "KTrussBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[src, dst, support] — the k-truss's edges as
        canonical undirected pairs (src < dst) with their final triangle
        support inside the truss."""
        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        spark = self.graph.vertices.sparkSession
        ckpt = ParquetCheckpointer(spark, self._checkpoint_dir)
        need = self.k - 2

        cur = (
            symmetrize_edges(self.graph.edges.select(SRC, DST), deduplicate=True)
            .filter(F.col(SRC) < F.col(DST))
        )
        cur = ckpt.push(cur.withColumn("support", F.lit(0)), "truss_0")
        prev_n = cur.count()
        if prev_n == 0:
            return cur

        converged = False
        for rnd in range(1, self.max_iter + 1):
            from graphframes_rs_spark.operators.triangles import (
                enumerate_triangles,
            )

            base = cur.select(SRC, DST)
            tri = enumerate_triangles(base)  # a < b < c, once
            sides = tri.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias(SRC), F.col("b").alias(DST)),
                        F.struct(F.col("b").alias(SRC), F.col("c").alias(DST)),
                        F.struct(F.col("a").alias(SRC), F.col("c").alias(DST)),
                    )
                ).alias("e")
            ).select("e.src", "e.dst")
            support = sides.groupBy(SRC, DST).agg(
                F.count(F.lit(1)).alias("support")
            )
            nxt = (
                base.join(support, [SRC, DST], "left")
                .select(
                    SRC,
                    DST,
                    F.coalesce(F.col("support"), F.lit(0)).alias("support"),
                )
                .filter(F.col("support") >= need)
            )
            cur = ckpt.push(nxt, f"truss_{rnd}")
            n = cur.count()
            self.iterations_ = rnd
            ckpt.evict_all_but_latest()
            if n == prev_n or n == 0:
                converged = True
                break
            prev_n = n
        if not converged:
            import warnings

            warnings.warn(
                f"k_truss stopped at max_iterations={self.max_iter} "
                "before the peeling fixpoint: the result is NOT a "
                "k-truss (its support column predates the final round's "
                "drops). Raise max_iterations to converge.",
                RuntimeWarning,
                stacklevel=2,
            )
        return cur
