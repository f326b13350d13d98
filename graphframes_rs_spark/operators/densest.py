"""Densest subgraph via parallel greedy peeling (Bahmani et al., VLDB'12).

Extension beyond the reference's algorithm surface (its `src/algorithm/`
tree stops at connectivity/centrality/kcore/mis — no density objective):
finds a vertex set S maximizing density ρ(S) = |E(S)| / |S| to within a
factor 2(1+ε), using the MapReduce-friendly variant of Charikar's greedy
peeling — instead of removing ONE minimum-degree vertex per step (an
inherently sequential O(n)-round algorithm), each round removes EVERY
vertex whose degree is ≤ 2(1+ε)·ρ(G_t). The surviving-graph density is
tracked per round and the best snapshot wins; Bahmani et al. prove the
best snapshot is a 2(1+ε) approximation and that the loop terminates in
O(log_{1+ε} n) rounds — the property that makes it distributable.

Spark shape per round: degrees via ONE combine-enabled explode+groupBy
over the current edge set, a broadcast-joined removal filter, and a
semi-join to drop edges touching removed vertices. |V|/|E| loop control
rides a single 2-long aggregate per round (driver-side, O(log n) times).
Each round's vertex set is parquet-checkpointed so the best snapshot is
re-readable without recomputation — at 100 TB the checkpoint store is
the only state that must persist across rounds, and every shuffle is
keyed on vertex id.

The input is treated as UNDIRECTED: edges are symmetrized + deduplicated
and self-loops dropped before peeling, matching the objective's |E(S)|
(each unordered pair counted once; density uses the once-counted total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import (
    DST,
    GraphFrame,
    GraphFrameError,
    ID,
    SRC,
    symmetrize_edges,
)


class DensestSubgraphBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self._eps = 0.1
        self._max_rounds = 50
        self._checkpoint_dir = None
        self.rounds_ = 0
        self.best_density_ = 0.0

    def epsilon(self, e: float) -> "DensestSubgraphBuilder":
        """Peeling slack: threshold is 2(1+ε)ρ. Larger ε ⇒ fewer rounds,
        looser 2(1+ε) approximation guarantee."""
        self._eps = e
        return self

    def max_rounds(self, n: int) -> "DensestSubgraphBuilder":
        self._max_rounds = n
        return self

    def set_checkpoint_dir(self, d: str) -> "DensestSubgraphBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, density] — the members of the densest
        snapshot found, each row carrying the snapshot's density
        (|E|/|V|, edges counted once, rounded to 6 places)."""
        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        spark = self.graph.vertices.sparkSession
        ckpt = ParquetCheckpointer(spark, self._checkpoint_dir)
        # one undirected copy per unordered pair: canonical src<dst ordering
        und = (
            symmetrize_edges(self.graph.edges.select(SRC, DST), deduplicate=True)
            .filter(F.col(SRC) < F.col(DST))
        )
        edges = ckpt.push(und, "dsg_e0")
        factor = 2.0 * (1.0 + float(self._eps))

        best_density = -1.0
        best_df = None
        for rnd in range(self._max_rounds):
            # degrees once per round; |V| = #distinct endpoints (isolated
            # vertices never affect the argmax: dropping them only raises
            # density, so the peel works on the endpoint-induced graph)
            degs = (
                edges.select(F.explode(F.array(SRC, DST)).alias(ID))
                .groupBy(ID)
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            degs = ckpt.push(degs, f"dsg_v{rnd}")
            row = degs.agg(
                F.count(F.lit(1)).alias("nv"), F.sum("deg").alias("deg2")
            ).collect()[0]
            nv, m = int(row["nv"] or 0), int(row["deg2"] or 0) // 2
            if nv == 0:
                break
            density = m / nv
            if density > best_density:
                best_density, best_df = density, degs
            keep = degs.filter(F.col("deg") > F.lit(factor * density)).select(ID)
            edges = ckpt.push(
                edges.join(
                    keep.withColumnRenamed(ID, SRC), SRC, "left_semi"
                ).join(keep.withColumnRenamed(ID, DST), DST, "left_semi"),
                f"dsg_e{rnd + 1}",
            )
            self.rounds_ = rnd + 1
        else:
            raise GraphFrameError(
                f"densest-subgraph peel did not drain in {self._max_rounds} "
                "rounds — raise max_rounds or epsilon"
            )
        if best_df is None:
            raise GraphFrameError("graph has no edges — density undefined")
        self.best_density_ = best_density
        return best_df.select(
            ID, F.round(F.lit(best_density), 6).alias("density")
        )
