"""Single-source shortest paths with edge weights (Bellman-Ford on Pregel).

The reference's shortest paths are unweighted hop counts
(src/algorithm/connectivity/shortest_paths.rs); this operator extends the
same Pregel recipe to non-negative edge weights — the natural "complete
engine" companion, and the production exercise of the builder's
``add_edge_column`` surface:

  state:   dist double (source 0.0, else +inf)
  msg:     src.dist + edge.weight   (only from reachable sources)
  agg:     min
  update:  least(dist, msg)
  voting/participation: "my distance just improved"

Converges in at most |V| supersteps for non-negative weights (Bellman-Ford
bound); each superstep relaxes every edge once — O(E) work keyed on vertex
ids, same shuffle profile as unweighted BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pregel import MessageDirection, Pregel

INF = float("inf")


class WeightedSSSPBuilder:
    def __init__(self, graph: GraphFrame, source: int, weight_col: str = "weight"):
        self.graph = graph
        self.source = source
        self.weight_col = weight_col
        self.max_iter = 2**31
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "WeightedSSSPBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "WeightedSSSPBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, dist] (unreachable => +Infinity)."""
        improved = F.col("dist") > Pregel.msg()
        new_dist = F.when(Pregel.msg().isNull(), F.col("dist")).otherwise(
            F.least(F.col("dist"), Pregel.msg())
        )
        msg = Pregel.src("dist") + Pregel.edge(self.weight_col)

        builder = (
            GraphFrame(self.graph.vertices.select(ID), self.graph.edges)
            .pregel()
            .add_vertex_column(
                "dist",
                F.when(F.col(ID) == F.lit(self.source), F.lit(0.0)).otherwise(
                    F.lit(INF)
                ),
                new_dist,
            )
            .add_edge_column(self.weight_col)
            .add_message(msg, MessageDirection.SRC_TO_DST)
            .add_aggregate_expr(F.min(Pregel.msg()))
            .with_participation_column(
                "reaching",
                F.col(ID) == F.lit(self.source),
                F.coalesce(improved, F.lit(False)),
            )
            .with_vertex_voting("active", F.coalesce(improved, F.lit(False)))
            .max_iterations(self.max_iter)
            .skip_dest_state()
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run().select(ID, "dist")
        self.iterations_ = builder.iterations_
        return out
