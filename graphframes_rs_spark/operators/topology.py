"""DAG topology operators: topological layers (longest-path levels).

Not present in the reference (no DAG-specific operators exist there; its
algorithm surface is connectivity/centrality — SURVEY.md §2.1). Added as a
first-class operator of the complete engine: layer assignment is the
standard scheduling/lineage primitive (critical-path depth), and it is the
cleanest *max*-propagation exercise of the Pregel builder (shortest paths
and WCC both propagate minima).

Semantics — for a DAG:

  layer(v) = 0                      if v has no in-edges
  layer(v) = 1 + max over in-neighbours u of layer(u)

i.e. the length of the LONGEST path from any source to ``v``; vertices in
the same layer can be processed concurrently once every earlier layer is
done. Converges in ``depth(DAG) + 1`` supersteps.

Cycles: vertices on or downstream of a cycle never stabilize — their layer
keeps growing. With ``max_iterations`` bounded, such vertices report
``layer >= max_iterations``, which doubles as a cheap cycle detector
(``detect_cycles=True`` raises instead of returning).

Scale notes: one message per edge per superstep keyed on dst (max-combines
map-side), participation pruning keeps quiescent vertices out of the join
— same shuffle profile as BFS, run count bounded by graph depth, not |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pregel import MessageDirection, Pregel


class TopologicalLayersBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.max_iter = 2**31
        self._checkpoint_dir = None
        self._detect_cycles = False
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "TopologicalLayersBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "TopologicalLayersBuilder":
        self._checkpoint_dir = d
        return self

    def detect_cycles(self, flag: bool = True) -> "TopologicalLayersBuilder":
        """When bounded iterations run out with vertices still improving
        (only possible on a cyclic graph), raise ``ValueError`` instead of
        returning unstable layers."""
        self._detect_cycles = flag
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, layer] (long)."""
        improved = Pregel.msg() > F.col("layer")
        new_layer = F.when(Pregel.msg().isNull(), F.col("layer")).otherwise(
            F.greatest(F.col("layer"), Pregel.msg())
        )

        builder = (
            GraphFrame(self.graph.vertices.select(ID), self.graph.edges)
            .pregel()
            .add_vertex_column("layer", F.lit(0).cast("long"), new_layer)
            .add_message(Pregel.src("layer") + 1, MessageDirection.SRC_TO_DST)
            .add_aggregate_expr(F.max(Pregel.msg()))
            .with_participation_column(
                "rising",
                F.lit(True),  # round 0: every vertex pushes its 0-layer
                F.coalesce(improved, F.lit(False)),
            )
            .with_vertex_voting("active", F.coalesce(improved, F.lit(False)))
            .max_iterations(self.max_iter)
            .skip_dest_state()
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run().select(ID, "layer")
        self.iterations_ = builder.iterations_
        if self._detect_cycles and self.iterations_ >= self.max_iter:
            # ran the full budget; only a cycle (or a path longer than the
            # budget) can keep layers rising that long
            still = out.filter(F.col("layer") >= self.max_iter).limit(1).count()
            if still:
                raise ValueError(
                    "topological_layers: layers still rising after "
                    f"{self.max_iter} supersteps — graph is cyclic or deeper "
                    "than max_iterations"
                )
        return out
