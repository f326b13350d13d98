"""Strongly connected components via forward-backward coloring
(GraphFrames ``stronglyConnectedComponents`` parity; algorithm after
Orzan's coloring method — the standard distributed SCC construction).

Each outer round, over the vertices not yet assigned:

1. **Color** (forward phase): propagate the minimum vertex id along edge
   direction to a fixpoint — ``col(v)`` = min over {v} ∪ {ancestors of v}
   within the remaining subgraph. Color classes partition the subgraph,
   and each class's root ``c`` (the vertex with ``col(c) == c``) can reach
   every member of SCC(c).
2. **Confirm** (backward phase): from each root, propagate a reached flag
   along REVERSED edges, restricted to the root's own color class. A
   vertex backward-reached by its root is mutually reachable with it:
   root →* v held by coloring, v →* root by the backward walk staying
   inside the class. Those vertices form SCC(root) and are extracted.
3. Remove extracted vertices; repeat. Each round extracts at least one
   SCC per color class, so rounds are bounded by the longest chain of
   SCCs in the condensation (the same bound as the sequential FW-BW
   method).

Both phases are plain Pregel min/bool-OR propagations — the exact
superstep machinery (bucketed exchange-free joins, voting) every other
algorithm here uses; the outer loop's working set shrinks monotonically.
At 100 TB the dominant cost is phase diameter; for graphs with huge
cycles prefer landmark preprocessing, exactly as GraphX's SCC does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, ID, SRC, GraphFrame
from graphframes_rs_spark.pregel import MessageDirection, Pregel

COMPONENT = "component"


class SCCBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.max_outer = 50
        self._checkpoint_dir = None
        self.rounds_ = 0

    def max_outer_rounds(self, n: int) -> "SCCBuilder":
        self.max_outer = n
        return self

    def set_checkpoint_dir(self, d: str) -> "SCCBuilder":
        self._checkpoint_dir = d
        return self

    def _pregel(self, g: GraphFrame, tag: str):
        b = g.pregel()
        if self._checkpoint_dir:
            b = b.set_checkpoint_dir(f"{self._checkpoint_dir}/{tag}")
        return b

    def run(self) -> DataFrame:
        """Returns DataFrame[id, component] — component = the minimum member
        id of each SCC (deterministic labels, same convention as WCC)."""
        spark = self.graph.vertices.sparkSession
        verts = self.graph.vertices.select(ID)
        edges = self.graph.edges.select(SRC, DST).filter(
            F.col(SRC) != F.col(DST)
        ).distinct()
        done_parts = []

        for rnd in range(self.max_outer):
            self.rounds_ = rnd
            if verts.isEmpty():
                break
            sub = GraphFrame(verts, edges)

            # phase 1 — color: forward min-label fixpoint
            new_col = F.least(
                F.col("col"), F.coalesce(Pregel.msg(), F.col("col"))
            )
            colb = (
                self._pregel(sub, f"r{rnd}_fwd")
                .add_vertex_column("col", F.col(ID), new_col)
                .add_message(Pregel.src("col"), MessageDirection.SRC_TO_DST)
                .add_aggregate_expr(F.min(Pregel.msg()))
                .with_vertex_voting("active", new_col < F.col("col"))
                .skip_dest_state()
            )
            colored = colb.run().select(ID, "col")

            # phase 2 — confirm: backward reach from each color root within
            # its class. Messages flow DST_TO_SRC; a vertex only believes a
            # message if the sender shares its color, which the sender
            # enforces by sending its color only once reached.
            reached0 = F.col(ID) == F.col("col")
            got = Pregel.msg().isNotNull() & (Pregel.msg() == F.col("col"))
            new_reached = F.col("reached") | F.coalesce(got, F.lit(False))
            cg = GraphFrame(colored, edges)
            reachb = (
                self._pregel(cg, f"r{rnd}_bwd")
                .add_vertex_column("col", F.col("col"), F.col("col"))
                .add_vertex_column("reached", reached0, new_reached)
                .add_message(
                    F.when(Pregel.dst("reached"), Pregel.dst("col")),
                    MessageDirection.DST_TO_SRC,
                )
                .add_aggregate_expr(
                    F.max(Pregel.msg())
                )
                .with_vertex_voting(
                    "active", new_reached & ~F.col("reached")
                )
            )
            confirmed = (
                reachb.run()
                .filter(F.col("reached"))
                .select(ID, F.col("col").alias(COMPONENT))
            )
            # materialize this round's extraction so the shrinking working
            # set doesn't re-run prior rounds' Pregel lineages
            confirmed = confirmed.localCheckpoint(eager=True)
            done_parts.append(confirmed)
            extracted = confirmed.select(ID)
            verts = verts.join(extracted, ID, "left_anti").localCheckpoint(
                eager=True
            )
            edges = (
                edges.join(
                    verts.select(F.col(ID).alias(SRC)), SRC, "left_semi"
                )
                .join(verts.select(F.col(ID).alias(DST)), DST, "left_semi")
                .localCheckpoint(eager=True)
            )

        if not done_parts:
            return self.graph.vertices.select(
                ID, F.col(ID).alias(COMPONENT)
            ).limit(0)
        out = done_parts[0]
        for p in done_parts[1:]:
            out = out.unionByName(p)
        return out
