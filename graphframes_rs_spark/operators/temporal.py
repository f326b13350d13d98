"""Time-respecting (temporal) reachability — earliest-arrival times.

Temporal-graph extension beyond the reference's static connectivity
family (`/root/reference/src/algorithm/connectivity/`): edges carry a
timestamp, and a path is valid only if timestamps never decrease along
it (you cannot take an edge that departed before you arrived). The
earliest-arrival fixpoint

    arrival[v] = min over edges (u, v, t) with t >= arrival[u] of t

is the temporal analogue of BFS distance — contagion spread, supply-chain
propagation, information-flow audits.

Implemented as a Pregel client, exercising the engine's edge-attribute
conditional messaging: the per-edge message is ``edge.ts`` guarded by
``edge.ts >= src.arrival`` (NULL otherwise), min-aggregated; vertices
vote to halt when no message can shrink their arrival. Participation
starts at the sources, so untouched subgraphs never join or message
(same pruning contract as shortest_paths). Rounds are bounded by the
longest temporal path in hops.
"""

from __future__ import annotations

from functools import reduce as _reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pregel import MessageDirection, Pregel

LONG_MAX = 9223372036854775807  # unreachable sentinel


class TemporalReachabilityBuilder:
    def __init__(
        self,
        graph: GraphFrame,
        sources: Sequence[int],
        ts_col: str = "ts",
        start_time: int = 0,
    ):
        self.graph = graph
        self.sources = sorted(sources)
        self.ts_col = ts_col
        self.start_time = start_time
        self.max_iter = 64
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "TemporalReachabilityBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "TemporalReachabilityBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, arrival, reachable] — earliest arrival
        time per vertex (``start_time`` at the sources; LONG_MAX sentinel
        when unreachable) under nondecreasing-timestamp paths."""
        is_source = _reduce(
            lambda a, b: a | b,
            [F.col(ID) == F.lit(s) for s in self.sources],
        )
        init = F.when(is_source, F.lit(self.start_time).cast("long")).otherwise(
            F.lit(LONG_MAX)
        )
        msg = F.when(
            (Pregel.src("arrival") < F.lit(LONG_MAX))
            & (Pregel.edge("__ts") >= Pregel.src("arrival")),
            Pregel.edge("__ts"),
        )
        would_shrink = F.col("arrival") > Pregel.msg("m")
        update = F.when(Pregel.msg("m").isNull(), F.col("arrival")).otherwise(
            F.least(F.col("arrival"), Pregel.msg("m"))
        )

        prep = GraphFrame(
            self.graph.vertices.select(ID),
            self.graph.edges.select(
                "src", "dst", F.col(self.ts_col).cast("long").alias("__ts")
            ),
        )
        builder = (
            prep.pregel()
            .add_edge_column("__ts")
            .with_participation_column("participating", is_source, would_shrink)
            .with_vertex_voting("active", would_shrink)
            .max_iterations(self.max_iter)
            .skip_dest_state()
            .add_vertex_column("arrival", init, update)
            .add_named_message("m", msg, MessageDirection.SRC_TO_DST)
            .add_named_aggregate_expr("m", F.min(Pregel.msg("m")))
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run()
        self.iterations_ = builder.iterations_
        return out.select(
            ID, "arrival", (F.col("arrival") < F.lit(LONG_MAX)).alias("reachable")
        )
