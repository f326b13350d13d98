"""Multi-source unweighted shortest paths (BFS) as a Pregel client.

Mirrors reference src/algorithm/connectivity/shortest_paths.rs:87-184:
one ``dist_<landmark>: int`` column per landmark, init 0 on the landmark and
INT_MAX (2147483647, the documented unreachable sentinel) elsewhere;
message per landmark = src distance + 1 (capped); min-aggregated;
update = elementwise min; participation starts at the landmarks and a vertex
keeps participating exactly while some distance would still shrink.
``to_landmarks`` physically reverses the edges first.
"""

from __future__ import annotations

from functools import reduce
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC
from graphframes_rs_spark.pregel import MessageDirection, Pregel

INT_MAX = 2147483647  # unreachable sentinel (shortest_paths.rs:157)


class ShortestPathsBuilder:
    def __init__(self, graph: GraphFrame, landmarks: List[int]):
        self.graph = graph
        self.landmarks = sorted(landmarks)
        self.max_iter = INT_MAX
        self._to_landmarks = False
        self._checkpoint_dir = None
        self.iterations_ = 0

    def to_landmarks(self) -> "ShortestPathsBuilder":
        """Distances from each vertex TO the landmarks (reverse edges)."""
        self._to_landmarks = True
        return self

    def max_iterations(self, n: int) -> "ShortestPathsBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "ShortestPathsBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, dist_<lm1>, dist_<lm2>, ...]."""
        if self._to_landmarks:
            edges = self.graph.edges.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST)
            )
        else:
            edges = self.graph.edges.select(SRC, DST)
        prep = GraphFrame(self.graph.vertices.select(ID), edges)

        is_landmark = [F.col(ID) == F.lit(lm) for lm in self.landmarks]
        init_participating = reduce(lambda a, b: a | b, is_landmark)
        would_shrink = reduce(
            lambda a, b: a | b,
            [
                F.col(f"dist_{lm}") > Pregel.msg(str(lm))
                for lm in self.landmarks
            ],
        )

        builder = (
            prep.pregel()
            .with_participation_column("participating", init_participating, would_shrink)
            .with_vertex_voting("active", would_shrink)
            .max_iterations(self.max_iter)
            .skip_dest_state()
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)

        for lm in self.landmarks:
            dist = f"dist_{lm}"
            init = F.when(F.col(ID) == F.lit(lm), F.lit(0)).otherwise(F.lit(INT_MAX))
            # NULL msg (no message) keeps the current distance; otherwise min.
            update = F.when(Pregel.msg(str(lm)).isNull(), F.col(dist)).otherwise(
                F.least(F.col(dist), Pregel.msg(str(lm)))
            )
            msg = F.when(
                Pregel.src(dist) < F.lit(INT_MAX), Pregel.src(dist) + F.lit(1)
            ).otherwise(F.lit(INT_MAX))
            builder = (
                builder.add_vertex_column(dist, init, update)
                .add_named_message(str(lm), msg, MessageDirection.SRC_TO_DST)
                .add_named_aggregate_expr(str(lm), F.min(Pregel.msg(str(lm))))
            )

        out = builder.run()
        self.iterations_ = builder.iterations_
        return out
