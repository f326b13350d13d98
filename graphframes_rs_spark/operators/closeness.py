"""Landmark-sampled closeness and harmonic centrality.

Extension beyond the reference's centrality surface (it ships PageRank
only — `/root/reference/src/algorithm/link_analysis/page_rank.rs`);
closeness/harmonic are the standard distance-based complements, and the
landmark-sampled estimator is how they are computed at scale (exact
all-pairs BFS is O(V·E)). Reuses the engine's multi-source BFS
(``ShortestPathsBuilder``, one ``dist_<lm>`` column per landmark, the
reference's INT_MAX unreachable sentinel) and reduces the distance
columns per vertex:

- ``harmonic``   = Σ_{landmarks L, 0 < d(v,L) < ∞} 1/d(v,L)
  (Marchiori–Latora; defined even on disconnected graphs)
- ``closeness``  = (#reachable) / Σ d(v,L)  over the same landmark set
  (Wasserman–Faust normalization restricted to reached landmarks;
  0 when no landmark is reachable)
- ``n_reachable`` = #{L : 0 < d(v,L) < ∞}

Distances are measured FROM each vertex TO the landmarks (the classical
definition — the BFS runs on reversed edges via ``to_landmarks()``);
pass a symmetrized graph for the undirected notion. The reduction is a
pure column expression over the BFS output — no extra shuffle beyond
the BFS itself.
"""

from __future__ import annotations

from functools import reduce as _reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.operators.shortest_paths import INT_MAX


class ClosenessBuilder:
    def __init__(self, graph: GraphFrame, landmarks: Sequence[int]):
        self.graph = graph
        self.landmarks = sorted(landmarks)
        self._checkpoint_dir = None
        self.iterations_ = 0

    def set_checkpoint_dir(self, d: str) -> "ClosenessBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, n_reachable, harmonic, closeness]."""
        sp = self.graph.shortest_paths(self.landmarks).to_landmarks()
        if self._checkpoint_dir:
            sp = sp.set_checkpoint_dir(self._checkpoint_dir)
        dists = sp.run()
        self.iterations_ = sp.iterations_

        def per_lm(lm):
            d = F.col(f"dist_{lm}")
            ok = (d > 0) & (d < INT_MAX)
            return (
                F.when(ok, F.lit(1)).otherwise(F.lit(0)),
                F.when(ok, F.lit(1.0) / d).otherwise(F.lit(0.0)),
                F.when(ok, d.cast("long")).otherwise(F.lit(0)),
            )

        terms = [per_lm(lm) for lm in self.landmarks]
        n_reach = _reduce(lambda a, b: a + b, (t[0] for t in terms))
        harmonic = _reduce(lambda a, b: a + b, (t[1] for t in terms))
        total_d = _reduce(lambda a, b: a + b, (t[2] for t in terms))
        return dists.select(
            ID,
            n_reach.cast("int").alias("n_reachable"),
            F.round(harmonic, 6).alias("harmonic"),
            F.round(
                F.when(
                    total_d > 0, n_reach.cast("double") / total_d
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("closeness"),
        )
