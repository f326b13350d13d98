"""Maximal matching via local-min-edge handshake rounds.

Extension beyond the reference's algorithm surface (its MIS,
`/root/reference/src/algorithm/mis.rs`, is the vertex-side dual; the
edge-side primitive is absent): a maximal set of vertex-disjoint edges —
the building block for 2-approximate vertex cover (both endpoints of
every matched edge), graph coarsening levels, and load-balanced
pairwise work assignment.

Algorithm (Israeli-Itai-style, derandomized per round by a seeded hash):
every round each edge draws a deterministic key ``xxhash64(seed, u, v)``
(canonical endpoint order, so both endpoints see the SAME key). An edge
joins the matching iff its key is the minimum among ALL edges incident
to BOTH endpoints — local-minimum edges of a random order are
vertex-disjoint (two adjacent edges share an endpoint, where only one
can be that endpoint's minimum) UNLESS two adjacent edges collide on
the 64-bit key. Collisions are repaired, not prevented: preventing them
needs a (key, u, v) total order whose ``min(struct)`` aggregate Spark
plans as a SortAggregate — a full sort of the 2|E| endpoint rows every
round — while the plain long min stays a codegen'd partial-aggregating
HashAggregate. Instead, the winner set (≤ |V|/2 rows) is checked for
vertices holding two partners and every pair touching such a vertex is
dropped back into the pool for the next round — deterministic, exact,
and the check costs one count aggregate plus two anti-joins over the
small winner frame (empty in practice: adjacent-edge 64-bit collisions
are ~2^-64 per pair). Matched vertices leave; a constant expected
fraction of edges drops per round, so the loop drains in O(log E)
rounds w.h.p. — each round is ONE combine-enabled per-endpoint min
aggregate + one join back to edges + one semi-join prune, all keyed on
vertex ids.

Checkpoint discipline: only the round's NEW pairs are materialized
(write volume Σ|new pairs| = |matching|, not O(rounds x |matched|)), and
the superseded edge frame is evicted as soon as its successor lands —
disk high-water mark is one edge frame + the matching itself. Edge
pruning anti-joins against just the new pairs: earlier rounds' matched
vertices already have no surviving edges.

Maximality: the loop only stops when no edges remain, and an edge only
disappears when an endpoint matched — so no edge can survive with both
endpoints unmatched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import (
    DST,
    GraphFrame,
    ID,
    SRC,
    symmetrize_edges,
)


def _repair_collisions(pairs: DataFrame) -> DataFrame:
    """Drop every (id, partner) row touching a vertex that holds two
    partners — the 64-bit key-collision repair (see module docstring).
    ``pairs`` is symmetric (both directions per matched edge); the result
    is too: both anti-joins retract both directions of a bad edge."""
    conflicted = (
        pairs.groupBy(ID)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select(ID)
    )
    return pairs.join(conflicted, ID, "left_anti").join(
        conflicted.withColumnRenamed(ID, "partner"), "partner", "left_anti"
    )


class MatchingBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.random_seed = 42
        self.max_iter = 10_000  # safety cap; expected rounds O(log E)
        self._checkpoint_dir = None
        self.iterations_ = 0

    def with_random_seed(self, seed: int) -> "MatchingBuilder":
        self.random_seed = seed
        return self

    def max_iterations(self, n: int) -> "MatchingBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "MatchingBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, partner] — one row per MATCHED vertex
        (two rows per matched edge, symmetric); unmatched vertices are
        absent."""
        from functools import reduce

        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        spark = self.graph.vertices.sparkSession
        # separate stores: edge frames are superseded every round and
        # evicted eagerly; pair frames accumulate (they ARE the result)
        base = self._checkpoint_dir.rstrip("/") if self._checkpoint_dir else None
        ckpt_e = ParquetCheckpointer(
            spark, None if base is None else base + "/edges"
        )
        ckpt_p = ParquetCheckpointer(
            spark, None if base is None else base + "/pairs"
        )

        # one canonical row per unordered pair, no self-loops
        obs = Observation()
        edges = ckpt_e.push(
            symmetrize_edges(self.graph.edges.select(SRC, DST), deduplicate=True)
            .filter(F.col(SRC) < F.col(DST))
            .observe(obs, F.count(F.lit(1)).alias("n")),
            "match_e0",
        )
        n_edges = obs.get["n"]

        rounds = []
        rnd = 0
        while n_edges > 0:
            if rnd >= self.max_iter:
                from graphframes_rs_spark.graphframe import GraphFrameError

                raise GraphFrameError(
                    f"matching did not drain in {self.max_iter} rounds"
                )
            # plain long key: the per-endpoint min stays a codegen'd
            # HashAggregate (a (k, src, dst) struct would force a
            # SortAggregate over 2|E| rows — see module docstring)
            keyed = edges.select(
                SRC, DST,
                F.xxhash64(
                    F.lit(self.random_seed + rnd), F.col(SRC), F.col(DST)
                ).alias("k"),
            )
            # per-endpoint minimum key: one explode-free union + min agg
            vmin = (
                keyed.select(F.col(SRC).alias(ID), "k")
                .unionByName(keyed.select(F.col(DST).alias(ID), "k"))
                .groupBy(ID)
                .agg(F.min("k").alias("mk"))
            )
            # an edge's key can be a vertex's min ONLY if that vertex is
            # one of its endpoints, so "min at both endpoints" is exactly
            # "this key is the min of >= 2 vertices" (equal modulo 64-bit
            # key collisions, which the winner-set repair below already
            # handles). That turns the old keyed-x-vmin-x-vmin double
            # shuffle join into one |V|-row aggregate plus a semi-join
            # against the small winner-key set (AQE broadcasts it), saving
            # two edge-sized exchanges per round — measured 21-22s -> ~17s
            # on the 6M-edge bench tier
            winner_keys = (
                vmin.groupBy("mk")
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") >= 2)
                .select(F.col("mk").alias("k"))
            )
            won = keyed.join(winner_keys, "k", "left_semi").select(SRC, DST)
            # materialize the SMALL winner set once: downstream it is
            # consumed six-fold (pairs = both directions, and the repair
            # reads pairs three times), and without a checkpoint each
            # consumer re-runs the whole 2|E|-row endpoint aggregate +
            # semi-join chain — measured round-0 cost 10.4s -> ~4s on the
            # 6M-edge tier. Pushed to the edge store so the post-round
            # eviction reclaims it (it is dead once pairs materialize).
            won = ckpt_e.push(won, f"match_w{rnd}")
            pairs = won.select(F.col(SRC).alias(ID), F.col(DST).alias("partner")).unionByName(
                won.select(F.col(DST).alias(ID), F.col(SRC).alias("partner"))
            )
            # collision repair on the SMALL winner set: a vertex with two
            # partners means two adjacent edges drew the same 64-bit key —
            # drop every pair touching it; its edges retry next round
            pairs = _repair_collisions(pairs)
            # materialize ONLY this round's new pairs
            pairs = ckpt_p.push(pairs, f"match_p{rnd}")
            rounds.append(pairs)

            # edges already exclude earlier rounds' matched vertices, so
            # pruning only needs the vertices matched THIS round
            gone = pairs.select(ID)
            obs = Observation()
            edges = ckpt_e.push(
                edges.join(gone.withColumnRenamed(ID, SRC), SRC, "left_anti")
                .join(gone.withColumnRenamed(ID, DST), DST, "left_anti")
                .observe(obs, F.count(F.lit(1)).alias("n")),
                f"match_e{rnd + 1}",
            )
            ckpt_e.evict_all_but_latest(1)
            n_edges = obs.get["n"]
            rnd += 1
            self.iterations_ = rnd
        if not rounds:
            return self.graph.vertices.select(ID).limit(0).select(
                ID, F.col(ID).alias("partner")
            )
        return reduce(
            lambda a, b: a.unionByName(b), rounds
        ).select(ID, "partner")


def vertex_cover_2approx(graph: GraphFrame, seed: int = 42, checkpoint_dir=None) -> DataFrame:
    """[id] — both endpoints of a maximal matching: the textbook
    2-approximate vertex cover (every edge touches a matched vertex by
    maximality; any cover needs >= one endpoint per matched edge)."""
    b = MatchingBuilder(graph).with_random_seed(seed)
    if checkpoint_dir is not None:
        b = b.set_checkpoint_dir(checkpoint_dir)
    return b.run().select(ID)
