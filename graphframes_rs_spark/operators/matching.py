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

Round shape (r13 revision): winners explode straight into symmetric
(id, partner) rows in the SAME plan (one `explode(array(struct..))` —
the winner frame is consumed exactly once, so it no longer needs its
own checkpoint), and the collision repair runs as two count-windows
over the pairs instead of a groupBy + two anti-joins (for a symmetric
pair set, "partner appears >1 time as partner" == "partner is a
conflicted id", so filtering both window counts == 1 drops exactly the
rows the anti-join form dropped). Two checkpoint pushes per round
(pairs + pruned edges) instead of three; measured 14.0s -> 12.0s warm
on the 6M-edge bench tier.

Maximality: the loop only stops when no edges remain, and an edge only
disappears when an endpoint matched — so no edge can survive with both
endpoints unmatched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
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
    is too: both window filters retract both directions of a bad edge.

    Single-plan form (r13): two count-windows instead of a conflicted-set
    groupBy + two anti-joins. Because ``pairs`` is symmetric, a vertex's
    row count as ``id`` equals its count as ``partner``, so requiring
    both counts == 1 drops exactly the rows whose id OR partner is
    conflicted — same output, but the input is consumed once (no
    checkpoint needed upstream) and the repair stays inside one plan."""
    return (
        pairs.withColumn(
            "__ci", F.count(F.lit(1)).over(Window.partitionBy(ID))
        )
        .withColumn(
            "__cp", F.count(F.lit(1)).over(Window.partitionBy("partner"))
        )
        .filter((F.col("__ci") == 1) & (F.col("__cp") == 1))
        .drop("__ci", "__cp")
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
            # winners explode straight into BOTH symmetric directions in
            # the same plan — the winner subtree is consumed exactly once,
            # so it needs no checkpoint of its own (the old union-of-two-
            # selects consumed it twice and the anti-join repair three
            # more times, forcing a separate winner materialization;
            # fusing everything into one plan + the window repair cut the
            # round from three checkpoint pushes to two, 14.0s -> 12.0s
            # warm on the 6M-edge tier)
            pairs = won.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col(SRC).alias(ID), F.col(DST).alias("partner")
                        ),
                        F.struct(
                            F.col(DST).alias(ID), F.col(SRC).alias("partner")
                        ),
                    )
                ).alias("pr")
            ).select("pr.*")
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
