"""Weakly connected components via randomized contraction.

Same algorithm family as the reference (Bögeholz et al., ICDE 2020;
reference src/algorithm/connectivity/connected_components.rs:47-396) —
repeat until no edges remain:

  1. draw a fresh random hash h_i over vertex ids;
  2. rep(v) = the vertex u in {v} ∪ out-neighbours(v) minimizing h_i(u);
  3. relabel every edge (u, w) -> (rep(u), rep(w)), drop self-loops, dedup;

then map every original vertex to its final representative and (by default)
relabel each component to the minimum original member id.

Spark-first redesign (deliberate, documented for parity review): the
reference hashes ids INTO GF(2^64) space with an invertible affine hash
(``finite_axpb``) and un-winds the hashes afterwards by composing affine
inverses. Spark has a built-in 64-bit hash (``xxhash64``), so instead of
working in hash space we pick ``rep(v) = argmin_{u} xxhash64(u, seed_i)``
via ``min(struct(hash, id))`` — representatives stay *real vertex ids*, no
inverse map is needed, and the orig->current mapping is folded with one
hash-join per contraction round (O(log n) rounds w.h.p.). With
``use_labels_as_components=True`` (the default, as in the reference) the
output is bit-identical to the reference's regardless of hash family.
``finite_axpb`` itself ships in ``functions/hashes.py`` for parity.

Scale notes: each round shrinks the edge set geometrically; the heavy ops
are two relabel joins + a distinct, all keyed on vertex ids (AQE handles
skew from giant components). Edges and the mapping are checkpointed per
round to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC, symmetrize_edges
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

COMPONENT = "component"


def _compute_reps(edges: DataFrame, seed: int) -> DataFrame:
    """[v, rep]: the min-hash vertex among {v} ∪ out-neighbours(v)
    (mirrors compute_cc_reps, connected_components.rs:47-68)."""
    h = lambda c: F.xxhash64(c, F.lit(seed))
    nbr = edges.groupBy(F.col(SRC).alias("v")).agg(
        F.min(F.struct(h(F.col(DST)).alias("h"), F.col(DST).alias("u"))).alias("nbr")
    )
    return nbr.select(
        "v",
        F.when(
            h(F.col("v")) < F.col("nbr.h"), F.col("v")
        ).otherwise(F.col("nbr.u")).alias("rep"),
    )


def _relabel_edges(edges: DataFrame, reps: DataFrame) -> DataFrame:
    """(u, w) -> (rep(u), rep(w)), self-loops dropped, deduplicated
    (mirrors relabel_edges, connected_components.rs:70-96)."""
    src_rel = (
        edges.join(reps, edges[SRC] == reps["v"], "inner")
        .select(F.col("rep").alias(SRC), F.col(DST))
    )
    return (
        src_rel.join(reps, src_rel[DST] == reps["v"], "inner")
        .filter(F.col(SRC) != F.col("rep"))
        .select(F.col(SRC), F.col("rep").alias(DST))
        .distinct()
    )


class ConnectedComponentsBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.use_labels_as_components = True
        self.random_seed = 42
        self._checkpoint_dir = None
        self.iterations_ = 0

    def with_use_labels_as_components(self, flag: bool) -> "ConnectedComponentsBuilder":
        self.use_labels_as_components = flag
        return self

    def with_random_seed(self, seed: int) -> "ConnectedComponentsBuilder":
        self.random_seed = seed
        return self

    def set_checkpoint_dir(self, d: str) -> "ConnectedComponentsBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, component]; isolated vertices are their own
        component. Component ids are minimum original member ids when
        ``use_labels_as_components`` (default), else representative ids."""
        spark = self.graph.vertices.sparkSession
        ckpt = ParquetCheckpointer(spark, self._checkpoint_dir)
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

        # Reps frames must outlive the forward loop (back-propagation reads
        # them newest-to-oldest), so they live in their own pinned pool.
        reps_ckpt = ParquetCheckpointer(spark, ckpt.directory + "/reps")

        # prepare: drop self-loops, symmetrize, dedup (cc.rs "prepare" step)
        edges = symmetrize_edges(
            self.graph.edges.select(SRC, DST), deduplicate=True
        )
        edges = ckpt.push_partitioned(edges, SRC, shuffle_n, "edges")

        # ---- forward contraction ----
        # Per round only the (geometrically shrinking) reps frame is stored;
        # the orig->component mapping is composed once afterwards — total
        # join work Σ|reps_i| ≈ 2|V| instead of rounds·|V| (the same reason
        # the reference back-propagates instead of folding forward,
        # connected_components.rs:107-171).
        reps_frames = []
        iteration = 0
        while not edges.isEmpty():
            seed = self.random_seed + iteration
            reps = reps_ckpt.push_partitioned(
                _compute_reps(edges, seed), "rep", shuffle_n, f"reps_{iteration}"
            )
            reps_frames.append(reps)
            new_edges = ckpt.push_partitioned(
                _relabel_edges(edges, reps), SRC, shuffle_n, "edges"
            )
            ckpt.evict_all_but_latest(1)
            edges = new_edges
            iteration += 1

        self.iterations_ = iteration

        # ---- back propagation: compose reps newest -> oldest ----
        final = None
        for reps in reversed(reps_frames):
            if final is None:
                final = reps
            else:
                nxt = final.select(
                    F.col("v").alias("__fr_v"), F.col("rep").alias("__fr_rep")
                )
                final = reps.join(
                    nxt, reps["rep"] == F.col("__fr_v"), "left"
                ).select(
                    "v",
                    F.coalesce(F.col("__fr_rep"), F.col("rep")).alias("rep"),
                )
        if final is not None:
            final = ckpt.push_partitioned(final, "v", shuffle_n, "final")
            reps_ckpt.purge()  # final is materialized; reps no longer needed

        # every vertex: its representative, or itself if never contracted
        if final is None:
            result = self.graph.vertices.select(ID, F.col(ID).alias(COMPONENT))
        else:
            result = (
                self.graph.vertices.select(ID)
                .join(final, F.col(ID) == final["v"], "left")
                .select(ID, F.coalesce(F.col("rep"), F.col(ID)).alias(COMPONENT))
            )
        if self.use_labels_as_components:
            # relabel each component to its minimum original member id
            # (cc.rs:359-383); makes output deterministic across hash families
            min_labels = result.groupBy(COMPONENT).agg(F.min(ID).alias("__cc_min"))
            result = (
                result.join(min_labels, COMPONENT)
                .select(ID, F.col("__cc_min").alias(COMPONENT))
            )
        return result
