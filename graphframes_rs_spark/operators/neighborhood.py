"""Approximate neighborhood function — Flajolet–Martin sketches on Pregel.

Not in the reference (its surface stops at exact algorithms); added
because per-vertex neighborhood sizes / effective-diameter estimates are
the standard scale substitute for all-pairs BFS (Palmer, Gibbons &
Faloutsos, "ANF: A Fast and Scalable Tool for Data Mining in Massive
Graphs", KDD'02; Boldi, Rosa & Vigna, "HyperANF", WWW'11 — the HLL
variant; FM registers are used here because they merge with a plain
``bit_or`` and stay EXACTLY reproducible cross-engine).

State: ``k`` FM registers per vertex, each one 60-bit long. Register
``r`` starts as the one-hot mask ``h & -h`` (lowest set bit of
``hash60(id|r|seed)`` — geometric position with P(bit i) = 2^-(i+1),
exactly the FM position draw, no ctz needed). One superstep per radius:

  mask_r(v)  <-  mask_r(v)  |  bit_or over out-neighbours w of mask_r(w)

so after ``t`` rounds register ``r`` of ``v`` is the OR of the initial
registers over the full ≤t-hop OUT-reachability set of ``v`` — OR-merge
is associative, commutative, and idempotent, which is why partial
(map-side) aggregation is safe and why re-delivered masks can never
corrupt the sketch. Convergence: a vertex votes to halt when none of
its registers changed; all-halt means every reachability set is closed,
so the loop can stop before ``radius`` with *exact* closure.

Estimate (classic FM): per register, ``R`` = index of the lowest ZERO
bit = ``bit_count(m XOR (m+1)) - 1`` (pure integer — the XOR isolates
the trailing-ones run plus the terminating zero); the count estimate is
``2^mean(R) / 0.77351``. Everything up to the final division is integer
arithmetic, so the DuckDB oracle reproduces results bit-for-bit.

At 100 TB: per-superstep cost is one shuffle of k longs per edge with
map-side ``bit_or`` combine — the same profile as one PageRank round —
vs. exact all-pairs reachability which is infeasible. k=8 gives ~1/sqrt(8)
≈ 35% std error on counts (standard FM; average more registers to
tighten)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pipeline.text import hash60
from graphframes_rs_spark.pregel import MessageDirection, Pregel

FM_PHI = 0.77351  # Flajolet–Martin bias correction constant


def _reg(i: int) -> str:
    return f"reg_{i}"


class NeighborhoodFunctionBuilder:
    """``graph.neighborhood_function()`` — per-vertex approximate
    ≤radius-hop OUT-neighborhood size (the vertex itself counts)."""

    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.radius = 3
        self.num_registers = 8
        self.seed = 42
        self._checkpoint_dir = None
        self._history = False
        self.iterations_ = 0

    def max_radius(self, r: int) -> "NeighborhoodFunctionBuilder":
        if r < 1:
            raise ValueError("radius must be >= 1")
        self.radius = r
        return self

    def with_registers(self, k: int) -> "NeighborhoodFunctionBuilder":
        if k < 1 or k > 64:
            raise ValueError("num_registers must be in [1, 64]")
        self.num_registers = k
        return self

    def with_seed(self, seed: int) -> "NeighborhoodFunctionBuilder":
        self.seed = seed
        return self

    def set_checkpoint_dir(self, d: str) -> "NeighborhoodFunctionBuilder":
        self._checkpoint_dir = d
        return self

    def with_history(self, flag: bool = True) -> "NeighborhoodFunctionBuilder":
        """Also return ``nf_hist: array<double>`` — the per-radius estimate
        trail N(v, 0..t). The history column rides the same superstep (one
        extra array append per round, no extra jobs); it is what
        :func:`effective_diameter` consumes."""
        self._history = flag
        return self

    def run(self) -> DataFrame:
        """DataFrame[id, nf_est: double, reg_0..reg_{k-1}: long
        (, nf_hist: array<double> with ``with_history()``)].
        ``nf_est`` estimates |{w : dist(id -> w) <= radius}| (counting
        ``id``); the registers are the raw merged FM sketches —
        deterministic given the seed, so downstream unions of sketches
        (e.g. per-community neighborhood sizes) can keep OR-merging
        them."""
        k, seed = self.num_registers, self.seed
        # ALL k registers ride one array<long> column / one named message:
        # the aggregate is k element-wise bit_or's repacked into an array
        # (each bit_or combines map-side), so plan size stays O(k)
        # expressions — k separate messages made Catalyst canonicalization
        # blow up superlinearly at k >= 32.
        inits = []
        for i in range(k):
            h = hash60(F.concat_ws("|", F.col(ID), F.lit(i), F.lit(seed)))
            inits.append(h.bitwiseAND(-h))
        merged = F.zip_with(
            F.col("regs"),
            F.coalesce(
                Pregel.msg("regs"),
                F.array(*[F.lit(0).cast("long")] * k),
            ),
            lambda x, y: x.bitwiseOR(y),
        )
        def est_of(regs_expr):
            mean_r = sum(
                (
                    F.bit_count(
                        regs_expr[i].bitwiseXOR(regs_expr[i] + 1)
                    )
                    - 1
                )
                for i in range(k)
            ) / F.lit(float(k))
            return F.pow(F.lit(2.0), mean_r) / F.lit(FM_PHI)

        builder = (
            self.graph.pregel()
            .add_vertex_column("regs", F.array(*inits), merged)
            .add_named_message(
                "regs", Pregel.dst("regs"), MessageDirection.DST_TO_SRC
            )
            .add_named_aggregate_expr(
                "regs",
                F.array(
                    *[F.bit_or(Pregel.msg("regs")[i]) for i in range(k)]
                ),
            )
            .max_iterations(self.radius)
            .with_vertex_voting("active", merged != F.col("regs"))
        )
        if self._history:
            builder = builder.add_vertex_column(
                "nf_hist",
                F.array(est_of(F.array(*inits))),
                F.concat(F.col("nf_hist"), F.array(est_of(merged))),
            )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run()
        self.iterations_ = builder.iterations_

        # R_i = lowest-zero-bit index of register i (pure integer);
        # estimate = 2^mean(R) / phi
        reg = lambda i: F.col("regs")[i]  # noqa: E731
        mean_r = sum(
            (F.bit_count(reg(i).bitwiseXOR(reg(i) + 1)) - 1) for i in range(k)
        ) / F.lit(float(k))
        extra = [F.col("nf_hist")] if self._history else []
        return out.select(
            ID,
            (F.pow(F.lit(2.0), mean_r) / F.lit(FM_PHI)).alias("nf_est"),
            *[reg(i).alias(_reg(i)) for i in range(k)],
            *extra,
        )


def effective_diameter(
    graph: GraphFrame,
    ratio: float = 0.9,
    max_radius: int = 16,
    num_registers: int = 8,
    seed: int = 42,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """One row [effective_diameter: int, n_pairs_est: double,
    total_pairs_est: double] — the smallest radius t at which the
    estimated number of reachable (ordered) pairs Σ_v N(v, t) covers
    ``ratio`` of the fixpoint total (the ANF/HyperANF definition of
    effective diameter). One ANF run with history; the per-radius global
    sums are one explode + groupBy over the trail — no extra graph
    iteration, no all-pairs anything.

    The early-stop voting means the trail ends exactly at closure, so the
    last entry IS the fixpoint total even when ``max_radius`` overshoots
    the true diameter."""
    if not 0 < ratio <= 1:
        raise ValueError("ratio must be in (0, 1]")
    b = (
        NeighborhoodFunctionBuilder(graph)
        .max_radius(max_radius)
        .with_registers(num_registers)
        .with_seed(seed)
        .with_history()
    )
    if checkpoint_dir:
        b = b.set_checkpoint_dir(checkpoint_dir)
    hist = b.run().select("nf_hist")
    sums = (
        hist.select(F.posexplode("nf_hist").alias("t", "est"))
        .groupBy("t")
        .agg(F.sum("est").alias("n_pairs_est"))
    )
    total = sums.orderBy(F.desc("t")).limit(1).select(
        F.col("n_pairs_est").alias("total_pairs_est")
    )
    return (
        sums.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_pairs_est") >= F.lit(float(ratio)) * F.col("total_pairs_est")
        )
        .orderBy("t")
        .limit(1)
        .select(
            F.col("t").alias("effective_diameter"),
            F.round("n_pairs_est", 6).alias("n_pairs_est"),
            F.round("total_pairs_est", 6).alias("total_pairs_est"),
        )
    )
