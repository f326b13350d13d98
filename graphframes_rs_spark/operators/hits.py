"""HITS (hubs & authorities) — Kleinberg's link-analysis pair, as a
Pregel client.

Not in the reference (centrality stops at PageRank); added because hub
and authority scores are the other classic link-quality signal for web
corpora — e.g. ranking seed lists for crawl frontier curation.

Jacobi formulation, one superstep per iteration over ONE shared triplet
join: two named messages ride the same edge materialization —
``auth``: each source's hub score delivered to its destinations
(SRC_TO_DST), ``hub``: each destination's authority delivered back to
its sources (DST_TO_SRC) — so

  auth_{t+1}(v) = Σ_{u→v} hub_t(u),   hub_{t+1}(v) = Σ_{v→w} auth_t(w)

(simultaneous update from the PREVIOUS iterate, vs. the textbook's
auth-then-updated-hub sweep: both converge to the same principal
singular vectors; the fixed-point differs only in per-iteration
interleaving, and this shape needs ONE join per round instead of two).
Scores are normalized to sum 1 at the END rather than per round — a
global per-round normalizer would cost an action per superstep, and for
the fixed iteration budgets this builder targets the un-normalized
magnitudes stay far inside double range (≲ max_degree^iterations).
Vertices with no in-edges get authority 0; no out-edges, hub 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pregel import MessageDirection, Pregel


class HITSBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.max_iter = 5
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "HITSBuilder":
        """1 <= n <= 50. The upper bound is the overflow guard for the
        end-normalization design: un-normalized magnitudes grow like
        (principal singular value)^n, and even a pathological sigma of
        ~10^6 stays inside double range (10^300) for n = 50 — past that
        the totals could reach inf and normalize to 0/NaN silently.
        HITS direction typically converges in well under 30 rounds; for
        more, renormalize externally between calls."""
        if n < 1:
            raise ValueError("HITS needs at least one iteration")
        if n > 50:
            raise ValueError(
                "max_iterations > 50 can overflow the un-normalized "
                "iterates (scores normalize once at the END); chain "
                "shorter runs if you genuinely need more rounds"
            )
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "HITSBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, authority, hub], each column normalized
        to sum 1 (all-zero columns stay 0 — e.g. a graph with no edges)."""
        new_auth = F.coalesce(Pregel.msg("auth"), F.lit(0.0))
        new_hub = F.coalesce(Pregel.msg("hub"), F.lit(0.0))
        builder = (
            self.graph.pregel()
            .add_vertex_column("authority", F.lit(1.0), new_auth)
            .add_vertex_column("hub", F.lit(1.0), new_hub)
            .add_named_message(
                "auth", Pregel.src("hub"), MessageDirection.SRC_TO_DST
            )
            .add_named_message(
                "hub", Pregel.dst("authority"), MessageDirection.DST_TO_SRC
            )
            .add_named_aggregate_expr("auth", F.sum(Pregel.msg("auth")))
            .add_named_aggregate_expr("hub", F.sum(Pregel.msg("hub")))
            .max_iterations(self.max_iter)
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run()
        self.iterations_ = builder.iterations_

        totals = out.agg(
            F.sum("authority").alias("__a"), F.sum("hub").alias("__h")
        )
        def norm(col, tot):
            return F.when(
                F.col(tot) > 0, F.col(col) / F.col(tot)
            ).otherwise(F.lit(0.0))

        return out.crossJoin(F.broadcast(totals)).select(
            F.col(ID),
            norm("authority", "__a").alias("authority"),
            norm("hub", "__h").alias("hub"),
        )
