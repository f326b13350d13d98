"""Katz centrality via truncated-series iteration.

Extension beyond the reference's centrality surface (PageRank only —
`/root/reference/src/algorithm/centrality/`, which ships `pagerank.rs`
and leaves the rest of the centrality family unimplemented): Katz scores
x(v) = Σ_t α^t · (#walks of length t ending at v), computed by the
standard fixed-point recurrence

    x_{t+1}(v) = β + α · Σ_{u→v} x_t(u),     x_0(v) = β.

Unlike eigenvector centrality it never degenerates on DAGs (the β floor
keeps every vertex strictly positive), and unlike PageRank it does not
split a vertex's mass across its out-edges — a hub transmits its full
score along every out-edge. α must stay below 1/λ_max for the series to
converge; the builder exposes it (default 0.05, safe for the bounded-
degree test graphs) and runs a FIXED number of rounds so the result is
exactly the truncated Katz series — deterministic and SQL-unrollable for
the oracle gate.

Spark shape per round: ONE message join (edges ⋈ scores on src) + ONE
combine-enabled ``groupBy(dst).sum`` + a left join back onto the vertex
set (absent aggregate ⇒ β). All joins are keyed on vertex ids so a
1000-executor cluster shuffles each round on the same key; each round is
parquet-checkpointed to keep lineage flat, and hub skew in the message
aggregation is map-side-combined before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC


class KatzBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.iters = 5
        self._alpha = 0.05
        self._beta = 1.0
        self._checkpoint_dir = None

    def max_iterations(self, n: int) -> "KatzBuilder":
        self.iters = n
        return self

    def alpha(self, a: float) -> "KatzBuilder":
        self._alpha = a
        return self

    def beta(self, b: float) -> "KatzBuilder":
        self._beta = b
        return self

    def set_checkpoint_dir(self, d: str) -> "KatzBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, katz] — the truncated Katz series after
        exactly ``max_iterations`` rounds, rounded to 6 places."""
        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        spark = self.graph.vertices.sparkSession
        ckpt = ParquetCheckpointer(spark, self._checkpoint_dir)
        edges = self.graph.edges.select(SRC, DST)
        n = self.graph.vertices.select(ID)
        alpha, beta = float(self._alpha), float(self._beta)

        x = ckpt.push(n.select(ID, F.lit(beta).alias("x")), "katz_0")
        for it in range(1, self.iters + 1):
            msgs = (
                edges.join(x.withColumnRenamed(ID, SRC), SRC)
                .groupBy(DST)
                .agg(F.sum("x").alias("mx"))
                .withColumnRenamed(DST, ID)
            )
            nxt = n.join(msgs, ID, "left").select(
                ID,
                (
                    F.lit(beta)
                    + F.lit(alpha) * F.coalesce("mx", F.lit(0.0))
                ).alias("x"),
            )
            x = ckpt.push(nxt, f"katz_{it}")
            ckpt.evict_all_but_latest()
        return x.select(ID, F.round("x", 6).alias("katz"))
