"""Eigenvector centrality via power iteration.

Extension beyond the reference's centrality surface (PageRank only —
`/root/reference/src/algorithm/centrality/`): the undamped spectral
centrality x ∝ A·x, the measure PageRank approximates with teleport.
Classic fixed-iteration power method: x starts uniform, each round every
vertex's score becomes the sum of its in-neighbours' scores, L1-normalized
to keep magnitudes bounded. Run it on a (strongly) connected or
symmetrized graph — on a DAG mass drains to zero, which the builder
surfaces as an explicit error rather than a silent all-zero result.

Spark shape per round: ONE message join (edges ⋈ scores on src) + ONE
combine-enabled ``groupBy(dst).sum`` + a left join back onto the vertex
set; the L1 total rides the same plan as a 1-row broadcast crossJoin
(the PageRank normalizer pattern — no extra action), and each round is
parquet-checkpointed for flat lineage. 100 TB: both joins are keyed on
vertex ids; AQE splits hub skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, GraphFrameError, ID, SRC


class EigenvectorBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.iters = 10
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "EigenvectorBuilder":
        self.iters = n
        return self

    def set_checkpoint_dir(self, d: str) -> "EigenvectorBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, eigenvector] — L1-normalized scores after
        exactly ``max_iterations`` power rounds, rounded to 6 places."""
        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        spark = self.graph.vertices.sparkSession
        ckpt = ParquetCheckpointer(spark, self._checkpoint_dir)
        edges = self.graph.edges.select(SRC, DST)
        n = self.graph.vertices.select(ID)

        x = ckpt.push(n.select(ID, F.lit(1.0).alias("x")), "eig_0")
        for it in range(1, self.iters + 1):
            msgs = (
                edges.join(x.withColumnRenamed(ID, SRC), SRC)
                .groupBy(DST)
                .agg(F.sum("x").alias("mx"))
                .withColumnRenamed(DST, ID)
            )
            raw = n.join(msgs, ID, "left").select(
                ID, F.coalesce("mx", F.lit(0.0)).alias("x")
            )
            total = raw.agg(F.sum("x").alias("t"))
            obs = Observation()
            nxt = (
                raw.crossJoin(F.broadcast(total))
                .select(
                    ID,
                    F.when(F.col("t") > 0, F.col("x") / F.col("t"))
                    .otherwise(F.lit(0.0))
                    .alias("x"),
                )
                .observe(obs, F.sum("x").alias("mass"))
            )
            x = ckpt.push(nxt, f"eig_{it}")
            self.iterations_ = it
            ckpt.evict_all_but_latest()
            if not (obs.get["mass"] or 0.0):
                raise GraphFrameError(
                    "eigenvector centrality drained to zero mass at "
                    f"iteration {it}: the graph has no recurrent structure "
                    "(e.g. a DAG). Symmetrize the graph or use page_rank()."
                )
        return x.select(ID, F.round("x", 6).alias("eigenvector"))
