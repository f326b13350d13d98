"""Feature propagation — SGC-style neighborhood feature smoothing.

Not in the reference (its surface stops at scalar analytics); added
because k rounds of "average your neighbours' features" is the
preprocessing step behind simplified graph convolutions (SGC, Wu et al.
ICML'19; LightGCN) and the cheapest way to featurize vertices for
downstream models at 100 TB — one PageRank-profile shuffle per round,
no training loop.

Semantics per round, per feature j:

  x_j(v)  <-  (1 - alpha) * x_j(v)  +  alpha * mean_{u in N_in(v)} x_j(u)

(vertices with no in-neighbours keep their own features; ``alpha`` is
the smoothing weight). The whole feature vector rides ONE array<double>
column and one named message — same packing the ANF sketch uses, so
plan size stays O(d) expressions and the per-round aggregate (element
sums + count) combines map-side.

Exactness note for the oracle: sums of doubles are order-dependent in
any engine; the driver-gated entry therefore uses integer-valued
features (hash-derived), whose long-typed sums are exact — the only
floating-point steps (the mean division and the alpha blend) are then
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, ID
from graphframes_rs_spark.pregel import MessageDirection, Pregel


def feature_propagation(
    graph: GraphFrame,
    features: DataFrame,
    feature_col: str = "features",
    rounds: int = 2,
    alpha: float = 0.5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DataFrame[id, features: array<double>] after ``rounds`` smoothing
    rounds. ``features`` is [id, <feature_col>: array<numeric>]; vertices
    missing from it start at the zero vector. The array length must be
    uniform (standard dense feature matrices)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")

    feats = features.select(
        ID, F.col(feature_col).cast("array<double>").alias("__f")
    )
    head = feats.select(F.size("__f").alias("__d")).limit(1).collect()
    if not head or head[0]["__d"] == 0:
        raise ValueError("features frame is empty or has empty vectors")
    d = head[0]["__d"]

    base = graph.vertices.select(ID).join(feats, ID, "left")
    zero = F.array(*[F.lit(0.0)] * d)
    init_graph = GraphFrame(
        base.select(ID, F.coalesce(F.col("__f"), zero).alias("__init")),
        graph.edges,
    )

    # message: the source's feature vector to each destination; aggregate:
    # element-wise sums + the message count packed as one array of d+1
    # doubles (sum_0..sum_{d-1}, n) so ONE aggregate column carries both
    agg = F.array(
        *[F.sum(Pregel.msg("feat")[i]) for i in range(d)],
        F.count(Pregel.msg("feat")).cast("double"),
    )
    n_msgs = Pregel.msg("feat")[d]
    blended = F.when(
        Pregel.msg("feat").isNull() | (n_msgs == 0),
        F.col("features"),
    ).otherwise(
        F.zip_with(
            F.col("features"),
            F.slice(Pregel.msg("feat"), 1, d),
            lambda x, s: (1 - alpha) * x + alpha * (s / n_msgs),
        )
    )
    builder = (
        init_graph.pregel()
        .add_vertex_column("features", F.col("__init"), blended)
        .add_named_message(
            "feat", Pregel.src("features"), MessageDirection.SRC_TO_DST
        )
        .add_named_aggregate_expr("feat", agg)
        .max_iterations(rounds)
    )
    if checkpoint_dir:
        builder = builder.set_checkpoint_dir(checkpoint_dir)
    out = builder.run()
    return out.select(ID, "features")
