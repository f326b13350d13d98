"""FastRP node embeddings (Chen et al., CIKM 2019) — iterated sparse
random projection over the adjacency structure.

The reference engine ships no embedding operator
(`/root/reference/src/algorithm/` has no embedding module); this is a
first-class extension: FastRP is the standard cheap graph-embedding
baseline (GDS ships it as such), and its per-hop step is exactly the
message-passing aggregation Spark already excels at — no training loop,
no parameters, one pass per hop.

Spark-first, oracle-parity design:

* The random projection matrix R is DERIVED, not materialized: R[v, d]
  = ±1 from the parity of the cross-engine ``hash60(v:d:seed)`` — any
  SQL engine replays it bit-for-bit, and a ±1 basis keeps every
  intermediate an exact INTEGER (no float drift, no normalization
  noise), so hop sums are reproducible under any aggregation order.
* State is kept EXPLODED as (id, dim, val) rows: each hop is then one
  edges⋈state join + one combine-enabled groupBy(src, dim) SUM —
  whole-stage-codegen'd long arithmetic, no arrays, no UDFs. Hop
  volume is |E|·dims; dims is a small constant (8-128), so this is a
  constant-factor widening of the one aggregation a hop fundamentally
  needs, partitioned on (src) like any message pass. (A packed
  array<float> form with BLAS batching drops the constant at very
  large dims; at that point normalization is wanted anyway and oracle
  exactness stops applying.)
* The returned embedding mixes hops by SUM (h1 + h2 + ...): the
  integer-exact analogue of FastRP's weighted hop mixing. Callers who
  want the classic degree-normalized float variant can divide by
  ``degree`` per hop downstream — kept out of the core so the operator
  stays exactly replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, SRC, symmetrize_edges
from graphframes_rs_spark.pipeline.text import hash60


def fastrp_embedding(
    edges: DataFrame,
    dims: int = 8,
    hops: int = 2,
    seed: int = 42,
) -> DataFrame:
    """[id, dim, emb] — exploded FastRP embedding of every vertex that
    touches an edge: emb(v, d) = Σ_hops h_t(v, d) with
    h_0 = R (±1 hash parity), h_t(v) = Σ_{(v,u) ∈ E_sym} h_{t-1}(u).
    Exact integers end to end; deterministic for any seed."""
    if dims < 1 or hops < 1:
        raise ValueError("dims and hops must be >= 1")
    sym = symmetrize_edges(edges.select(SRC, DST), deduplicate=True)
    verts = sym.select(F.col(SRC).alias("id")).distinct()
    dim_arr = F.array(*[F.lit(d) for d in range(dims)])
    sign = (
        F.when(
            F.pmod(
                hash60(
                    F.concat_ws(
                        ":",
                        F.col("id").cast("string"),
                        F.col("dim").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                F.lit(2),
            )
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )
    state = verts.select(
        "id", F.explode(dim_arr).alias("dim")
    ).select("id", F.col("dim").cast("long").alias("dim"), sign.alias("val"))
    acc = None
    for _ in range(hops):
        state = (
            sym.join(
                state.select(
                    F.col("id").alias("__n_id"), "dim", F.col("val").alias("__n_val")
                ),
                F.col(DST) == F.col("__n_id"),
            )
            .groupBy(F.col(SRC).alias("id"), "dim")
            .agg(F.sum("__n_val").alias("val"))
        )
        acc = state if acc is None else (
            acc.union(state)
            .groupBy("id", "dim")
            .agg(F.sum("val").alias("val"))
        )
    return acc.select("id", "dim", F.col("val").cast("long").alias("emb"))
