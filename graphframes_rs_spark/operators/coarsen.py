"""Graph coarsening: contract a maximal matching into supervertices.

Extension beyond the reference's algorithm surface: the multilevel
primitive under partitioners (METIS-style V-cycles), multilevel layout,
and hierarchical community detection — each level halves-ish the vertex
count while preserving the cut structure. A matching (vertex-disjoint
by construction, from :mod:`graphframes_rs_spark.operators.matching`)
is the classic contraction set: merging matched pairs can never create
conflicts, so one level is ONE relabel join + ONE aggregate.

Semantics: matched pairs merge into a supervertex labeled min(id,
partner); unmatched vertices carry over as themselves. Edges relabel to
supervertex endpoints; parallel edges collapse, summing ``weight``
(absent weight column = weight 1 per edge); self-loops (intra-pair
edges) DROP — their weight leaves the edge set, which is exactly what a
cut-preserving coarsener wants (the pair is already merged; its internal
edge can't be cut).

Scale shape: two broadcast-or-shuffle joins keyed on vertex id + one
combine-enabled groupBy on the (src, dst) supervertex pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC


def coarsen_graph(
    graph: GraphFrame,
    matching: DataFrame,
    weight_col: str = None,
) -> GraphFrame:
    """Contract ``matching`` ([id, partner], symmetric — the output of
    ``GraphFrame.maximal_matching().run()``) into supervertices.

    Returns a GraphFrame whose vertices are ``[id, n_members]``
    (supervertex label = min member id; n_members in {1, 2}) and whose
    edges are ``[src, dst, weight]`` with parallel edges summed and
    intra-pair self-loops dropped."""
    label = matching.select(
        ID, F.least(F.col(ID), F.col("partner")).alias("__super")
    )
    v = graph.vertices.select(ID).join(label, ID, "left").select(
        ID, F.coalesce("__super", F.col(ID)).alias("__super")
    )
    supers = v.groupBy(F.col("__super").alias(ID)).agg(
        F.count(F.lit(1)).alias("n_members")
    )

    w = (
        F.col(weight_col)
        if weight_col is not None
        else F.lit(1.0)
    )
    e = graph.edges.select(SRC, DST, w.cast("double").alias("__w"))
    map_src = v.select(F.col(ID).alias(SRC), F.col("__super").alias("__s2"))
    map_dst = v.select(F.col(ID).alias(DST), F.col("__super").alias("__d2"))
    edges = (
        e.join(map_src, SRC)
        .join(map_dst, DST)
        .filter(F.col("__s2") != F.col("__d2"))
        .groupBy(
            F.col("__s2").alias(SRC), F.col("__d2").alias(DST)
        )
        .agg(F.sum("__w").alias("weight"))
    )
    return GraphFrame(supers, edges)
