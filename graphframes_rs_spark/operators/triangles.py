"""Per-vertex triangle counting.

Not present in the reference (its community/subgraph category is an empty
placeholder, src/algorithm/community.rs) — added as a first-class operator
of the complete engine, in the classic GraphFrames API shape.

Algorithm (the standard wedge-closing formulation, expressed as pure
DataFrame ops so Catalyst plans it):

  1. canonicalize: undirected simple edges oriented ``src < dst``;
  2. wedges: e1(a,b) ⋈ e2(b,c) on b, giving ordered wedges a<b<c;
  3. close: wedge ⋈ e3(a,c) — each triangle matched exactly once;
  4. credit each corner once (explode) and count per vertex.

Scale notes: the wedge join is the dominant cost, Σ deg(v)² rows keyed on
the wedge middle — high-degree middles skew; AQE skew-join splits them.
Orienting edges low→high id bounds wedge middles by their *lower-half*
degree (the classic mitigation). Output per vertex: triangles it belongs to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC, symmetrize_edges


def enumerate_triangles(canon: DataFrame) -> DataFrame:
    """DataFrame[a, b, c] with a < b < c — each triangle of a CANONICAL
    (``src < dst``, deduped, loop-free) undirected edge set exactly once,
    via the oriented wedge-close joins described in the module docstring.
    Shared by :func:`triangle_count` and the k-truss peeling loop."""
    e1 = canon.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    e2 = canon.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    e3 = canon.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"])


def triangle_count(graph: GraphFrame) -> DataFrame:
    """DataFrame[id, triangles] — number of triangles through each vertex
    (vertices in no triangle report 0)."""
    canon = (
        symmetrize_edges(graph.edges.select(SRC, DST), deduplicate=True)
        .filter(F.col(SRC) < F.col(DST))
    )
    triangles = enumerate_triangles(canon)  # one row per triangle (a<b<c)
    corners = triangles.select(
        F.explode(F.array("a", "b", "c")).alias(ID)
    )
    counts = corners.groupBy(ID).agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices.select(ID)
        .join(counts, ID, "left")
        .select(ID, F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
    )


def clustering_coefficient(graph: GraphFrame) -> DataFrame:
    """DataFrame[id, degree, triangles, coefficient] — local clustering
    coefficient per vertex on the undirected simple graph:
    ``2·T(v) / (deg(v)·(deg(v)−1))``, 0.0 when deg(v) < 2.

    Degree and triangle count both come from ONE canonicalized edge set
    (symmetrize − self-loops, distinct), so the ratio is internally
    consistent; the triangle side reuses :func:`triangle_count`'s
    wedge-closing joins. Rounded to 6 decimals for cross-engine stability.

    Scale notes: two aggregations over the canonical edges (degree count,
    wedge join) — both key on vertex ids, both combine map-side; the wedge
    join dominates exactly as in :func:`triangle_count`."""
    undirected = symmetrize_edges(graph.edges.select(SRC, DST), deduplicate=True)
    deg = (
        undirected.groupBy(F.col(SRC).alias(ID))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(graph)
    return (
        tri.join(deg, ID, "left")
        .select(
            ID,
            F.coalesce(F.col("degree"), F.lit(0)).alias("degree"),
            "triangles",
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.col("triangles")
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coefficient"),
        )
    )
