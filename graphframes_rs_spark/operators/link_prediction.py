"""Neighborhood-overlap link prediction: common-neighbors, Jaccard, and
Adamic-Adar scores for every 2-hop candidate pair.

Not in the reference or GraphFrames; the standard "which edges are
missing" primitives (Liben-Nowell & Kleinberg 2003) for recommendation
and knowledge-graph completion.

Undirected semantics (edges are symmetrized + deduped first). Candidate
pairs are exactly the vertex pairs with >= 1 common neighbor — found by
the same hub-bounded wedge join as ``triangle_count``: wedges anchor on
the MIDDLE vertex, so per-middle work is deg(v)², with an explicit
``max_degree`` dial to drop super-hub middles (a vertex of degree 10^6
would otherwise contribute 10^12 candidate pairs; dropping it costs
score mass only for pairs whose ONLY witness is that hub — exactly the
pairs Adamic-Adar down-weights hardest, since 1/log(deg) vanishes).
Already-connected pairs are excluded via a left-anti join (they're
edges, not predictions).

Adamic-Adar sums 1/ln(deg(v)) over common neighbors v; degree-1
middles cannot exist (a wedge middle has >= 2 edges), so ln(deg) >= ln 2
and the sum is always finite.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC, symmetrize_edges


def link_prediction(
    graph: GraphFrame,
    max_degree: Optional[int] = 10_000,
    min_common: int = 1,
) -> DataFrame:
    """[a, b, common, jaccard, adamic_adar] for candidate pairs a < b
    with >= ``min_common`` common neighbors and no existing edge.
    ``max_degree`` drops wedge middles above the bound (None = exact)."""
    und = symmetrize_edges(graph.edges.select(SRC, DST), deduplicate=True)
    deg = und.groupBy(F.col(SRC).alias(ID)).agg(
        F.count(F.lit(1)).alias("deg")
    )

    mids = deg if max_degree is None else deg.filter(
        F.col("deg") <= max_degree
    )
    # attach the middle's degree (and apply the hub cap) BEFORE the
    # quadratic self-join — joining the cap in afterwards would still
    # stream deg(hub)^2 wedge rows for every super-hub first
    mid_edges = und.join(
        mids.select(F.col(ID).alias(SRC), "deg"), SRC
    )
    # wedge a - v - b, anchored on the middle v; a < b halves the pairs
    w1 = mid_edges.select(
        F.col(SRC).alias("v"), F.col(DST).alias("a"), "deg"
    )
    w2 = mid_edges.select(F.col(SRC).alias("v"), F.col(DST).alias("b"))
    wedges = w1.join(w2, "v").filter(F.col("a") < F.col("b"))
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common"),
        F.round(F.sum(F.lit(1.0) / F.log(F.col("deg"))), 6).alias(
            "adamic_adar"
        ),
    ).filter(F.col("common") >= min_common)

    # drop pairs that are already edges (canonical orientation matches)
    existing = und.filter(F.col(SRC) < F.col(DST)).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    scored = scored.join(existing, ["a", "b"], "left_anti")

    da = deg.select(F.col(ID).alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col(ID).alias("b"), F.col("deg").alias("__db"))
    return (
        scored.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("__da") + F.col("__db") - F.col("common")),
                6,
            ).alias("jaccard"),
            "adamic_adar",
        )
    )


def bipartite_projection(
    edges: DataFrame,
    side: str = "src",
    max_degree: int | None = 10_000,
    min_common: int = 1,
) -> DataFrame:
    """[a, b, n_common] (a < b) — one-mode projection of a bipartite
    graph: two ``side`` vertices are linked iff they share a neighbour on
    the other side, weighted by the shared-neighbour count. The standard
    graph-construction step for co-occurrence analytics (orders sharing
    suppliers, documents sharing entities, users sharing items).

    Scale design: the projection is a self-join of the edge list keyed on
    the OTHER side — each other-side vertex of degree d contributes
    d·(d−1)/2 pairs, so one celebrity hub can dominate the output
    quadratically. ``max_degree`` (default ON, like the dedup family's
    stop-shingle caps) drops other-side hubs above the cap BEFORE the
    join: at web scale those hubs connect nearly everything to nearly
    everything and carry no co-occurrence signal, while the cap bounds
    per-key join work to max_degree². Pass ``None`` for the exact
    uncapped projection (the oracle does). ``min_common`` prunes weak
    links post-aggregation (combine-enabled count)."""
    if side not in ("src", "dst"):
        raise ValueError("side must be 'src' or 'dst'")
    other = "dst" if side == "src" else "src"
    e = edges.select(
        F.col(side).alias("v"), F.col(other).alias("o")
    ).distinct()
    if max_degree is not None:
        deg = e.groupBy("o").agg(F.count(F.lit(1)).alias("__d"))
        e = e.join(
            deg.filter(F.col("__d") <= max_degree).select("o"), "o"
        )
    left = e.select(F.col("o"), F.col("v").alias("a"))
    right = e.select(F.col("o"), F.col("v").alias("b"))
    return (
        left.join(right, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
