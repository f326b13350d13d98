"""Newman modularity of a vertex partition.

Not present in the reference (its community module is an empty placeholder,
src/algorithm/community.rs) — added as the measurement companion to label
propagation: LPA produces labels, ``modularity`` scores them, so community
quality becomes a number a pipeline can gate on.

Definition (undirected, unweighted):

  Q = Σ_c [ e_c / m  −  (d_c / 2m)² ]

where m = |undirected simple edges|, e_c = edges with both endpoints in
community c, d_c = Σ degree over c's members. Q ∈ [−0.5, 1); higher means
denser-than-random communities. Computed on the canonical undirected
simple graph (symmetrize − self-loops, distinct) so every input
orientation scores identically.

Scale notes: one broadcast-sized join of edges against the label frame per
endpoint (labels are |V|-sized — shuffle-hash/SMJ on id), then two
combine-enabled aggregations (per-community edge and degree sums) and a
single-row reduce. No iteration, no driver-side loops; the biggest
intermediate is the labelled edge list itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC, symmetrize_edges


def modularity(
    graph: GraphFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One-row DataFrame[m_edges, n_communities, modularity] for a vertex
    partition ``labels``: DataFrame[id, <label_col>] covering every vertex.

    Vertices missing from ``labels`` form implicit singleton communities
    (their own id), so partial labellings still score."""
    lab = (
        graph.vertices.select(ID)
        .join(labels.select(ID, F.col(label_col).alias("__lab")), ID, "left")
        .select(ID, F.coalesce(F.col("__lab"), F.col(ID)).alias("__lab"))
    )
    # canonical undirected simple edges, one row per unordered pair
    canon = (
        symmetrize_edges(graph.edges.select(SRC, DST), deduplicate=True)
        .filter(F.col(SRC) < F.col(DST))
    )
    la = lab.select(F.col(ID).alias(SRC), F.col("__lab").alias("lab_a"))
    lb = lab.select(F.col(ID).alias(DST), F.col("__lab").alias("lab_b"))
    tagged = canon.join(la, SRC).join(lb, DST)
    # per-community degree sums: each canonical edge contributes 1 degree
    # to each endpoint's community (2 to the community if internal)
    deg_c = (
        tagged.select(F.explode(F.array("lab_a", "lab_b")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    e_c = (
        tagged.filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    per_c = deg_c.join(e_c, "c", "left").select(
        "c",
        F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
        "d_c",
    )
    # m rides a 1-row broadcast crossJoin (same pattern as the PageRank
    # normalizer) so no separate driver-side count action is needed and the
    # Q sum still combines map-side over arbitrarily many communities;
    # m = Σ d_c / 2 since every canonical edge credits two endpoint
    # communities
    totals = per_c.agg((F.sum("d_c") / 2).cast("long").alias("m_edges"))
    return (
        per_c.crossJoin(F.broadcast(totals))
        .agg(
            F.max("m_edges").alias("m_edges"),
            F.count(F.lit(1)).alias("n_communities"),
            F.round(
                F.sum(
                    F.col("e_c") / F.col("m_edges")
                    - F.pow(
                        F.col("d_c") / (F.lit(2.0) * F.col("m_edges")), F.lit(2.0)
                    )
                ),
                6,
            ).alias("modularity"),
        )
    )


def conductance(
    graph: GraphFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """[label, n_members, cut_edges, internal_edges, volume, conductance]
    — per-community conductance φ(S) = cut(S) / min(vol(S), vol(V∖S)),
    the other standard community-quality score (modularity rewards
    density, conductance penalizes leaky boundaries; Leskovec et al.'s
    NCP plots are exactly this per size). Computed on the canonical
    undirected simple graph like :func:`modularity`, so any input
    orientation scores identically.

    Communities whose volume is 0 (all members isolated) get conductance
    NULL rather than a division blow-up. Vertices missing from ``labels``
    form implicit singletons, so partial labellings still score.

    Scale shape: label both endpoints (two |V|-keyed joins), then ONE
    combine-enabled aggregation per community for cut/internal sums and
    one for volumes — no iteration, nothing driver-side."""
    lab = (
        graph.vertices.select(ID)
        .join(labels.select(ID, F.col(label_col).alias("__lab")), ID, "left")
        .select(ID, F.coalesce(F.col("__lab"), F.col(ID)).alias("__lab"))
    )
    canon = (
        symmetrize_edges(graph.edges.select(SRC, DST), deduplicate=True)
        .filter(F.col(SRC) < F.col(DST))
    )
    labelled = (
        canon.join(
            lab.select(F.col(ID).alias(SRC), F.col("__lab").alias("__sl")),
            SRC,
        )
        .join(
            lab.select(F.col(ID).alias(DST), F.col("__lab").alias("__dl")),
            DST,
        )
    )
    # per-community tallies: an internal edge counts once for its own
    # community; a cut edge counts once for EACH endpoint community
    per_side = labelled.select(
        F.col("__sl").alias("label"),
        (F.col("__sl") != F.col("__dl")).cast("long").alias("__cut"),
        (F.col("__sl") == F.col("__dl")).cast("long").alias("__int"),
    ).unionByName(
        labelled.filter(F.col("__sl") != F.col("__dl")).select(
            F.col("__dl").alias("label"),
            F.lit(1).cast("long").alias("__cut"),
            F.lit(0).cast("long").alias("__int"),
        )
    )
    tallies = per_side.groupBy("label").agg(
        F.sum("__cut").alias("cut_edges"),
        F.sum("__int").alias("internal_edges"),
    )
    members = lab.groupBy(F.col("__lab").alias("label")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    # total edge count rides as a 1-row broadcast (no count-star action)
    total = canon.agg(F.count(F.lit(1)).alias("__m"))
    out = (
        members.join(tallies, "label", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "n_members",
            F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            F.col("__m"),
        )
    )
    vol = (F.col("cut_edges") + 2 * F.col("internal_edges")).alias("volume")
    out = out.withColumn("volume", vol)
    other_vol = 2 * F.col("__m") - F.col("volume")
    denom = F.least(F.col("volume"), other_vol)
    return out.withColumn(
        "conductance",
        F.when(denom > 0, F.round(F.col("cut_edges") / denom, 6)),
    ).drop("__m")
