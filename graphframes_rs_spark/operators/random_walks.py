"""Deterministic uniform random walks — DeepWalk-style corpus generation.

Not in the reference (its surface stops at analytic algorithms); added
because walk corpora are the standard input for graph-embedding training
(DeepWalk, node2vec with p=q=1) and generating them is exactly the kind
of 100 TB job this engine targets.

Spark-first plan:

  prep:  one window over the (deduped) edges — ``row_number`` ranks each
         vertex's out-neighbours in a seeded-hash order and a partition
         count attaches the out-degree; a second pass attaches each
         DESTINATION's out-degree so the walk step below never needs a
         separate degree lookup. One shuffle on ``src``, done once.
  step:  every walk row carries (current vertex, current out-degree);
         the next hop is ``rank = pmod(H(walk_id, step), out_degree) + 1``
         computed BEFORE the join, so each step is a single equi-join on
         ``(src, rank)`` — never a fan-out over all neighbours. Dead ends
         (out-degree NULL) simply stop extending via the left join.

Determinism: every choice derives from ``hash60`` (md5-based) over
``walk_id | step | seed``, so walks are reproducible across runs,
partitionings, and engines — the DuckDB oracle replays the identical
walks in SQL. Uniformity per hop follows from the hash; the per-vertex
neighbour ORDER is itself hash-shuffled so low ranks are not biased
toward small ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC
from graphframes_rs_spark.pipeline.text import hash60


def random_walks(
    graph: GraphFrame,
    num_walks: int = 1,
    walk_length: int = 3,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[walk_id, start, path: array<long>] — ``num_walks``
    deterministic uniform random walks of up to ``walk_length`` hops from
    every vertex. Walks that reach a sink stop early (the path just stays
    shorter); parallel edges are collapsed (choice is uniform over
    DISTINCT out-neighbours). ``walk_id = id * num_walks + w`` — unique
    while ``max(id) * num_walks`` fits a long."""
    if num_walks < 1 or walk_length < 1:
        raise ValueError("num_walks and walk_length must be >= 1")

    edges = graph.edges.select(SRC, DST).distinct()
    w_rank = Window.partitionBy(SRC).orderBy(
        hash60(F.concat_ws("|", F.col(DST), F.lit(seed))), DST
    )
    w_all = Window.partitionBy(SRC)
    ranked = edges.select(
        SRC,
        DST,
        F.row_number().over(w_rank).alias("rank"),
        F.count(F.lit(1)).over(w_all).alias("odeg"),
    )
    outdeg = ranked.groupBy(F.col(SRC).alias(ID)).agg(
        F.max("odeg").alias("odeg")
    )
    # each hop row also carries the DESTINATION's out-degree so the next
    # step needs no degree lookup
    hops = (
        ranked.join(
            outdeg.select(
                F.col(ID).alias(DST), F.col("odeg").alias("dst_odeg")
            ),
            DST,
            "left",
        )
        .select(SRC, "rank", DST, "dst_odeg")
        # referenced once per hop: materialize so the window + degree
        # joins run once, not walk_length times
        .localCheckpoint(eager=False)
    )

    walks = (
        graph.vertices.select(ID)
        .join(outdeg, ID, "left")
        .select(
            ID,
            "odeg",
            F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("__w"),
        )
        .select(
            (F.col(ID) * num_walks + F.col("__w")).alias("walk_id"),
            F.col(ID).alias("cur"),
            F.col("odeg").alias("cur_odeg"),
            F.array(F.col(ID)).alias("path"),
        )
    )
    for step in range(1, walk_length + 1):
        choice = (
            F.pmod(
                hash60(
                    F.concat_ws(
                        "|", F.col("walk_id"), F.lit(step), F.lit(seed)
                    )
                ),
                F.col("cur_odeg"),
            )
            + 1
        )
        step_hops = hops.select(
            F.col(SRC).alias("__hop_src"),
            F.col("rank").alias("__rank"),
            F.col(DST).alias("__nxt"),
            F.col("dst_odeg").alias("__nxt_odeg"),
        )
        walks = (
            walks.withColumn("__choice", choice)
            .join(
                step_hops,
                (F.col("cur") == F.col("__hop_src"))
                & (F.col("__choice") == F.col("__rank")),
                "left",
            )
            .select(
                "walk_id",
                F.coalesce(F.col("__nxt"), F.col("cur")).alias("cur"),
                F.when(F.col("__nxt").isNotNull(), F.col("__nxt_odeg")).alias(
                    "cur_odeg"
                ),
                F.when(
                    F.col("__nxt").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("__nxt"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
    return walks.select(
        "walk_id", F.col("path")[0].alias("start"), "path"
    )


def skipgram_pairs(
    walks: DataFrame, window: int = 2, path_col: str = "path"
) -> DataFrame:
    """[center, context, offset] — skip-gram training pairs from a walk
    corpus (the step after :func:`random_walks` in a DeepWalk/node2vec
    embedding pipeline): for every position i in every path, emit
    (path[i], path[j], j - i) for all j != i within ``window`` hops.

    Pure narrow projection: one ``posexplode`` over the path plus an
    offset explode — no joins, no shuffle; at 100 TB this pipelines
    straight from the walk output into the training-data sink. Pair
    counts follow corpus multiplicities exactly (no dedup): SGD consumers
    weight by frequency."""
    if window < 1:
        raise ValueError("window must be >= 1")
    p = F.col(path_col)
    exploded = walks.select(
        p.alias("__path"), F.posexplode(p).alias("__i", "center")
    )
    offsets = [o for o in range(-window, window + 1) if o != 0]
    return (
        exploded.select(
            "center",
            F.explode(F.array(*[F.lit(o) for o in offsets])).alias("offset"),
            F.col("__i"),
            F.col("__path"),
        )
        .withColumn("__j", F.col("__i") + F.col("offset"))
        .filter(
            (F.col("__j") >= 0) & (F.col("__j") < F.size("__path"))
        )
        .select("center", F.col("__path")[F.col("__j")].alias("context"), "offset")
    )
