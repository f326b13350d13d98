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


WEIGHT_SCALE = 840  # divisible by 1..8: p,q in {1/4,1/3,1/2,1,2,3,4,...} stay exact


def node2vec_walks(
    graph: GraphFrame,
    num_walks: int = 1,
    walk_length: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[walk_id, start, path: array<long>] — deterministic
    second-order biased walks (node2vec, Grover & Leskovec KDD'16).

    From current vertex ``v`` (arrived from ``t``), neighbour ``x`` is
    drawn with unnormalized weight 1/p if ``x == t`` (return), 1 if the
    edge ``t -> x`` exists (BFS-ish), else 1/q (DFS-ish). The first hop
    is uniform (no predecessor), matching the paper. Weights are scaled
    to integers (``round(WEIGHT_SCALE / p)`` etc.) so the categorical
    draw is exact integer arithmetic — bit-reproducible across runs,
    partitionings, and engines (the DuckDB oracle replays it in SQL).

    Spark-first plan, per step: walks fan out to the current vertex's
    DISTINCT out-neighbours (one equi-join on ``cur``), a left join
    against the edge set marks distance-1 candidates, and one window
    over ``walk_id`` (rank order) turns the integer cumulative weight
    into the categorical draw ``u = H(walk_id|step|seed) % total``. The
    chosen row joins back to the slim walk state, so the path array
    never rides the fan-out. Unlike the uniform walk (one equi-join per
    step), the fan-out is inherent to node2vec — the transition law
    depends on the whole neighbour set of ``cur`` — and is the same
    Σ out-degree cost the paper's alias tables pay to build.

    Sinks stop extending (path stays short); parallel edges collapse
    (DISTINCT out-neighbours)."""
    if num_walks < 1 or walk_length < 1:
        raise ValueError("num_walks and walk_length must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    w_ret = max(1, round(WEIGHT_SCALE / p))
    w_d1 = WEIGHT_SCALE
    w_d2 = max(1, round(WEIGHT_SCALE / q))

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
    ).localCheckpoint(eager=False)
    outdeg = ranked.groupBy(F.col(SRC).alias(ID)).agg(F.max("odeg").alias("odeg"))

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
            F.lit(None).cast("long").alias("prev"),
            F.col(ID).alias("cur"),
            F.col("odeg").alias("cur_odeg"),
            F.array(F.col(ID)).alias("path"),
        )
    )

    # step 1: uniform (no predecessor) — single (src, rank) equi-join
    first_choice = (
        F.pmod(
            hash60(F.concat_ws("|", F.col("walk_id"), F.lit(1), F.lit(seed))),
            F.col("cur_odeg"),
        )
        + 1
    )
    hop1 = ranked.select(
        F.col(SRC).alias("__hop_src"),
        F.col("rank").alias("__rank"),
        F.col(DST).alias("__nxt"),
    )
    walks = (
        walks.withColumn("__choice", first_choice)
        .join(
            hop1,
            (F.col("cur") == F.col("__hop_src"))
            & (F.col("__choice") == F.col("__rank")),
            "left",
        )
        .select(
            "walk_id",
            F.when(F.col("__nxt").isNotNull(), F.col("cur")).alias("prev"),
            F.coalesce(F.col("__nxt"), F.col("cur")).alias("cur"),
            F.when(
                F.col("__nxt").isNotNull(),
                F.concat(F.col("path"), F.array(F.col("__nxt"))),
            )
            .otherwise(F.col("path"))
            .alias("path"),
        )
    )

    hops = ranked.select(
        F.col(SRC).alias("__hop_src"),
        F.col("rank").alias("__rank"),
        F.col(DST).alias("__cand"),
    )
    d1_edges = edges.select(
        F.col(SRC).alias("__d1_src"), F.col(DST).alias("__d1_dst")
    )
    w_cum = (
        Window.partitionBy("walk_id")
        .orderBy("__rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("walk_id")
    for step in range(2, walk_length + 1):
        state = walks.select("walk_id", "prev", "cur")
        cand = (
            state.join(hops, F.col("cur") == F.col("__hop_src"))
            .join(
                d1_edges,
                (F.col("prev") == F.col("__d1_src"))
                & (F.col("__cand") == F.col("__d1_dst")),
                "left",
            )
            .select(
                "walk_id",
                "__rank",
                "__cand",
                F.when(F.col("__cand") == F.col("prev"), F.lit(w_ret))
                .when(F.col("__d1_src").isNotNull(), F.lit(w_d1))
                .otherwise(F.lit(w_d2))
                .alias("__w"),
            )
        )
        u = F.pmod(
            hash60(F.concat_ws("|", F.col("walk_id"), F.lit(step), F.lit(seed))),
            F.sum("__w").over(w_tot),
        )
        pick = (
            cand.withColumn("__cum", F.sum("__w").over(w_cum))
            .withColumn("__u", u)
            .filter(
                (F.col("__u") < F.col("__cum"))
                & (F.col("__u") >= F.col("__cum") - F.col("__w"))
            )
            .select("walk_id", F.col("__cand").alias("__nxt"))
        )
        walks = walks.join(pick, "walk_id", "left").select(
            "walk_id",
            F.when(F.col("__nxt").isNotNull(), F.col("cur")).alias("prev"),
            F.coalesce(F.col("__nxt"), F.col("cur")).alias("cur"),
            F.when(
                F.col("__nxt").isNotNull(),
                F.concat(F.col("path"), F.array(F.col("__nxt"))),
            )
            .otherwise(F.col("path"))
            .alias("path"),
        )
        # pin each step's state: the next step consumes `walks` TWICE
        # (the state feeding the fan-out AND the final join-back), so an
        # unmaterialized chain doubles per step — 2^(L-1) replays of the
        # full fan-out by the last step (same recomputation class as the
        # matching round-0 finding)
        walks = walks.localCheckpoint(eager=False)
    return walks.select("walk_id", F.col("path")[0].alias("start"), "path")


def sample_neighbors(
    graph: GraphFrame, k: int, seed: int = 42
) -> DataFrame:
    """[id, neighbor, rank] — at most ``k`` deterministic hash-sampled
    DISTINCT out-neighbours per vertex (rank 1..k in the seeded-hash
    order): the GraphSAGE/GNN fanout-sampling primitive (Hamilton, Ying
    & Leskovec, NeurIPS'17). Multi-layer fanouts compose by joining a
    layer's ``neighbor`` column onto the next call's ``id``.

    One window shuffle on ``src`` (identical prep to
    :func:`random_walks` — per-vertex hash ranking), then a narrow
    ``rank <= k`` filter: no per-row RNG state, stable under
    re-partitioning, replayable in SQL. Vertices with out-degree < k
    keep all their neighbours; isolated vertices emit nothing."""
    if k < 1:
        raise ValueError("k must be >= 1")
    edges = graph.edges.select(SRC, DST).distinct()
    w_rank = Window.partitionBy(SRC).orderBy(
        hash60(F.concat_ws("|", F.col(DST), F.lit(seed))), DST
    )
    return (
        edges.select(
            F.col(SRC).alias(ID),
            F.col(DST).alias("neighbor"),
            F.row_number().over(w_rank).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


WEIGHT_QUANTUM = 1_000_000  # edge weights quantized to 1e-6 for exact draws


def weighted_random_walks(
    graph: GraphFrame,
    weight_col: str,
    num_walks: int = 1,
    walk_length: int = 3,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[walk_id, start, path: array<long>] — deterministic
    edge-weight-biased walks: hop probability proportional to the edge's
    ``weight_col`` (> 0 required; duplicate (src, dst) edges sum their
    weights). Weights are quantized to ``round(w * 1e6)`` so the
    categorical draw is exact integer arithmetic, bit-reproducible
    across runs, partitionings, and engines.

    Spark-first plan: prep ranks each vertex's neighbours once and
    attaches the INTEGER cumulative weight interval [lo, hi) per edge
    plus the per-vertex total (one window shuffle, done once — unlike
    node2vec there is no per-step window). Each step then draws
    ``u = H(walk_id|step|seed) % total(cur)`` BEFORE the join and picks
    the unique edge with ``lo <= u < hi`` — one equi-join on ``src``
    with the interval predicate riding the join, never a fan-out that
    survives past the join operator."""
    if num_walks < 1 or walk_length < 1:
        raise ValueError("num_walks and walk_length must be >= 1")

    qw = F.round(F.col(weight_col) * WEIGHT_QUANTUM).cast("long")
    edges = (
        graph.edges.select(SRC, DST, qw.alias("__w"))
        .groupBy(SRC, DST)
        .agg(F.sum("__w").alias("__w"))
        # weights that quantize to <= 0 are dropped (documented: > 0
        # required; sub-1e-6 weights round to never-taken)
        .filter(F.col("__w") > 0)
    )
    w_cum = (
        Window.partitionBy(SRC)
        .orderBy(hash60(F.concat_ws("|", F.col(DST), F.lit(seed))), DST)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(SRC)
    ranked = (
        edges.select(
            SRC,
            DST,
            "__w",
            (F.sum("__w").over(w_cum) - F.col("__w")).alias("lo"),
            F.sum("__w").over(w_cum).alias("hi"),
            F.sum("__w").over(w_all).alias("tot"),
        )
        .localCheckpoint(eager=False)
    )
    totals = ranked.groupBy(F.col(SRC).alias(ID)).agg(F.max("tot").alias("tot"))
    hops = ranked.join(
        totals.select(F.col(ID).alias(DST), F.col("tot").alias("dst_tot")),
        DST,
        "left",
    ).select(SRC, DST, "lo", "hi", "dst_tot")

    walks = (
        graph.vertices.select(ID)
        .join(totals, ID, "left")
        .select(
            ID,
            "tot",
            F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("__i"),
        )
        .select(
            (F.col(ID) * num_walks + F.col("__i")).alias("walk_id"),
            F.col(ID).alias("cur"),
            F.col("tot").alias("cur_tot"),
            F.array(F.col(ID)).alias("path"),
        )
    )
    step_hops = hops.select(
        F.col(SRC).alias("__hop_src"),
        F.col(DST).alias("__nxt"),
        F.col("lo").alias("__lo"),
        F.col("hi").alias("__hi"),
        F.col("dst_tot").alias("__nxt_tot"),
    )
    for step in range(1, walk_length + 1):
        u = F.pmod(
            hash60(F.concat_ws("|", F.col("walk_id"), F.lit(step), F.lit(seed))),
            F.col("cur_tot"),
        )
        walks = (
            walks.withColumn("__u", u)
            .join(
                step_hops,
                (F.col("cur") == F.col("__hop_src"))
                & (F.col("__u") >= F.col("__lo"))
                & (F.col("__u") < F.col("__hi")),
                "left",
            )
            .select(
                "walk_id",
                F.coalesce(F.col("__nxt"), F.col("cur")).alias("cur"),
                F.when(F.col("__nxt").isNotNull(), F.col("__nxt_tot")).alias(
                    "cur_tot"
                ),
                F.when(
                    F.col("__nxt").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("__nxt"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
    return walks.select("walk_id", F.col("path")[0].alias("start"), "path")


def negative_samples(
    edges: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    power: float = 0.75,
    seed: int = 42,
    quant: int = 1000,
    num_buckets: int = 64,
) -> DataFrame:
    """[center, context, slot, neg_id] — word2vec-style negative sampling
    for skip-gram training pairs: each (center, context) pair draws ``k``
    vertices from the smoothed unigram distribution deg^``power``
    (Mikolov's 3/4 smoothing), deterministically (a seeded md5 hash per
    (pair, slot) picks the point in the cumulative weight line).
    Completes the walk -> skip-gram -> negatives corpus pipeline next to
    :func:`random_walks` and :func:`skipgram_pairs`. Self-collisions
    (neg == center/context) are kept, as in the reference word2vec
    implementation — re-draw downstream if the loss requires it.

    Scale shape: the global cumulative weight line is built WITHOUT a
    single-task global window — ids are hashed into ``num_buckets``,
    cumsums run per bucket in parallel, and the (tiny) per-bucket totals
    come back as a broadcast offset join; sampling is then a point-in-
    interval lookup via the grid-bucketed :func:`~graphframes_rs_spark.
    pipeline.joins.interval_join`, so per-task work follows cell density
    no matter how hot a hub vertex's interval is."""
    from pyspark.sql.window import Window

    from graphframes_rs_spark.graphframe import DST, SRC, symmetrize_edges
    from graphframes_rs_spark.pipeline.joins import interval_join
    from graphframes_rs_spark.pipeline.text import hash60

    und = symmetrize_edges(edges.select(SRC, DST), deduplicate=True)
    deg = und.groupBy(F.col(SRC).alias("vid")).agg(F.count(F.lit(1)).alias("deg"))
    w = deg.select(
        "vid",
        F.greatest(
            F.lit(1), F.floor(F.pow(F.col("deg"), F.lit(power)) * quant)
        ).cast("long").alias("wi"),
        # md5-based bucket (not xxhash64): the interval layout must be
        # re-derivable outside Spark for the oracle gate
        F.pmod(hash60(F.col("vid").cast("string")), F.lit(num_buckets))
        .cast("int")
        .alias("bkt"),
    )
    bw = Window.partitionBy("bkt").orderBy("vid")
    local = w.select(
        "vid", "wi", "bkt",
        (F.sum("wi").over(bw) - F.col("wi")).alias("lo_local"),
    )
    totals = sorted(
        (r["bkt"], r["t"])
        for r in w.groupBy("bkt").agg(F.sum("wi").alias("t")).collect()
    )
    offsets, acc = {}, 0
    for bkt, t in totals:
        offsets[bkt] = acc
        acc += t
    total_w = acc
    spark = edges.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "bkt int, off long"
    )
    intervals = (
        local.join(F.broadcast(off_df), "bkt")
        .select(
            F.lit(0).alias("key"),
            F.col("vid").alias("id"),
            (F.col("lo_local") + F.col("off")).alias("start"),
            (F.col("lo_local") + F.col("off") + F.col("wi") - 1).alias("end"),
        )
    )
    # duplicate pairs would draw IDENTICAL negatives (the hash is a pure
    # function of (center, context, slot)), so sample per distinct pair
    # and use the natural triple as the join-back key — no synthetic ids
    draws = (
        pairs.select("center", "context")
        .distinct()
        .select(
            "center", "context",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
        )
        .select(
            "center", "context", "slot",
            F.lit(0).alias("key"),
            F.concat_ws(":", "center", "context", "slot").alias("id"),
            F.pmod(
                hash60(
                    F.concat_ws(
                        ":", F.lit(str(seed)), "center", "context", "slot"
                    )
                ),
                F.lit(total_w),
            ).alias("start"),
        )
        .withColumn("end", F.col("start"))
    )
    cell = max(total_w // (num_buckets * 16), 1)
    hit = interval_join(
        draws.select("key", "id", "start", "end"), intervals, cell=cell
    )
    back = draws.select(F.col("id").alias("l_id"), "center", "context", "slot")
    return hit.join(back, "l_id").select(
        "center", "context", "slot", F.col("r_id").alias("neg_id")
    )
