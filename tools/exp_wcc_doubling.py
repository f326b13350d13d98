"""Prototype: rep-map pointer doubling before the edge relabel.

Hypothesis (from tools/exp_wcc.py's negative result): relabel JOIN VOLUME
over the big early-round edge frames dominates WCC cost, not exchange
count. The current round contracts each vertex one rep-hop per EDGE-SCALE
relabel; the rep forest of a round (v -> min-hash neighbour) has chains,
so most contraction potential is wasted. Doubling the rep map k times
(VERTEX-scale self-joins, |V| << |E|) before relabeling contracts up to
2^k hops per edge-scale round -> geometrically fewer big relabels.

Cycle safety: min_by(dst, h(dst)) ties can form 2-cycles; a FIXED number
of doublings is still component-preserving (rep^(2k) of a 2-cycle is the
identity — no progress on that pair this round, resolved by next round's
reseeded hash), so no convergence detection is needed.
"""

import os
import sys
import tempfile
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import GraphFrame, symmetrize_edges  # noqa: E402
from graphframes_rs_spark.operators.connected_components import (  # noqa: E402
    _compute_reps,
    _local_components,
    _relabel_edges,
)
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer  # noqa: E402

SRC, DST = "src", "dst"


def doubled_wcc(spark, vertices, edges_raw, seed0=42, local_cut=500_000,
                doublings=2):
    t0 = time.monotonic()
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp(prefix="expwccd_"))
    reps_ckpt = ParquetCheckpointer(spark, ckpt.directory + "/reps")
    obs = Observation()
    edges = symmetrize_edges(
        edges_raw.select(SRC, DST), deduplicate=True
    ).observe(obs, F.count(F.lit(1)).alias("n"))
    edges = ckpt.push_partitioned(edges, SRC, shuffle_n, "edges")
    n_edges = obs.get["n"]
    print(f"  prep {time.monotonic()-t0:.1f}s n={n_edges}", flush=True)

    reps_frames, iteration = [], 0
    while n_edges > 0:
        t1 = time.monotonic()
        if n_edges <= local_cut:
            reps = reps_ckpt.push_partitioned(
                _local_components(edges), "rep", shuffle_n, f"reps_{iteration}")
            reps_frames.append(reps)
            iteration += 1
            break
        seed = seed0 + iteration
        reps = _compute_reps(edges, seed)
        # pointer doubling: rep <- rep(rep), k fixed rounds, V-scale joins
        for _ in range(doublings):
            r2 = reps.select(F.col("v").alias("__v2"), F.col("rep").alias("__r2"))
            reps = reps.join(
                r2, reps["rep"] == F.col("__v2"), "left"
            ).select("v", F.coalesce("__r2", "rep").alias("rep"))
        reps = reps_ckpt.push_partitioned(reps, "rep", shuffle_n, f"reps_{iteration}")
        reps_frames.append(reps)
        obs = Observation()
        new_edges = ckpt.push_partitioned(
            _relabel_edges(edges, reps).observe(obs, F.count(F.lit(1)).alias("n")),
            SRC, shuffle_n, "edges")
        ckpt.evict_all_but_latest(1)
        edges = new_edges
        n_edges = obs.get["n"]
        iteration += 1
        print(f"  round {iteration}: n={n_edges} {time.monotonic()-t1:.1f}s", flush=True)

    final = None
    for reps in reversed(reps_frames):
        if final is None:
            final = reps
        else:
            nxt = final.select(F.col("v").alias("__fv"), F.col("rep").alias("__fr"))
            final = reps.join(nxt, reps["rep"] == F.col("__fv"), "left").select(
                "v", F.coalesce("__fr", "rep").alias("rep"))
    final = ckpt.push_partitioned(final, "v", shuffle_n, "final")
    result = (vertices.select("id")
              .join(final, F.col("id") == final["v"], "left")
              .select("id", F.coalesce("rep", F.col("id")).alias("component")))
    mins = result.groupBy("component").agg(F.min("id").alias("__m"))
    result = result.join(mins, "component").select("id", F.col("__m").alias("component"))
    n = result.groupBy("component").count().count()
    dt = time.monotonic() - t0
    print(f"  doubled({doublings}) total {dt:.1f}s components={n} rounds={iteration}", flush=True)
    return dt, n


def current_wcc(spark, vertices, edges_raw):
    t0 = time.monotonic()
    g = GraphFrame(vertices, edges_raw)
    res = g.connected_components().set_checkpoint_dir(
        tempfile.mkdtemp(prefix="expwccc_")).run()
    n = res.groupBy("component").count().count()
    dt = time.monotonic() - t0
    print(f"  current total {dt:.1f}s components={n}", flush=True)
    return dt, n


def make_graph(spark, n_edges, n_vertices, seed=7):
    e = (spark.range(n_edges)
         .select((F.xxhash64("id", F.lit(seed)) % n_vertices).alias(SRC),
                 (F.xxhash64("id", F.lit(seed + 1)) % n_vertices).alias(DST))
         .select(F.abs(SRC).alias(SRC), F.abs(DST).alias(DST)))
    v = (e.select(F.col(SRC).alias("id"))
         .union(e.select(F.col(DST).alias("id"))).distinct())
    return v.cache(), e.cache()


if __name__ == "__main__":
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "48g")
             .config("spark.local.dir", "/dev/shm/exp_wcc_d")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ne = int(os.environ.get("EXP_EDGES", "6000000"))
    nv = int(os.environ.get("EXP_VERTS", "2000000"))
    v, e = make_graph(spark, ne, nv)
    v.count(); e.count()
    order = os.environ.get("EXP_ORDER", "dc")  # d=doubled, c=current
    for which in order:
        if which == "d":
            doubled_wcc(spark, v, e, doublings=int(os.environ.get("EXP_K", "2")))
        else:
            current_wcc(spark, v, e)
    spark.stop()
