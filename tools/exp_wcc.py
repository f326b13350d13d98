"""Prototype: exchange-lean WCC contraction round vs the current operator.

Current round: reps agg (exchange on src) + reps store (exchange on rep)
+ relabel join 1 (exchange both sides) + relabel join 2 (exchange) +
distinct (exchange) + edge store (exchange) ~ 5-6 edge-scale exchanges.

Restructured: edges bucketed by src -> reps groupBy(src) exchange-free;
reps stored bucketed by v assume_partitioned (sort-only write); relabel
join 1 bucket-aligned (no exchange); join 2 one exchange on dst;
repartition(src) + dropDuplicates + bucketed store assume_partitioned
(one more exchange). ~2 edge-scale exchanges per round.

MEASURED OUTCOME (round 6, 18m tier, local[32], alternating order):
fast 49.0 cold / 40.6 warm vs current 54.1 cold / 43.0 warm — ~6%,
within this machine's noise band. The relabel JOIN VOLUME (36M->28M->25M
edges over the first rounds) dominates, not exchange count; AQE-coalesced
exchanges of compact long-pairs are cheap in local mode. NOT integrated:
the gain does not justify restructuring a golden-tested operator, though
on a real cluster (network-bound exchanges) the bucketed form would
likely matter more — revisit if a multi-node measurement becomes
available. Verified bit-identical output (same min-member labels).
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
    _local_components,
)
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer  # noqa: E402

SRC, DST = "src", "dst"


def fast_wcc(spark, vertices, edges_raw, cpus, seed0=42, local_cut=500_000):
    T0 = time.monotonic()
    ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp())
    reps_ckpt = ParquetCheckpointer(spark, ckpt.directory + "/reps")
    obs = Observation()
    sym = (
        symmetrize_edges(edges_raw.select(SRC, DST), deduplicate=False)
        .repartition(cpus, SRC)
        .dropDuplicates([SRC, DST])
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    edges = ckpt.push_bucketed(sym, SRC, cpus, "edges", assume_partitioned=True)
    n_edges = obs.get["n"]
    print(f"  prep {time.monotonic() - T0:.1f}s n={n_edges}", flush=True)

    reps_frames = []
    iteration = 0
    while n_edges > 0:
        tr = time.monotonic()
        if n_edges <= local_cut:
            reps = reps_ckpt.push_partitioned(
                _local_components(edges), "rep", cpus, f"reps_{iteration}"
            )
            reps_frames.append(reps)
            iteration += 1
            print(f"  local finish {time.monotonic() - tr:.1f}s", flush=True)
            break
        seed = seed0 + iteration
        h = lambda c: F.xxhash64(c, F.lit(seed))  # noqa: E731
        # reps: exchange-free groupBy over the src-bucketed edges
        reps_plan = (
            edges.groupBy(F.col(SRC).alias("v"))
            .agg(
                F.min(
                    F.struct(h(F.col(DST)).alias("h"), F.col(DST).alias("u"))
                ).alias("nbr")
            )
            .select(
                "v",
                F.when(h(F.col("v")) < F.col("nbr.h"), F.col("v"))
                .otherwise(F.col("nbr.u"))
                .alias("rep"),
            )
        )
        # store bucketed by v with assume_partitioned: sort-only write
        reps = reps_ckpt.push_bucketed(
            reps_plan, "v", cpus, f"reps_{iteration}", assume_partitioned=True
        )
        reps_frames.append(reps)
        # relabel: join 1 bucket-aligned on src==v (no exchange)
        src_rel = (
            edges.join(reps, edges[SRC] == reps["v"], "inner")
            .select(F.col("rep").alias(SRC), F.col(DST))
        )
        # join 2: one exchange of the intermediate on dst
        rel = (
            src_rel.join(reps, src_rel[DST] == reps["v"], "inner")
            .filter(F.col(SRC) != F.col("rep"))
            .select(F.col(SRC), F.col("rep").alias(DST))
        )
        obs = Observation()
        new_edges = (
            rel.repartition(cpus, SRC)
            .dropDuplicates([SRC, DST])
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        edges = ckpt.push_bucketed(
            new_edges, SRC, cpus, "edges", assume_partitioned=True
        )
        ckpt.evict_all_but_latest(1)
        n_edges = obs.get["n"]
        iteration += 1
        print(
            f"  round {iteration}: n_edges={n_edges} {time.monotonic() - tr:.1f}s",
            flush=True,
        )

    # back-propagation (same as operator)
    final = None
    for reps in reversed(reps_frames):
        if final is None:
            final = reps
        else:
            nxt = final.select(
                F.col("v").alias("__fr_v"), F.col("rep").alias("__fr_rep")
            )
            final = reps.join(nxt, reps["rep"] == F.col("__fr_v"), "left").select(
                "v", F.coalesce(F.col("__fr_rep"), F.col("rep")).alias("rep")
            )
    if final is not None:
        final = ckpt.push_partitioned(final, "v", cpus, "final")
    if final is None:
        return vertices.select("id", F.col("id").alias("component"))
    result = (
        vertices.select("id")
        .join(final, F.col("id") == final["v"], "left")
        .select("id", F.coalesce(F.col("rep"), F.col("id")).alias("component"))
    )
    min_labels = result.groupBy("component").agg(F.min("id").alias("__m"))
    return result.join(min_labels, "component").select(
        "id", F.col("__m").alias("component")
    )


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tier = os.environ.get("EXP_TIER", "18m")
    V, E = (6_000_000, 18_000_000) if tier == "18m" else (2_000_000, 6_000_000)
    skew = os.environ.get("EXP_SKEW") == "1"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="gf_exp_wcc_")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    if skew:
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1 << 30)) + F.lit(0.5)
        ) / F.lit(float(1 << 30))
        dst = F.floor(F.lit(V) * F.pow(u, F.lit(4.0)))
    else:
        dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(V))
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    vertices = spark.read.parquet(base + "/vertices")
    edges_raw = spark.read.parquet(base + "/edges")
    edges_raw.limit(10).count()

    modes = sys.argv[1:] or ["fast", "current"]
    for i, mode in enumerate(modes):
        spark.catalog.clearCache()
        jvm = spark.sparkContext._jvm
        jvm.System.gc(); time.sleep(1.0); jvm.System.gc()
        t0 = time.monotonic()
        if mode == "current":
            g = GraphFrame(vertices, edges_raw)
            out = g.connected_components().set_checkpoint_dir(tempfile.mkdtemp()).run()
        else:
            out = fast_wcc(spark, vertices, edges_raw, cpus)
        n = out.count()
        ncomp = out.select("component").distinct().count()
        print(
            f"RESULT i={i} mode={mode} sec={time.monotonic() - t0:.1f} "
            f"rows={n} comps={ncomp}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
