"""Prototype: specialized k-core loop (no generic Pregel machinery) vs the
current Pregel-client default, alternated in one session, same skew18m
tier and 7-refinement budget (fused 2 + 5 supersteps)."""

import os
import sys
import tempfile
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import GraphFrame, symmetrize_edges  # noqa: E402
from graphframes_rs_spark.operators.k_core import kcore_merge_pairs_expr  # noqa: E402
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer  # noqa: E402

V, E, A = 6_000_000, 18_000_000, 4.0


def fast_kcore(spark, vertices, edges_raw, rounds, bucketed, cpus):
    T0 = time.monotonic()
    pinned = ParquetCheckpointer(spark, tempfile.mkdtemp())
    ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp())
    sym = symmetrize_edges(edges_raw.select("src", "dst"), deduplicate=True)
    if bucketed:
        edges = pinned.push_bucketed(sym, "dst", cpus, "edges")
    else:
        edges = pinned.push_partitioned(sym, "dst", cpus, "edges")
    deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("kcore")
    )
    est = (
        vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("kcore", F.lit(0)).alias("kcore"))
    )
    if bucketed:
        est = ckpt.push_bucketed(est, "id", cpus, "est0")
    else:
        est = ckpt.push_partitioned(est, "id", cpus, "est0")
    print(f"  prep done t={time.monotonic() - T0:.1f}", flush=True)

    for rnd in range(1, rounds + 1):
        tr = time.monotonic()
        pairs = (
            edges.join(
                est.select(F.col("id").alias("__nid"), F.col("kcore").alias("__nest")),
                F.col("dst") == F.col("__nid"),
            )
            .groupBy("src", "__nest")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy("src")
            .agg(
                F.collect_list(
                    F.struct(F.col("__nest").alias("value"), F.col("__cnt").alias("cnt"))
                ).alias("__pairs")
            )
            .select(F.col("src").alias("id"), "__pairs")
        )
        merged = kcore_merge_pairs_expr(F.col("__pairs"), F.col("kcore"))
        new_est = est.join(pairs, "id", "left").select(
            "id", merged.alias("kcore"), (merged != F.col("kcore")).alias("__chg")
        )
        obs = Observation()
        new_est = new_est.observe(obs, F.sum(F.col("__chg").cast("long")).alias("n"))
        if bucketed:
            est = ckpt.push_bucketed(
                new_est.select("id", "kcore"), "id", cpus, f"est{rnd}",
                assume_partitioned=True,
            )
        else:
            est = ckpt.push_partitioned(
                new_est.select("id", "kcore"), "id", cpus, f"est{rnd}",
                assume_partitioned=True,
            )
        changed = obs.get["n"]
        ckpt.evict_all_but_latest(1)
        print(
            f"  round {rnd}: changed={changed} sec={time.monotonic() - tr:.1f}",
            flush=True,
        )
        if changed == 0:
            break
    return est


def fast2_kcore(spark, vertices, edges_raw, rounds, cpus):
    """Single-exchange rounds: repartition(src) once per round satisfies
    both groupBys; prep folds distinct into the bucket-write partitioning;
    no est0 materialization (seed degrees ride round 1's plan); isolated
    vertices join at the end."""
    T0 = time.monotonic()
    pinned = ParquetCheckpointer(spark, tempfile.mkdtemp())
    ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp())
    sym = symmetrize_edges(edges_raw.select("src", "dst"), deduplicate=False)
    sym = sym.repartition(cpus, "dst").dropDuplicates(["src", "dst"])
    edges = pinned.push_bucketed(sym, "dst", cpus, "edges", assume_partitioned=True)
    est = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("kcore")
    )
    print(f"  prep done t={time.monotonic() - T0:.1f}", flush=True)

    for rnd in range(1, rounds + 1):
        tr = time.monotonic()
        pairs = (
            edges.join(
                est.select(F.col("id").alias("__nid"), F.col("kcore").alias("__nest")),
                F.col("dst") == F.col("__nid"),
            )
            .select("src", "__nest")
            .repartition(cpus, "src")
            .groupBy("src", "__nest")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy("src")
            .agg(
                F.collect_list(
                    F.struct(F.col("__nest").alias("value"), F.col("__cnt").alias("cnt"))
                ).alias("__pairs")
            )
            .select(F.col("src").alias("id"), "__pairs")
        )
        merged = kcore_merge_pairs_expr(F.col("__pairs"), F.col("kcore"))
        new_est = est.join(pairs, "id", "left").select(
            "id", merged.alias("kcore"), (merged != F.col("kcore")).alias("__chg")
        )
        obs = Observation()
        new_est = new_est.observe(obs, F.sum(F.col("__chg").cast("long")).alias("n"))
        est = ckpt.push_bucketed(
            new_est.select("id", "kcore"), "id", cpus, f"est{rnd}",
            assume_partitioned=True,
        )
        changed = obs.get["n"]
        ckpt.evict_all_but_latest(1)
        print(
            f"  round {rnd}: changed={changed} sec={time.monotonic() - tr:.1f}",
            flush=True,
        )
        if changed == 0:
            break
    out = (
        vertices.select("id")
        .join(est, "id", "left")
        .select("id", F.coalesce("kcore", F.lit(0)).alias("kcore"))
    )
    return out


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
    base = tempfile.mkdtemp(prefix="gf_exp_skew_")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1 << 30)) + F.lit(0.5)) / F.lit(
        float(1 << 30)
    )
    dst = F.floor(F.lit(V) * F.pow(u, F.lit(A)))
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    vertices = spark.read.parquet(base + "/vertices")
    edges_raw = spark.read.parquet(base + "/edges")
    GraphFrame(vertices, edges_raw).edges.limit(10).count()

    modes = sys.argv[1:] or ["fast", "pregel", "fast", "pregel", "fastnb", "fastnb"]
    for i, mode in enumerate(modes):
        spark.catalog.clearCache()
        jvm = spark.sparkContext._jvm
        jvm.System.gc(); time.sleep(1.0); jvm.System.gc()
        t0 = time.monotonic()
        if mode == "pregel":
            g = GraphFrame(vertices, edges_raw)
            out = g.k_core().max_iterations(5).set_checkpoint_dir(tempfile.mkdtemp()).run()
        elif mode == "fast":
            out = fast_kcore(spark, vertices, edges_raw, 7, True, cpus)
        elif mode == "fastnb":
            out = fast_kcore(spark, vertices, edges_raw, 7, False, cpus)
        elif mode == "fast2":
            out = fast2_kcore(spark, vertices, edges_raw, 7, cpus)
        n = out.count()
        print(f"RESULT i={i} mode={mode} sec={time.monotonic() - t0:.1f} rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
