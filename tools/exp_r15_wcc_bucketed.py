"""Interleaved A/B + exact-parity harness for the r15 bucketed WCC
restructure (old = r14 push_partitioned rounds via tools/r15_old_impls,
new = HEAD bucketed rounds).

Usage:
    EXP_TIER=18m|54m|skew18m|6m python tools/exp_r15_wcc_bucketed.py [pairs]
    EXP_PARITY=1  -> also assert exact per-vertex equality old vs new
Alternates new,old,new,old inside ONE warm session (bench-like config)
so adjacent samples see the same box; prints per-sample wall + steal.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.connected_components import (
    ConnectedComponentsBuilder,
)
from tools.r15_old_impls import old_wcc_run


def steal_ms():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) * 10
    except Exception:
        return 0


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tier = os.environ.get("EXP_TIER", "18m")
    dims = {
        "6m": (2_000_000, 6_000_000, None),
        "18m": (6_000_000, 18_000_000, None),
        "skew18m": (6_000_000, 18_000_000, 4.0),
        "54m": (18_000_000, 54_000_000, None),
    }[tier]
    V, E, skew = dims
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
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
    if os.path.isdir("/dev/shm"):
        tempfile.tempdir = tempfile.mkdtemp(dir="/dev/shm", prefix="gf_exp_wcc_")
    base = tempfile.mkdtemp(prefix=f"gf_r15wcc_{tier}_")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    if skew:
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1 << 30)) + F.lit(0.5)
        ) / F.lit(float(1 << 30))
        dst = F.floor(F.lit(V) * F.pow(u, F.lit(skew)))
    else:
        dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(V))
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    vertices = spark.read.parquet(base + "/vertices")
    edges = spark.read.parquet(base + "/edges")
    edges.limit(10).count()

    def run(mode):
        g = GraphFrame(vertices, edges)
        b = g.connected_components().set_checkpoint_dir(tempfile.mkdtemp())
        if mode == "old":
            out = old_wcc_run(b)
        else:
            out = b.run()
        return out, b

    if os.environ.get("EXP_PARITY") == "1":
        new_out, _ = run("new")
        new_out.write.mode("overwrite").parquet(base + "/new_out")
        old_out, _ = run("old")
        old_out.write.mode("overwrite").parquet(base + "/old_out")
        a = spark.read.parquet(base + "/new_out")
        o = spark.read.parquet(base + "/old_out")
        mism = (
            a.join(o.withColumnRenamed("component", "c2"), "id")
            .filter(F.col("component") != F.col("c2"))
            .count()
        )
        print(f"PARITY rows_new={a.count()} rows_old={o.count()} mismatches={mism}",
              flush=True)
        assert mism == 0 and a.count() == V

    # untimed warmup of BOTH code paths at the real tier: the first run
    # of a session pays catalog init (bucketed saveAsTable) + codegen —
    # 77.9s vs 32.8s warm on the 18m tier — which otherwise lands on
    # whichever arm goes first
    if os.environ.get("EXP_WARM", "1") == "1":
        for mode in ("new", "old"):
            t0 = time.monotonic()
            out, _ = run(mode)
            out.count()
            print(f"WARMUP mode={mode} sec={time.monotonic() - t0:.1f}",
                  flush=True)

    for i in range(pairs):
        for mode in ("new", "old") if i % 2 == 0 else ("old", "new"):
            spark.catalog.clearCache()
            jvm = spark.sparkContext._jvm
            jvm.System.gc(); time.sleep(1.0); jvm.System.gc()
            s0, t0 = steal_ms(), time.monotonic()
            out, b = run(mode)
            n = out.count()
            print(
                f"SAMPLE mode={mode} sec={time.monotonic() - t0:.1f} "
                f"steal_ms={steal_ms() - s0} rows={n} rounds={b.iterations_} "
                f"phases={b.phase_stats_}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
