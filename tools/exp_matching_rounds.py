"""Per-round, per-stage timing of the maximal-matching loop on the 6M
bench tier: where do the ~21s go (pairs write vs edge prune write vs
round count)?"""

import os
import sys
import tempfile
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import symmetrize_edges  # noqa: E402
from graphframes_rs_spark.operators.matching import _repair_collisions  # noqa: E402
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer  # noqa: E402

V, E = 2_000_000, 6_000_000


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(V))
    raw = spark.range(E).select(src.cast("long").alias("src"), dst.cast("long").alias("dst"))

    t_all = time.monotonic()
    ckpt_e = ParquetCheckpointer(spark, tempfile.mkdtemp())
    ckpt_p = ParquetCheckpointer(spark, tempfile.mkdtemp())
    obs = Observation()
    t0 = time.monotonic()
    edges = ckpt_e.push(
        symmetrize_edges(raw.select("src", "dst"), deduplicate=True)
        .filter(F.col("src") < F.col("dst"))
        .observe(obs, F.count(F.lit(1)).alias("n")),
        "e0",
    )
    n_edges = obs.get["n"]
    print(f"prep: {time.monotonic() - t0:.1f}s edges={n_edges}", flush=True)

    rnd = 0
    while n_edges > 0 and rnd < 50:
        tr = time.monotonic()
        keyed = edges.select(
            "src", "dst", F.xxhash64(F.lit(42 + rnd), F.col("src"), F.col("dst")).alias("k")
        )
        vmin = (
            keyed.select(F.col("src").alias("id"), "k")
            .unionByName(keyed.select(F.col("dst").alias("id"), "k"))
            .groupBy("id")
            .agg(F.min("k").alias("mk"))
        )
        winner_keys = (
            vmin.groupBy("mk").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2).select(F.col("mk").alias("k"))
        )
        won = keyed.join(winner_keys, "k", "left_semi").select("src", "dst")
        pairs = won.select(F.col("src").alias("id"), F.col("dst").alias("partner")).unionByName(
            won.select(F.col("dst").alias("id"), F.col("src").alias("partner"))
        )
        pairs = _repair_collisions(pairs)
        t1 = time.monotonic()
        pairs = ckpt_p.push(pairs, f"p{rnd}")
        t2 = time.monotonic()
        gone = pairs.select("id")
        obs = Observation()
        edges = ckpt_e.push(
            edges.join(gone.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n")),
            f"e{rnd + 1}",
        )
        ckpt_e.evict_all_but_latest(1)
        t3 = time.monotonic()
        n_edges = obs.get["n"]
        print(
            f"round {rnd}: plan={t1 - tr:.1f}s pairs_write={t2 - t1:.1f}s "
            f"prune_write={t3 - t2:.1f}s edges_left={n_edges}",
            flush=True,
        )
        rnd += 1
    print(f"TOTAL {time.monotonic() - t_all:.1f}s rounds={rnd}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
