"""Measure the k-core change trajectory on skew18m: how many vertices
change estimate per H-index round, and how many are ADJACENT to a change
(the set a frontier-restricted round would recompute)."""

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import symmetrize_edges  # noqa: E402
from graphframes_rs_spark.operators.k_core import kcore_merge_pairs_expr  # noqa: E402
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer  # noqa: E402

V, E, A = 6_000_000, 18_000_000, 4.0


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1 << 30)) + F.lit(0.5)) / F.lit(
        float(1 << 30)
    )
    dst = F.floor(F.lit(V) * F.pow(u, F.lit(A)))
    raw = spark.range(E).select(src.cast("long").alias("src"), dst.cast("long").alias("dst"))

    ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp())
    edges = ckpt.push_partitioned(
        symmetrize_edges(raw, deduplicate=True), "src", int(cpus), "edges"
    )
    est = ckpt.push(
        edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("kcore")),
        "est0",
    )
    print(f"symmetrized edges: {edges.count()}", flush=True)

    for rnd in range(1, 11):
        t0 = time.monotonic()
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
        new_est = est.join(pairs, "id", "left").select(
            "id",
            kcore_merge_pairs_expr(F.col("__pairs"), F.col("kcore")).alias("kcore"),
            (kcore_merge_pairs_expr(F.col("__pairs"), F.col("kcore")) != F.col("kcore")).alias(
                "chg"
            ),
        )
        new_est = ckpt.push(new_est, f"est{rnd}")
        changed = new_est.filter("chg").count()
        # vertices adjacent to a change = what a frontier round recomputes
        chg_src = new_est.filter("chg").select(F.col("id").alias("src"))
        affected_v = edges.join(chg_src, "src", "leftsemi").select("dst").distinct()
        affected = affected_v.count()
        # EDGE rows whose src is affected = the shuffle volume a frontier
        # round still pays; this fraction of 2|E| bounds the saving
        affected_edges = edges.join(
            affected_v.select(F.col("dst").alias("src")), "src", "leftsemi"
        ).count()
        est = new_est.select("id", "kcore")
        print(
            f"round {rnd}: changed={changed} affected_next={affected} "
            f"affected_edges={affected_edges} sec={time.monotonic() - t0:.1f}",
            flush=True,
        )
        if changed == 0:
            break
    spark.stop()


if __name__ == "__main__":
    main()
