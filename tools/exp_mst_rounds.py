"""Per-round, per-stage timing of the Boruvka MST loop on the 6M bench
tier: is the min(struct) SortAggregate (chosen edges) the cost, or the
relabel joins / writes?"""

import os
import sys
import tempfile
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import GraphFrame  # noqa: E402

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
    w = (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1 << 20))).cast("double")
    base = tempfile.mkdtemp(prefix="gf_exp_mst_")
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst"), w.alias("weight")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    g = GraphFrame(
        spark.read.parquet(base + "/vertices"), spark.read.parquet(base + "/edges")
    )
    g.edges.limit(10).count()

    # isolate the round-1 chosen-edge aggregate in both forms
    e = g.edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("w")
    )
    sel = e.select(F.col("u").alias("c"), F.col("v").alias("other"), "w", "u", "v").unionByName(
        e.select(F.col("v").alias("c"), F.col("u").alias("other"), "w", "u", "v")
    )
    for name, agg in (
        ("struct_min", sel.groupBy("c").agg(F.min(F.struct("w", "u", "v", "other")).alias("m"))),
        ("min_w_only", sel.groupBy("c").agg(F.min("w").alias("mw"))),
    ):
        for rep in range(2):
            t0 = time.monotonic()
            n = agg.count()
            print(f"agg {name} rep={rep}: {time.monotonic() - t0:.1f}s rows={n}", flush=True)

    for rep in range(2):
        t0 = time.monotonic()
        out = g.minimum_spanning_forest().set_checkpoint_dir(tempfile.mkdtemp()).run() \
            if hasattr(g, "minimum_spanning_forest") else None
        if out is None:
            from graphframes_rs_spark.operators.mst import MSTBuilder
            out = MSTBuilder(g).set_checkpoint_dir(tempfile.mkdtemp()).run()
        n = out.count()
        print(f"full mst rep={rep}: {time.monotonic() - t0:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
