"""Isolated scale_matching_6m measurement (round-6 regression check)."""

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.graphframe import GraphFrame  # noqa: E402

V, E = 2_000_000, 6_000_000


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
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
    base = tempfile.mkdtemp(prefix="gf_exp_match_")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(V))
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    g = GraphFrame(
        spark.read.parquet(base + "/vertices"), spark.read.parquet(base + "/edges")
    )
    g.edges.limit(10).count()
    for rep in range(int(os.environ.get("EXP_REPS", "2"))):
        spark.catalog.clearCache()
        jvm = spark.sparkContext._jvm
        jvm.System.gc(); time.sleep(1.0); jvm.System.gc()
        t0 = time.monotonic()
        b = g.maximal_matching().set_checkpoint_dir(tempfile.mkdtemp())
        n = b.run().count()
        print(
            f"RESULT rep={rep} sec={time.monotonic() - t0:.1f} rows={n} "
            f"rounds={b.iterations_}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
