"""Interleaved A/B for the r15 materialize pins at the bench's own scale
tiers: tfidf_topk_terms on the 200k synthetic corpus (the
scale_tfidf_200k row), plus duplicated_ngram_coverage at the sf
documents table with the bench's n=8 (the ngram_dup_coverage row).
Alternates pinned/lazy inside one warm session; count() forces full
execution like the bench.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def steal_ms():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) * 10
    except Exception:
        return 0


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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
        tempfile.tempdir = tempfile.mkdtemp(dir="/dev/shm", prefix="gf_exp_pins_")

    import bench
    from graphframes_rs_spark.pipeline import dedup, text

    bench._prepare_scale_docs(spark)
    docs200k = spark.read.parquet(bench._scale_docs_path[0])
    docs_sf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs200k.limit(5).count(); docs_sf.limit(5).count()

    arms = {
        "tfidf200k_pin": lambda: text.tfidf_topk_terms(docs200k, k=5),
        "tfidf200k_lazy": lambda: text.tfidf_topk_terms(
            docs200k, k=5, materialize=False
        ),
        "ngramcov_pin": lambda: dedup.duplicated_ngram_coverage(docs_sf, n=8),
        "ngramcov_lazy": lambda: dedup.duplicated_ngram_coverage(
            docs_sf, n=8, materialize=False
        ),
    }
    order = ["tfidf200k_pin", "tfidf200k_lazy", "ngramcov_pin", "ngramcov_lazy"]
    # untimed warmup of every arm (codegen)
    for a in order:
        arms[a]().count()
    for i in range(pairs):
        seq = order if i % 2 == 0 else list(reversed(order))
        for a in seq:
            spark.catalog.clearCache()
            jvm = spark.sparkContext._jvm
            jvm.System.gc(); time.sleep(0.5); jvm.System.gc()
            s0, t0 = steal_ms(), time.monotonic()
            n = arms[a]().count()
            print(
                f"SAMPLE arm={a} sec={time.monotonic() - t0:.2f} "
                f"steal_ms={steal_ms() - s0} rows={n}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
