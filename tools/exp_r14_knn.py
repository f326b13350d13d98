#!/usr/bin/env python
"""r14 interleaved A/B: knn_graph symmetrization — old (directed
unionByName re-select of itself: the ANN scoring pass `nn` is a
two-consumer subtree, executed twice per action) vs new (both edge
orientations exploded from ONE pass over the ANN result).

Row-identical by construction (same multiset into groupBy(src,dst).max).
Verified with a full row checksum, untimed.

Usage: python tools/exp_r14_knn.py [pairs]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

bench._init_ram_tmp()
spark = bench._make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench._warm_session(spark, sf_dir)

from graphframes_rs_spark.pipeline import similarity

emb = (
    spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    .select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
)


def knn_old(k=3):
    """Pre-r14 knn_graph tail: self-union of the directed edge list
    (verbatim copy) — `nn` consumed twice."""
    nn = similarity.cosine_topk_blas(
        emb, emb, k=k, vec_col="embedding", id_col="vec_id"
    )
    directed = nn.select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "cosine",
    )
    return (
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "cosine"
            )
        )
        .groupBy("src", "dst")
        .agg(F.max("cosine").alias("cosine"))
    )


def knn_new(k=3):
    nn = similarity.cosine_topk_blas(
        emb, emb, k=k, vec_col="embedding", id_col="vec_id"
    )
    directed = nn.select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "cosine",
    )
    return (
        directed.select(
            F.explode(
                F.array(
                    F.struct("src", "dst", "cosine"),
                    F.struct(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        F.col("cosine").alias("cosine"),
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst", "__e.cosine")
        .groupBy("src", "dst")
        .agg(F.max("cosine").alias("cosine"))
    )


def checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("src", "dst", F.round("cosine", 6)).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).collect()[0]


c_old = checksum(knn_old(k=3))
c_new = checksum(knn_new(k=3))
print(f"# checksum old={tuple(c_old)} new={tuple(c_new)}", flush=True)
assert tuple(c_old) == tuple(c_new), "OLD/NEW OUTPUTS DIFFER — ABORT"

ARMS = {
    "old": lambda: knn_old(k=3),
    "new": lambda: knn_new(k=3),
}
results = {a: [] for a in ARMS}
order = list(ARMS.items())
for p in range(PAIRS):
    rot = order[p % len(order):] + order[:p % len(order)]
    for label, build in rot:
        spark.catalog.clearCache()
        s0 = bench._steal_ms()
        t0 = time.monotonic()
        n = build().count()
        wall = round(time.monotonic() - t0, 2)
        steal = bench._steal_ms() - s0
        results[label].append((wall, steal))
        print(f"# knn {label} pair{p}: {wall}s steal={steal}ms rows={n}",
              flush=True)

for label, rs in results.items():
    w = [x for x, _ in rs]
    print(f"== knn {label}: min={min(w)} all={rs}", flush=True)

spark.stop()
if bench._RAM_TMP_BASE is not None:
    shutil.rmtree(bench._RAM_TMP_BASE, ignore_errors=True)
