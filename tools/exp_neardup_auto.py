"""Sweep: blocked-vs-IVF crossover for embedding_near_duplicates.

Pins dedup.AUTO_METHOD_ROW_THRESHOLD (the method="auto" selection rule)
with a measurement instead of a guess — the same discipline as the WCC
doubling-depth sweep (tools/exp_wcc_doubling.py). Both generators run on
identical deterministic embedding tables (the bench SCALE_EMB recipe,
16-dim) at a ladder of row counts; each point records wall for

  * blocked  — exact blocked-BLAS grams, n_blocks=16 (the operator
               default; O(n²·d) total FLOPs, task-bounded)
  * ivf      — IVF-cell-bounded grams at nlist=sqrt(n), nprobe=4,
               fit_points=30 (the bench scale-arm dials; O(n^1.5·d))

Crossover = the first ladder point where ivf's wall beats blocked's.
Below it, exactness is free — auto picks blocked; above it the quadratic
term dominates and auto picks ivf. The asymptotics (n² vs n^1.5 total
FLOPs) guarantee the ordering never flips back above the crossover, so
measuring the ladder once on the bench box pins the constant for every
larger n.

Recorded trajectory (this box, local[32], shuffle=32, 2026-08-15 — the
runs that pinned AUTO_METHOD_ROW_THRESHOLD = 25_000). Main ladder, cold
JVM per process:

    rows     blocked      ivf      winner
    25k        6.0s       5.9s     ~tie (cold-JVM noise)
    50k        5.8s       3.5s     ivf
    100k      17.0s       7.2s     ivf
    200k     158.7s       6.5s     ivf

Fine ladder around the crossover (one warm session, cache cleared
between arms):

    rows     blocked      ivf      winner
    5k         5.1s       6.5s     blocked
    10k        1.6s       3.5s     blocked
    25k        2.6s       2.7s     blocked
    50k        3.9s       3.1s     ivf      <- crossover in (25k, 50k]

The constant is set at 25_000: the last point where the exact generator
measurably wins (IVF's KMeans-fit floor, ~2-3s at these dials, is what
keeps blocked ahead on small corpora), with IVF from 50k up — and the
quadratic side's wall is a cliff, not a slope (17s at 100k, 158.7s at
200k: slightly over 4x per doubling once pair output and spill join the
FLOP term), so erring toward IVF near the tie point is the safe side.
"""

import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphframes_rs_spark.pipeline import dedup  # noqa: E402

THRESHOLD = 0.85  # the bench scale-arm threshold


def make_emb(spark, n):
    # reuse the bench's own table builder (same recipe as the
    # scale_neardup_ivf arms by construction, not by copy — if the bench
    # dials ever change, this sweep measures the same distribution)
    import bench

    bench._prepare_scale_emb_n(spark, n)
    return spark.read.parquet(bench._scale_emb_paths[n])


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("rows,blocked_s,ivf_s,winner", flush=True)
    for n in (5_000, 10_000, 25_000, 50_000, 100_000, 200_000):
        emb = make_emb(spark, n)
        walls = {}
        for method in ("blocked", "ivf"):
            spark.catalog.clearCache()
            kw = dict(method=method)
            if method == "ivf":
                kw.update(
                    nlist=max(int(n**0.5), 2), nprobe=4, fit_points=30
                )
            t0 = time.monotonic()
            out = dedup.embedding_near_duplicates(
                emb, threshold=THRESHOLD, **kw
            )
            out.count()
            walls[method] = round(time.monotonic() - t0, 1)
        winner = "blocked" if walls["blocked"] <= walls["ivf"] else "ivf"
        print(f"{n},{walls['blocked']},{walls['ivf']},{winner}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
