"""Measure the Louvain move-round trade (VERDICT r14 task 8): the r14
round shape repartitions RAW neighbour messages on v (one edge-scale
exchange, no map-side combine); once communities coalesce, the combined
form (groupBy(v,uc) with map-side combine, then a candidate-scale
repartition onto v) shuffles fewer rows.

This tool measures, per move round on the 6m bench tier:
  * messages  = rows a raw-form v-exchange carries (edge-scale constant);
  * pairs     = distinct (v,uc) — rows the combined form's two exchanges
                carry (pairs into the agg exchange after map-side combine
                is <= pairs per map partition; pairs out of it exactly);
  * ratio     = messages / pairs — the compression the raw form forgoes;
and interleaved walls of raw vs combined vs ADAPTIVE (combine from round
1 on: round 0 starts from singleton communities, where multiplicity is
provably ~1 and the combine buys nothing).

Rows/moves are asserted identical across forms.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame


def steal_ms():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) * 10
    except Exception:
        return 0


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    V, E = 2_000_000, 6_000_000
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
        tempfile.tempdir = tempfile.mkdtemp(dir="/dev/shm", prefix="gf_exp_lv_")
    base = tempfile.mkdtemp(prefix="gf_r15lv_")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(V))
    dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(V))
    spark.range(E).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    ).write.mode("overwrite").parquet(base + "/edges")
    spark.range(V).write.mode("overwrite").parquet(base + "/vertices")
    vertices = spark.read.parquet(base + "/vertices")
    edges = spark.read.parquet(base + "/edges")

    mode_env = os.environ.get("EXP_MODES", "adaptive,raw")
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from graphframes_rs_spark.operators import louvain as lv

    MODES = {"raw": 10**9, "combined": 0, "adaptive": 1}

    def run(mode):
        lv.COMBINE_FROM_ROUND = MODES[mode]
        g = GraphFrame(vertices, edges)
        b = (
            g.louvain().max_levels(2).max_moves(3)
            .set_checkpoint_dir(tempfile.mkdtemp())
        )
        out = b.run()
        n = out.count()
        return n, b

    if os.environ.get("EXP_MULTIPLICITY") == "1":
        # one instrumented pass: per move round, messages vs distinct pairs
        lv.PROBE_MULTIPLICITY = True
        n, b = run("raw")
        print("PHASES", b.phase_stats_, flush=True)
        print("MULT", lv._MULTIPLICITY_PROBE, flush=True)
        lv.PROBE_MULTIPLICITY = False

    ref = None
    for i in range(pairs):
        modes = mode_env.split(",")
        if i % 2 == 1:
            modes = list(reversed(modes))
        for mode in modes:
            spark.catalog.clearCache()
            jvm = spark.sparkContext._jvm
            jvm.System.gc(); time.sleep(1.0); jvm.System.gc()
            s0, t0 = steal_ms(), time.monotonic()
            n, b = run(mode)
            print(
                f"SAMPLE mode={mode} sec={time.monotonic() - t0:.1f} "
                f"steal_ms={steal_ms() - s0} rows={n} moves={b.moves_} "
                f"levels={b.levels_}",
                flush=True,
            )
            if ref is None:
                ref = (n, b.moves_)
            else:
                assert (n, b.moves_) == ref, (mode, n, b.moves_, ref)
    spark.stop()


if __name__ == "__main__":
    main()
