"""Experiment: shuffle-partition granularity on the 54M-edge WCC tier.

Question (round 10): WCC wall scales 6m->18m at 3x edges / ~1.5x wall
(fixed overheads dominate) but 18m->54m at 3x edges / ~4x wall. The
contraction rounds are flat (4/4/4 — wcc_rounds), so the superlinearity
is per-round cost. At the bench's shuffle_n = 32, a 54M-edge exchange
puts ~1.7M rows (~85 MB of (long,long,struct) state) in every task —
is the tier past the granularity where 32-way parallelism stops hiding
stragglers/spill, i.e. would a cluster operator raise partitions here?

Run: python tools/exp_wcc54_partitions.py [tier] [list-of-partition-counts]
Alternates partition counts A/B/A/B so machine drift is visible, prints
wall + rounds per run.

MEASURED (54m tier, local[32], round 10, order 32,64,128,32,64,128):

  shuffle_n=32 : 66.7s then 91.4s   (rounds 4)
  shuffle_n=64 : 89.9s then 109.2s  (rounds 4)
  shuffle_n=128: 137.9s then 79.5s  (rounds 4)

CONCLUSION: no partition-count signal — the within-dial spread (32:
66.7-91.4s, 128: 79.5-137.9s) exceeds any between-dial difference, and
the ordering is not even monotone across the two sweeps; this box's
steal/IO bursts dominate the comparison (see memory: bench-noise
protocol). Two usable facts anyway: (a) the tier is NOT
partition-starved at 32 — if granularity were the bottleneck, 64/128
would have won consistently, and more partitions plainly add
per-round scheduling overhead when they don't; (b) the 66.7s clean-run
sample bounds the tier's true floor well below the 83-91s the bench
artifact has recorded, so the 18m->54m 'superlinearity' (3x edges,
~4x recorded wall) is at least partly measurement noise, not plan
behavior. No bench dial change warranted. On a real cluster the same
experiment is the sizing procedure: raise spark.sql.shuffle.partitions
until the biggest round's per-task input fits executor memory, stop.

ROUND-13 ADDENDUM (2026-08-16, settles the r12 weak item): one
`SPARK_GRAFT_BENCH_ONLY=scale_wcc_54m python bench.py` run on a
calib-quiet box (shuffle probe 0.995s) recorded, in sequence:
  sample 1: 176.5s with 176.2s summed vCPU steal  (burst mid-sample)
  steal-veto rerun: 116.9s with 12.1s steal
  floor-rule rerun: 58.93s with 2.3s steal        <- kept, NEW floor
i.e. the tier swings 59-176s within ONE bench invocation minutes apart,
and the clean cost at HEAD is ~59s — BELOW every wall ever committed
(r10's 81.5s, the builder's r12 99.4s re-measure). Conclusion: the
"81.5 -> 99.4s clean drift" the r12 verdict asked to chase was two
draws from this distribution, not code (no WCC commit since r10, and
HEAD now measures faster than either). The CLEAN_FLOORS table pins
58.9s and the floor rule (>1.5x => confirmation rerun) is the standing
defense — it is the mechanism that FOUND the 58.9s sample.
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (tier generators)


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "54m"
    counts = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [32, 64, 128]
    )
    spark = bench._make_session("32")
    bench._prepare_scale_graph(spark, tier)
    g = bench._scale_graph(spark, tier)

    # warm: one 6m-tier run (codegen/JIT for the WCC plan family), untimed
    bench._prepare_scale_graph(spark, "6m")
    bench._scale_graph(spark, "6m").connected_components().set_checkpoint_dir(
        tempfile.mkdtemp()
    ).run().count()

    base = spark.conf.get("spark.sql.shuffle.partitions")
    for sweep in range(2):  # alternate so drift shows up inside the run
        for n in counts:
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            b = g.connected_components().set_checkpoint_dir(tempfile.mkdtemp())
            t0 = time.monotonic()
            out = b.run()
            cnt = out.count()
            dt = time.monotonic() - t0
            print(
                f"shuffle_n={n}: {dt:.1f}s rounds={b.iterations_} n={cnt}",
                flush=True,
            )
    spark.conf.set("spark.sql.shuffle.partitions", base)


if __name__ == "__main__":
    main()
