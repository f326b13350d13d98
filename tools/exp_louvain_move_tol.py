"""Experiment: adaptive Louvain move-round stop (with_move_tolerance) on
the 6m bench tier — is the local-moving tail trimmable?

Question (r10 verdict task 2): `scale_louvain_6m` runs a fixed 2-level x
3-move budget at ~45s; the wants-to-move trajectory collapses
geometrically (2.0M -> 1.2M -> 0.65M at level 0) while every round pays a
full edge-scale exchange — the same long-tail shape k-core's
with_change_tolerance (k_core.py) addressed. Added
LouvainBuilder.with_move_tolerance(frac) (stop a level once a round's
pre-gate wants count <= frac·|V_level|) and measured both arms on the 6m
tier (2M vertices / 6M edges), local[32], 2026-08-15:

Arm A — the bench budget (2 levels x 3 moves, no tolerance), wall 63.9s
on this (non-tmpfs, contended) run; same work as the 44.9s bench row:

    move l0: wants 1,995,038 / 1,183,940 / 651,097   (9.7 / 7.1 / 7.5s)
    contract l0: 5,659,553 edges (3.6s)
    move l1: wants 957,478 / 762,071 / 574,721       (6.1 / 6.3 / 5.9s)

Arm B — max_moves=10 with with_move_tolerance(0.02), wall 111.9s:

    move l0: 1,995,038 / 1,183,940 / 651,097 / 341,295 / 173,016 /
             86,121 / 42,579 / 21,030  -> move_tol_stop (21,030 <= 40,000)
    move l1: 787,599 .. 144,931 over 10 rounds (ratio ~0.85/round —
             NO stop: level-1 wants decay far slower than level 0's
             ~0.55/round, and 144,931 >> 0.02·|V_l1|)

Conclusions (why the bench row keeps its fixed budget):

1. The tolerance WORKS and fires where it should — level 0 quiesces to
   ~1% of vertices by round 7 and the stop saves the remaining budget.
2. At the bench's 3-round budget every round is BULK (the smallest round
   still wants 574k moves, 17-29% of its level's vertices): no tolerance
   value trims a round without changing the measured work, so the 6m row
   is not trimmable at its current budget — the k-core precedent's
   "recorded sweep, not trimmable" outcome.
3. Where the dial pays: long-budget runs (the operator DEFAULT
   max_moves=10). Level 0's geometric decay means rounds 8-10 chase
   <1% of vertices at ~5-7s/round; with_move_tolerance(0.02) returns
   that wall for a bounded modularity concession (the skipped vertices
   keep their communities; contraction re-examines those boundaries).
4. Level 1's slow decay (0.85x/round vs level 0's 0.55x) is a real
   phenomenon: contracted super-vertices have higher degree and keep
   finding small positive gains. A tolerance keyed on level-0's shape
   would spin at level 1 — fraction-of-|V_level| handles both because
   |V_l1| << |V_l0|.

Reproduce: python tools/exp_louvain_move_tol.py (takes ~3 min).
"""

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    g = bench._scale_graph(spark, "6m")

    def run(tag, moves, tol):
        b = g.louvain().max_levels(2).max_moves(moves)
        if tol:
            b = b.with_move_tolerance(tol)
        b = b.set_checkpoint_dir(tempfile.mkdtemp())
        t0 = time.monotonic()
        b.run().count()
        print(tag, "wall", round(time.monotonic() - t0, 1),
              "levels", b.levels_, "moves", b.moves_, flush=True)
        for p in b.phase_stats_:
            print("   ", p, flush=True)

    run("A bench-budget (3 moves)", 3, None)
    run("B max10 tol0.02", 10, 0.02)
    spark.stop()


if __name__ == "__main__":
    main()
