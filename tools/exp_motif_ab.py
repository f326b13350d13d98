"""A/B: settle the r11 `motif_triangles` bench regression (6.13s vs r10's
3.81s — verdict r11 item 1) with interleaved paired sessions instead of
single draws.

Method: the same 7-warm-run loop (first run discarded: AQE/codegen) in a
FRESH session per variant, variants interleaved so box waves hit both.
Variant A = round-10 code (git worktree at the r10 round commit), variant
B = HEAD. Same box, same /root/testdata/sf0.1 data, same session config
(bench._make_session).

Recorded trajectory (this box, local[32], 2026-08-16 — the runs that
closed the item):

    session                 warm walls (s)                      min
    HEAD      #1   6.36 5.45 4.93 4.67 4.55 4.81                4.55
    r10       #1   8.42 6.64 5.16 5.05 8.58 8.28                5.05
    HEAD      #2   7.04 5.77 5.24 5.55 22.16 6.71               5.24
    r10       #2   7.92 8.33 7.56 7.28 6.89 6.57                6.57
    r10       #3   6.71 5.12 5.31 4.70 4.84 5.46                4.70

Conclusion: the distributions fully overlap (HEAD's best min 4.55s is
the best of all five sessions); no r10->r11 code touched the motif path
(`git diff 3a2f027 23b465f` — zero changes to motif.py / graphframe.py /
__spark_entry__.py / config.py) and the r11 6.13s row carried ~2s summed
steal on BOTH its samples. Verdict: box contention, not code. The true
warm cost is ~4.5-5.5s with bandwidth-wave outliers to 22s (visible in
HEAD #2); r10's in-run 3.81s was a quiet-box draw.

Usage: python tools/exp_motif_ab.py [n_runs]   (runs HEAD only; check
out a worktree at the comparison commit and run the same script there
for the paired arm.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    import __spark_entry__ as entry

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    if runs < 2:
        sys.exit("n_runs must be >= 2 (first warm run is discarded)")
    spark = bench._make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    q = entry.queries()["motif_triangles"]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    walls = []
    for _ in range(runs):
        t0 = time.monotonic()
        n = q(spark, sf).count()
        walls.append(round(time.monotonic() - t0, 2))
    print(
        f"walls={walls} min_warm={min(walls[1:]) if len(walls) > 1 else walls[0]}"
        f" rows={n}"
    )


if __name__ == "__main__":
    main()
