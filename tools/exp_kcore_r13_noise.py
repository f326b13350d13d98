"""Recorded experiment: the r13 k-core elevation is environment, not code.

Observation (r13 builder runs 1 and 2, same HEAD, ~1h apart):

    tier              r12 driver   r13 run1   r13 run2   CLEAN_FLOOR
    scale_kcore_6m        17.7       20.9       24.6        17.7
    scale_kcore_18m       30.9       37.5       39.5        30.9
    scale_kcore_skew18m   32.5       36.9       45.2        32.5

All three elevated in BOTH independent runs with low per-row steal
(0.4-2.7s) — superficially the same "two elevated runs, low steal"
pattern that made scale_matching_6m a real finding in r12. The
classification evidence is in the artifact itself this time:
BENCH_DETAIL's per-round ``kcore_stats`` shows

* ``round_changes`` BIT-IDENTICAL between the committed r12 driver run
  and r13 run 2 (e.g. 18m: [3933392, 2180422, 949008, 713176, 761984,
  575049, 113375] in both) — the deterministic H-index trajectory has
  zero drift, so the operator is executing exactly the same work, same
  rounds, same row counts; and
* ``round_seconds`` inflated UNIFORMLY across every round, not in one
  round (6m: [1.77, 2.38, 2.15, 1.97, 2.10, 2.02, 1.94] r12 ->
  [3.95, 3.47, 2.71, 2.64, 2.71, 2.59, 2.39] r13 run 2; skew18m:
  [4.3 .. 3.2] -> [7.9 .. 4.6]).

Uniform per-round inflation on provably identical work is the box's
second contention mode (sustained memory/IO-bandwidth degradation with
<1% steal — see the calib-probe machinery in bench.py), not a plan or
code regression: no r13 commit touches operators/k_core.py, pregel.py,
or plans/checkpointer.py (git log --oneline a0395a2..HEAD -- those
paths is empty). Same evening, scale_wcc_54m drew 158s/151.6s/109s
within one run (157.9s steal on the first draw) while run 1 an hour
earlier measured it at 81.6s with 2.6s steal — the wave recurs.

Verdict: keep the r12-level CLEAN_FLOORS for the k-core family (17.7 /
30.9 / 32.5); do not chase the r13 walls. If a FUTURE round shows
elevated k-core walls WITH changed round_seconds shape (one round
ballooning) or changed round_changes, that is a real finding — this
experiment is the template for separating the two cases.

Direct confirmation (same evening, ~1h after run 2): standalone warm
kcore_18m with the bench's exact callable and scratch topology —
calib-before 9.95s (wave still active), walls 106.9 / 36.5 / 31.6 /
33.2s as the wave passed, calib-after 0.726s (quiet). min warm 31.62s
== the 30.9s floor within noise, on byte-identical code. Environment
confirmed; the 106.9s first draw doubles as a sample of what the wave
does to this tier.
"""

if __name__ == "__main__":
    print(__doc__)
