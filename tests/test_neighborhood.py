"""Neighborhood function (FM sketches): exact register agreement with a
pure-python replay of the OR-merge closure, early-stop voting, and the
estimate's integer derivation."""

import hashlib
from collections import defaultdict

import pytest

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.neighborhood import FM_PHI

EDGES = [
    (1, 2), (2, 3), (3, 4),      # chain
    (5, 6), (6, 5),              # 2-cycle
    (1, 7),                      # branch
]
VERTICES = list(range(1, 9))     # 8 isolated


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(radius, k, seed):
    adj = defaultdict(set)
    for s, d in EDGES:
        adj[s].add(d)
    masks = {
        v: [
            (h := _h60(f"{v}|{i}|{seed}")) & -h
            for i in range(k)
        ]
        for v in VERTICES
    }
    for _ in range(radius):
        nxt = {}
        for v in VERTICES:
            regs = list(masks[v])
            for w in adj[v]:
                for i in range(k):
                    regs[i] |= masks[w][i]
            nxt[v] = regs
        if nxt == masks:
            break
        masks = nxt
    return masks


def _est(regs):
    rs = [bin(m ^ (m + 1)).count("1") - 1 for m in regs]
    return 2.0 ** (sum(rs) / len(rs)) / FM_PHI


def _run(spark, radius, k, seed):
    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    b = (
        GraphFrame(v, e)
        .neighborhood_function()
        .max_radius(radius)
        .with_registers(k)
        .with_seed(seed)
    )
    rows = b.run().collect()
    return b, {r["id"]: r for r in rows}


def test_registers_match_pure_python_replay(spark):
    for seed in (42, 7):
        _, got = _run(spark, radius=4, k=4, seed=seed)
        want = _replay(4, 4, seed)
        for v in VERTICES:
            regs = [got[v][f"reg_{i}"] for i in range(4)]
            assert regs == want[v], (seed, v)
            assert got[v]["nf_est"] == pytest.approx(_est(regs))


def test_early_stop_and_isolated(spark):
    # diameter 3 (chain 1->2->3->4): masks close by round 3, one extra
    # no-change round votes halt before the radius-8 budget
    b, got = _run(spark, radius=8, k=4, seed=42)
    assert b.iterations_ <= 5
    # isolated vertex: sketch of {8} alone — estimate is the 1-element FM
    regs8 = [got[8][f"reg_{i}"] for i in range(4)]
    assert got[8]["nf_est"] == pytest.approx(_est(regs8))


def test_estimates_are_plausible_on_a_star(spark):
    # hub -> 200 leaves: N(hub) = 201, N(leaf) = 1; with k=32 registers
    # the FM estimate must separate the two by an order of magnitude
    n = 200
    v = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    e = spark.createDataFrame([(0, i) for i in range(1, n + 1)], "src long, dst long")
    out = (
        GraphFrame(v, e)
        .neighborhood_function()
        .max_radius(2)
        .with_registers(32)
        .run()
        .collect()
    )
    by_id = {r["id"]: r["nf_est"] for r in out}
    assert by_id[0] > 10 * by_id[1]
    assert 40 < by_id[0] < 1000  # ±~35%/sqrt-ish band around 201, generous


def test_validation(spark):
    v = spark.createDataFrame([(1,)], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    g = GraphFrame(v, e)
    with pytest.raises(ValueError):
        g.neighborhood_function().max_radius(0)
    with pytest.raises(ValueError):
        g.neighborhood_function().with_registers(0)


def _replay_history(radius, k, seed):
    """Per-round global estimate sums, replaying the exact engine math."""
    adj = defaultdict(set)
    for s, d in EDGES:
        adj[s].add(d)
    masks = {
        v: [(h := _h60(f"{v}|{i}|{seed}")) & -h for i in range(k)]
        for v in VERTICES
    }
    sums = [sum(_est(m) for m in masks.values())]
    for _ in range(radius):
        nxt = {}
        changed = False
        for v in VERTICES:
            regs = list(masks[v])
            for w in adj[v]:
                for i in range(k):
                    regs[i] |= masks[w][i]
            if regs != masks[v]:
                changed = True
            nxt[v] = regs
        masks = nxt
        sums.append(sum(_est(m) for m in masks.values()))
        if not changed:
            break
    return sums


def test_effective_diameter_matches_replay(spark):
    from graphframes_rs_spark.operators.neighborhood import effective_diameter

    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    g = GraphFrame(v, e)
    row = effective_diameter(
        g, ratio=0.9, max_radius=8, num_registers=4, seed=42
    ).collect()[0]
    sums = _replay_history(8, 4, 42)
    total = sums[-1]
    want_t = next(t for t, s in enumerate(sums) if s >= 0.9 * total)
    assert row["effective_diameter"] == want_t
    assert row["total_pairs_est"] == pytest.approx(total, rel=1e-6)
    assert row["n_pairs_est"] == pytest.approx(sums[want_t], rel=1e-6)


def test_history_trail_is_monotone(spark):
    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    out = (
        GraphFrame(v, e)
        .neighborhood_function()
        .max_radius(6)
        .with_registers(4)
        .with_history()
        .run()
        .collect()
    )
    for r in out:
        hist = r["nf_hist"]
        assert hist[-1] == pytest.approx(r["nf_est"])
        assert all(a <= b + 1e-9 for a, b in zip(hist, hist[1:]))
