"""Katz centrality and densest-subgraph peeling semantics.

Katz is pinned against hand-computed truncated-series values on a path
and a star; densest-subgraph against a planted clique+path construction
where the 2(1+ε) peel provably isolates the clique, plus invariant
checks (returned density equals the induced subgraph's real density).
"""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, GraphFrameError


def _graph(spark, edges, n):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return GraphFrame(v, e)


def _katz_dict(g, ckpt_dir, iters=3, alpha=0.1, beta=1.0):
    out = (
        g.katz_centrality()
        .max_iterations(iters)
        .alpha(alpha)
        .beta(beta)
        .set_checkpoint_dir(ckpt_dir)
        .run()
    )
    return {r["id"]: r["katz"] for r in out.collect()}


def test_katz_path_hand_computed(spark, ckpt_dir):
    # 0 -> 1 -> 2, alpha=0.1, beta=1:
    # x1 = [1, 1.1, 1.1]; x2 = [1, 1.1, 1.11]; x3 = [1, 1.1, 1.11] (fixpoint)
    g = _graph(spark, [(0, 1), (1, 2)], 3)
    got = _katz_dict(g, ckpt_dir, iters=3)
    assert got == {0: 1.0, 1: 1.1, 2: 1.11}


def test_katz_star_indegree_dominates(spark, ckpt_dir):
    # hub 0 receives from 1..4: x(0) = 1 + 4*0.1*1 = 1.4 after round 1,
    # stable thereafter (leaves have no in-edges, stay at beta)
    g = _graph(spark, [(i, 0) for i in range(1, 5)], 5)
    got = _katz_dict(g, ckpt_dir, iters=4)
    assert got[0] == 1.4
    assert all(got[i] == 1.0 for i in range(1, 5))


def test_katz_full_score_not_split(spark, ckpt_dir):
    # PageRank contrast: a hub with out-degree 2 transmits its FULL score
    # on each edge — both sinks get beta + alpha*beta, not half each
    g = _graph(spark, [(0, 1), (0, 2)], 3)
    got = _katz_dict(g, ckpt_dir, iters=2)
    assert got[1] == got[2] == 1.1


def test_katz_cycle_series_accumulates(spark, ckpt_dir):
    # 2-cycle: x_t = 1 + a + a^2 + ... + a^t for both vertices
    g = _graph(spark, [(0, 1), (1, 0)], 2)
    got = _katz_dict(g, ckpt_dir, iters=3)
    assert got[0] == got[1] == pytest.approx(1.111, abs=1e-9)


def _densest(g, ckpt_dir, eps=0.1):
    return (
        g.densest_subgraph()
        .epsilon(eps)
        .set_checkpoint_dir(ckpt_dir)
        .run()
    )


def test_densest_planted_clique_vs_path(spark, ckpt_dir):
    # K6 on ids 0..5 (density 2.5) + a 30-vertex path (density ~1):
    # round-1 threshold 2(1+.1)rho kills every path vertex (deg <= 2),
    # the clique snapshot wins with exact density (6*5/2)/6 = 2.5
    clique = [(a, b) for a in range(6) for b in range(6) if a < b]
    path = [(i, i + 1) for i in range(6, 36)]
    g = _graph(spark, clique + path, 37)
    out = _densest(g, ckpt_dir)
    rows = out.collect()
    assert sorted(r["id"] for r in rows) == list(range(6))
    assert all(r["density"] == 2.5 for r in rows)


def test_densest_single_clique_returned_whole(spark, ckpt_dir):
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    g = _graph(spark, clique, 5)
    out = _densest(g, ckpt_dir)
    assert sorted(r["id"] for r in out.collect()) == list(range(5))
    assert out.collect()[0]["density"] == 2.0


def test_densest_direction_and_duplicates_ignored(spark, ckpt_dir):
    # same pair in both directions + repeats count once
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0)]
    g = _graph(spark, edges, 3)
    out = _densest(g, ckpt_dir)
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2]
    assert out.collect()[0]["density"] == 1.0


def test_densest_empty_graph_raises(spark, ckpt_dir):
    g = _graph(spark, [], 4)
    with pytest.raises(GraphFrameError, match="no edges"):
        _densest(g, ckpt_dir)


def test_densest_density_is_true_induced_density(spark, ckpt_dir):
    # invariant on an arbitrary graph: recompute the induced density of
    # the returned set and compare to the reported constant
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (5, 0), (5, 1)]
    g = _graph(spark, edges, 6)
    out = _densest(g, ckpt_dir, eps=0.01)
    ids = {r["id"] for r in out.collect()}
    reported = out.collect()[0]["density"]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    m = sum(1 for a, b in und if a in ids and b in ids)
    assert reported == pytest.approx(m / len(ids), abs=1e-6)
