"""Greedy (Jones–Plassmann) coloring: proper-coloring invariant,
degree bound, determinism across seeds/partitionings, K4, isolated
vertices, self-loop tolerance."""

import pytest

from graphframes_rs_spark.graphframe import GraphFrame


def _color(spark, ckpt, edges, n_vertices, seed=42, sub="c"):
    v = spark.createDataFrame([(i,) for i in range(1, n_vertices + 1)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    cb = GraphFrame(v, e).greedy_coloring().with_seed(seed)
    out = {
        r["id"]: r["color"]
        for r in cb.set_checkpoint_dir(f"{ckpt}/{sub}{seed}").run().collect()
    }
    return out, cb.iterations_


def _assert_proper(colors, edges):
    assert all(c is not None for c in colors.values())
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d], (s, d, colors)


def test_coloring_k4_uses_four_colors(spark, ckpt_dir):
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    colors, _ = _color(spark, ckpt_dir, edges, 4)
    _assert_proper(colors, edges)
    assert sorted(colors.values()) == [0, 1, 2, 3]


def test_coloring_star_two_colors_and_degree_bound(spark, ckpt_dir):
    edges = [(1, i) for i in range(2, 9)]
    colors, _ = _color(spark, ckpt_dir, edges, 8, sub="star")
    _assert_proper(colors, edges)
    # leaves all share one color; color(v) <= degree(v) (JP guarantee)
    leaf_colors = {colors[i] for i in range(2, 9)}
    assert len(leaf_colors) == 1
    for i in range(2, 9):
        assert colors[i] <= 1
    assert colors[1] <= 7


def test_coloring_deterministic_and_seed_sensitive(spark, ckpt_dir):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    a, _ = _color(spark, ckpt_dir, edges, 4, seed=1, sub="d")
    b, _ = _color(spark, ckpt_dir, edges, 4, seed=1, sub="e")
    assert a == b  # same seed => identical coloring
    _assert_proper(a, edges)
    c, _ = _color(spark, ckpt_dir, edges, 4, seed=2, sub="f")
    _assert_proper(c, edges)


def test_coloring_isolated_and_self_loop(spark, ckpt_dir):
    # vertex 3 isolated, vertex 1 has a self-loop (dropped as non-structural)
    edges = [(1, 1), (1, 2)]
    colors, _ = _color(spark, ckpt_dir, edges, 3, sub="iso")
    assert colors[3] == 0
    assert colors[1] != colors[2]
    assert set(colors.values()) <= {0, 1}
