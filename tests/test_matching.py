"""Maximal-matching semantics: symmetry, disjointness, maximality,
determinism, and the vertex-cover corollary."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.matching import vertex_cover_2approx


def _graph(spark, edges, n):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return GraphFrame(v, e)


def _match(g, ckpt_dir, seed=42):
    return (
        g.maximal_matching()
        .with_random_seed(seed)
        .set_checkpoint_dir(ckpt_dir)
        .run()
    )


def _assert_valid_matching(edges, rows):
    pairs = {(r["id"], r["partner"]) for r in rows}
    ids = [r["id"] for r in rows]
    # symmetric + one partner per vertex
    assert all((b, a) in pairs for a, b in pairs)
    assert len(ids) == len(set(ids))
    # every matched pair is a real edge
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    assert all((min(a, b), max(a, b)) in und for a, b in pairs)
    # maximality: no edge with both endpoints unmatched
    m = set(ids)
    assert all(a in m or b in m for a, b in und)


def test_matching_single_edge(spark, ckpt_dir):
    g = _graph(spark, [(0, 1)], 2)
    rows = _match(g, ckpt_dir).collect()
    assert {(r["id"], r["partner"]) for r in rows} == {(0, 1), (1, 0)}


def test_matching_triangle_matches_one_edge(spark, ckpt_dir):
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)], 3)
    rows = _match(g, ckpt_dir).collect()
    assert len(rows) == 2  # exactly one matched edge
    _assert_valid_matching([(0, 1), (1, 2), (2, 0)], rows)


def test_matching_path_and_star_invariants(spark, ckpt_dir):
    edges = [(i, i + 1) for i in range(9)] + [(20, x) for x in (21, 22, 23)]
    g = _graph(spark, edges, 24)
    rows = _match(g, ckpt_dir).collect()
    _assert_valid_matching(edges, rows)
    # a star matches exactly one of its spokes
    assert sum(1 for r in rows if r["id"] == 20) == 1


def test_matching_deterministic_per_seed(spark, ckpt_dir, tmp_path):
    edges = [(i, j) for i in range(8) for j in range(8) if i < j and (i + j) % 3]
    g = _graph(spark, edges, 8)
    a = sorted(map(tuple, _match(g, str(tmp_path / "a"), seed=7).collect()))
    b = sorted(map(tuple, _match(g, str(tmp_path / "b"), seed=7).collect()))
    c = sorted(map(tuple, _match(g, str(tmp_path / "c"), seed=8).collect()))
    assert a == b
    _assert_valid_matching(edges, _match(g, str(tmp_path / "d"), seed=8).collect())
    assert isinstance(c, list)


def test_matching_empty_graph(spark, ckpt_dir):
    g = _graph(spark, [], 3)
    assert _match(g, ckpt_dir).count() == 0


def test_vertex_cover_covers_every_edge(spark, ckpt_dir):
    edges = [(i, (i * 3 + 1) % 12) for i in range(12)] + [(0, 6), (2, 9)]
    edges = [(a, b) for a, b in edges if a != b]
    g = _graph(spark, edges, 12)
    cover = {r["id"] for r in vertex_cover_2approx(g, checkpoint_dir=ckpt_dir).collect()}
    assert all(a in cover or b in cover for a, b in edges)


def test_collision_repair_drops_conflicted_pairs(spark):
    """A vertex holding two partners (64-bit key collision between two
    adjacent winning edges) must be fully retracted — both directions of
    both bad edges — while unrelated matches survive."""
    from graphframes_rs_spark.operators.matching import _repair_collisions

    pairs = spark.createDataFrame(
        # conflicted: vertex 1 matched to both 2 and 3; clean: 10-11
        [(1, 2), (2, 1), (1, 3), (3, 1), (10, 11), (11, 10)],
        "id long, partner long",
    )
    out = sorted((r["id"], r["partner"]) for r in _repair_collisions(pairs).collect())
    assert out == [(10, 11), (11, 10)]
