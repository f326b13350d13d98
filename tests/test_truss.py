"""k-truss: clique closed forms, the peeling cascade, direction/dup
insensitivity, and the k >= 3 contract."""

import pytest

from graphframes_rs_spark.graphframe import GraphFrame


def _truss(spark, ckpt, edges, n, k, sub):
    v = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    b = GraphFrame(v, e).k_truss(k).set_checkpoint_dir(f"{ckpt}/{sub}")
    out = sorted(
        (r["src"], r["dst"], r["support"]) for r in b.run().collect()
    )
    return out, b


K4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]


def test_k4_is_a_4_truss(spark, ckpt_dir):
    out, _ = _truss(spark, ckpt_dir, K4, 4, 4, "k4")
    assert [(s, d) for s, d, _ in out] == K4
    assert all(sup == 2 for _, _, sup in out)  # each K4 edge: 2 triangles


def test_k4_has_no_5_truss(spark, ckpt_dir):
    out, _ = _truss(spark, ckpt_dir, K4, 4, 5, "k5")
    assert out == []


def test_peeling_cascade(spark, ckpt_dir):
    """Two triangles sharing edge (2,3): for k=4 the shared edge survives
    round 1 (support 2) but its triangles die with the other edges, so it
    peels in round 2 — the cascade a single-pass filter would miss."""
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out, b = _truss(spark, ckpt_dir, edges, 4, 4, "cascade")
    assert out == []
    assert b.iterations_ >= 2
    # k=3 keeps everything: every edge closes at least one triangle
    out3, _ = _truss(spark, ckpt_dir, edges, 4, 3, "cascade3")
    assert [(s, d) for s, d, _ in out3] == sorted(edges)


def test_direction_and_duplicates_ignored(spark, ckpt_dir):
    """Reversed and duplicated edges collapse to the same undirected
    simple triangle."""
    edges = [(2, 1), (1, 3), (3, 2), (2, 1), (1, 1)]
    out, _ = _truss(spark, ckpt_dir, edges, 3, 3, "dirs")
    assert [(s, d) for s, d, _ in out] == [(1, 2), (1, 3), (2, 3)]
    assert all(sup == 1 for _, _, sup in out)


def test_k_truss_rejects_small_k(spark):
    v = spark.createDataFrame([(1,)], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        GraphFrame(v, e).k_truss(2)
