"""Connected-components unit fixtures (reference connected_components.rs)."""

from graphframes_rs_spark import GraphFrame


def _wcc(spark, ckpt_dir, vertices, edges, **kw):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    b = GraphFrame(v, e).connected_components().set_checkpoint_dir(ckpt_dir)
    for k, val in kw.items():
        getattr(b, f"with_{k}")(val)
    return {r["id"]: r["component"] for r in b.run().collect()}


def test_two_components(spark, ckpt_dir):
    """{1,2,3} ∪ {10,11} (connected_components.rs:601-647)."""
    out = _wcc(spark, ckpt_dir, [1, 2, 3, 10, 11], [(1, 2), (2, 3), (10, 11)])
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_direction_ignored(spark, ckpt_dir):
    out = _wcc(spark, ckpt_dir, [1, 2, 3], [(3, 1), (2, 3)])
    assert out == {1: 1, 2: 1, 3: 1}


def test_isolated_vertices_own_component(spark, ckpt_dir):
    out = _wcc(spark, ckpt_dir, [1, 2, 5, 7], [(1, 2)])
    assert out == {1: 1, 2: 1, 5: 5, 7: 7}


def test_empty_graph(spark, ckpt_dir):
    assert _wcc(spark, ckpt_dir, [], []) == {}


def test_self_loop(spark, ckpt_dir):
    out = _wcc(spark, ckpt_dir, [1, 2], [(1, 1), (1, 2)])
    assert out == {1: 1, 2: 1}


def test_seed_independence_of_labels(spark, ckpt_dir):
    """Min-label output must not depend on the hash seed."""
    edges = [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (8, 9)]
    vertices = list(range(1, 10))
    a = _wcc(spark, ckpt_dir + "a", vertices, edges, random_seed=1)
    b = _wcc(spark, ckpt_dir + "b", vertices, edges, random_seed=999)
    assert a == b == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6, 9: 6}


def test_distributed_contraction_path(spark, ckpt_dir):
    """Force the distributed contraction rounds (local finisher disabled by
    a zero threshold) and check they produce the same components as the
    default local-finish path — a long chain needs several rounds."""
    from graphframes_rs_spark.operators.connected_components import (
        LOCAL_FINISH_EDGES,
    )

    vertices = list(range(0, 40))
    edges = [(i, i + 1) for i in range(0, 19)] + [(i, i + 1) for i in range(20, 39)]
    expected = {i: (0 if i < 20 else 20) for i in vertices}
    spark.conf.set(LOCAL_FINISH_EDGES, "0")
    try:
        out = _wcc(spark, ckpt_dir, vertices, edges)
    finally:
        spark.conf.unset(LOCAL_FINISH_EDGES)
    assert out == expected
    assert _wcc(spark, ckpt_dir + "l", vertices, edges) == expected
