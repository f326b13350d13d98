"""Triangle counting and weighted SSSP unit fixtures."""

from pyspark.sql import functions as F

from graphframes_rs_spark import GraphFrame


def _graph(spark, vertices, edges, schema="src long, dst long"):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, schema)
    return GraphFrame(v, e)


def test_triangle_count_basic(spark):
    # triangle 0-1-2 plus a tail 2-3 (the k-core trap graph)
    g = _graph(spark, [0, 1, 2, 3], [(0, 1), (1, 2), (2, 0), (2, 3)])
    out = {r["id"]: r["triangles"] for r in g.triangle_count().collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 0}


def test_triangle_count_direction_and_dupes_ignored(spark):
    # same triangle expressed with reversed/duplicated edges counts once
    g = _graph(spark, [0, 1, 2], [(1, 0), (1, 2), (0, 2), (2, 0), (0, 1)])
    out = {r["id"]: r["triangles"] for r in g.triangle_count().collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_k4(spark):
    # K4 has 4 triangles; every vertex is in 3 of them
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = _graph(spark, list(range(4)), edges)
    out = {r["id"]: r["triangles"] for r in g.triangle_count().collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_weighted_sssp_chain_and_shortcut(spark, ckpt_dir):
    # 0 -> 1 -> 2 cheap path (1 + 1) beats direct 0 -> 2 (5)
    g = _graph(
        spark,
        [0, 1, 2, 3],
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)],
        "src long, dst long, weight double",
    )
    b = g.weighted_shortest_paths(0).set_checkpoint_dir(ckpt_dir)
    out = {r["id"]: r["dist"] for r in b.run().collect()}
    assert out[0] == 0.0
    assert out[1] == 1.0
    assert out[2] == 2.0
    assert out[3] == float("inf")  # unreachable


def test_weighted_sssp_matches_unweighted_on_unit_weights(spark, ckpt_dir):
    edges = [(i, i + 1, 1.0) for i in range(5)]
    g = _graph(spark, list(range(6)), edges, "src long, dst long, weight double")
    w = g.weighted_shortest_paths(0).set_checkpoint_dir(ckpt_dir + "w").run()
    hop = (
        GraphFrame(g.vertices, g.edges.select("src", "dst"))
        .shortest_paths([0])
        .set_checkpoint_dir(ckpt_dir + "h")
        .run()
    )
    joined = w.join(hop, "id").collect()
    for r in joined:
        expected = float(r["dist_0"]) if r["dist_0"] < 2**31 - 1 else float("inf")
        assert r["dist"] == expected


def test_hits_hand_computed(spark, ckpt_dir):
    """Two Jacobi iterations on 1->2, 2->3, 1->3, hand-unrolled:
    a2 = (0, 2, 3), h2 = (3, 2, 0) before normalization."""
    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    hb = GraphFrame(v, e).hits().max_iterations(2)
    got = {
        r["id"]: (r["authority"], r["hub"])
        for r in hb.set_checkpoint_dir(str(ckpt_dir) + "/hits").run().collect()
    }
    assert hb.iterations_ == 2
    want_a = {1: 0.0, 2: 2 / 5, 3: 3 / 5}
    want_h = {1: 3 / 5, 2: 2 / 5, 3: 0.0}
    for vid in (1, 2, 3):
        assert abs(got[vid][0] - want_a[vid]) < 1e-9, (vid, got[vid])
        assert abs(got[vid][1] - want_h[vid]) < 1e-9, (vid, got[vid])
