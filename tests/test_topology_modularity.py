"""Unit tests for the round-6 graph additions: topological layers,
modularity, and the local clustering coefficient."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame


def _graph(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    if vertices is None:
        ids = sorted({v for pair in edges for v in pair})
    else:
        ids = vertices
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    return GraphFrame(v, e)


# ---------------------------------------------------------------- topology
def test_topological_layers_diamond_chain(spark):
    # diamond 1->{2,3}->4 then chain 4->5: longest-path layers
    g = _graph(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    got = dict(
        (r["id"], r["layer"]) for r in g.topological_layers().run().collect()
    )
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_topological_layers_longest_not_shortest(spark):
    # 1->4 directly but also 1->2->3->4: layer(4) must be 3 (longest), not 1
    g = _graph(spark, [(1, 4), (1, 2), (2, 3), (3, 4)])
    got = dict(
        (r["id"], r["layer"]) for r in g.topological_layers().run().collect()
    )
    assert got[4] == 3


def test_topological_layers_isolated_vertex(spark):
    g = _graph(spark, [(1, 2)], vertices=[1, 2, 9])
    got = dict(
        (r["id"], r["layer"]) for r in g.topological_layers().run().collect()
    )
    assert got == {1: 0, 2: 1, 9: 0}


def test_topological_layers_cycle_detection_raises(spark):
    g = _graph(spark, [(1, 2), (2, 3), (3, 1)])
    b = g.topological_layers().max_iterations(5).detect_cycles()
    with pytest.raises(ValueError, match="cyclic"):
        b.run()


def test_topological_layers_cycle_without_detection_returns(spark):
    # bounded run on a cycle still returns (layers are meaningless but
    # bounded); the flag is what turns it into an error
    g = _graph(spark, [(1, 2), (2, 3), (3, 1)])
    out = g.topological_layers().max_iterations(4).run()
    assert out.count() == 3


# -------------------------------------------------------------- modularity
def test_modularity_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge; communities = the triangles
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "id long, label long",
    )
    row = g.modularity(labels).collect()[0]
    assert row["m_edges"] == 7
    assert row["n_communities"] == 2
    # Q = 2 * (3/7 - (7/14)^2)
    assert row["modularity"] == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-6)


def test_modularity_single_community_is_zero(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3)])
    labels = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "id long, label long"
    )
    row = g.modularity(labels).collect()[0]
    assert row["modularity"] == pytest.approx(0.0, abs=1e-9)


def test_modularity_orientation_invariant(spark):
    # reversed/duplicated orientations score identically (canonicalized)
    e1 = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    e2 = [(b, a) for a, b in e1] + e1
    labels = spark.createDataFrame(
        [(i, 1 if i <= 3 else 2) for i in range(1, 7)], "id long, label long"
    )
    q1 = _graph(spark, e1).modularity(labels).collect()[0]["modularity"]
    q2 = _graph(spark, e2).modularity(labels).collect()[0]["modularity"]
    assert q1 == q2


def test_modularity_missing_labels_are_singletons(spark):
    # vertex 4 unlabelled -> its own singleton community
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "id long, label long"
    )
    row = g.modularity(labels).collect()[0]
    assert row["n_communities"] == 2


# ------------------------------------------------- clustering coefficient
def test_clustering_coefficient_triangle_tail(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {
        r["id"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in g.clustering_coefficient().collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert got[4] == (1, 0, 0.0)


def test_clustering_coefficient_isolated_zero(spark):
    g = _graph(spark, [(1, 2)], vertices=[1, 2, 9])
    got = {r["id"]: r["coefficient"] for r in g.clustering_coefficient().collect()}
    assert got[9] == 0.0


def test_conductance_two_triangles_bridge(spark):
    """Two triangles joined by one bridge: each community has cut 1,
    internal 3, volume 7 -> phi = 1/7. Orientation must not matter."""
    from graphframes_rs_spark.graphframe import GraphFrame

    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(4, 5), (5, 6), (6, 4)]
    bridge = [(3, 4)]
    v = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    e = spark.createDataFrame(tri1 + tri2 + bridge, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 100 if i <= 3 else 200) for i in range(1, 7)], "id long, label long"
    )
    g = GraphFrame(v, e)
    out = {r["label"]: r for r in g.conductance(labels).collect()}
    for lab in (100, 200):
        assert out[lab]["cut_edges"] == 1
        assert out[lab]["internal_edges"] == 3
        assert out[lab]["volume"] == 7
        assert out[lab]["conductance"] == pytest.approx(1 / 7, abs=1e-6)
        assert out[lab]["n_members"] == 3
    # reversed orientation scores identically
    rev = GraphFrame(
        v, e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out2 = {r["label"]: r for r in rev.conductance(labels).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }


def test_conductance_edge_cases(spark):
    """Isolated-members community -> NULL conductance; missing labels form
    singletons; the whole-graph community has cut 0 -> NULL (denom 0
    only when S or its complement has no volume)."""
    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "id long, label long"  # 4 unlabeled
    )
    out = {r["label"]: r for r in GraphFrame(v, e).conductance(labels).collect()}
    # community 7 holds ALL edges: complement volume 0 -> NULL
    assert out[7]["internal_edges"] == 1 and out[7]["cut_edges"] == 0
    assert out[7]["conductance"] is None
    # community 9 and singleton 4: no incident edges at all -> NULL
    assert out[9]["volume"] == 0 and out[9]["conductance"] is None
    assert out[4]["n_members"] == 1 and out[4]["conductance"] is None
