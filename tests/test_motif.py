"""Motif-finding semantics on hand-built graphs (GraphFrames find parity)."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, GraphFrameError


@pytest.fixture()
def g(spark):
    # 1->2->3->1 triangle, 3->4 tail, 5 isolated, 6->6 self-loop
    v = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 7)], "id long, name string"
    )
    e = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 20), (3, 1, 30), (3, 4, 40), (6, 6, 60)],
        "src long, dst long, w long",
    )
    return GraphFrame(v, e)


def test_single_edge_motif_with_attrs(g):
    rows = g.find("(a)-[e]->(b)").collect()
    assert len(rows) == 5
    by_pair = {(r["a"]["id"], r["b"]["id"]): r for r in rows}
    assert by_pair[(1, 2)]["e"]["w"] == 10
    assert by_pair[(1, 2)]["a"]["name"] == "n1"


def test_chain_motif_unifies_shared_names(g):
    rows = g.find("(a)-[]->(b); (b)-[]->(c)").collect()
    paths = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows}
    # 2-paths incl. through the triangle and into the tail and the self-loop
    assert (1, 2, 3) in paths and (2, 3, 4) in paths and (3, 1, 2) in paths
    assert (2, 3, 1) in paths
    assert (6, 6, 6) in paths  # self-loop chains with itself
    assert all(len(p) == 3 for p in paths)


def test_triangle_motif(g):
    rows = g.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").collect()
    tris = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows}
    # the directed triangle in each rotation; no self-loop triple beyond 6
    assert tris == {(1, 2, 3), (2, 3, 1), (3, 1, 2), (6, 6, 6)}


def test_negation_motif(g):
    # edges with no reverse edge: all of them here except none (triangle is
    # one-directional), so every edge survives; add the check that a
    # reciprocal pair would be removed
    rows = g.find("(a)-[]->(b); !(b)-[]->(a)").collect()
    pairs = {(r["a"]["id"], r["b"]["id"]) for r in rows}
    assert pairs == {(1, 2), (2, 3), (3, 1), (3, 4)}  # 6->6 reciprocates itself


def test_anonymous_vertices_not_in_output(g):
    out = g.find("(a)-[]->()")
    assert out.columns == ["a"]
    assert out.count() == 5


def test_self_loop_motif(g):
    rows = g.find("(a)-[e]->(a)").collect()
    assert len(rows) == 1
    assert rows[0]["a"]["id"] == 6 and rows[0]["e"]["w"] == 60


def test_motif_errors(g):
    with pytest.raises(GraphFrameError, match="unsupported motif term"):
        g.find("(a)->(b)")
    with pytest.raises(GraphFrameError, match="cannot bind an edge name"):
        g.find("(a)-[]->(b); !(b)-[x]->(a)")
    with pytest.raises(GraphFrameError, match="unbound vertex"):
        g.find("(a)-[]->(b); !(b)-[]->(zz)")
    with pytest.raises(GraphFrameError, match="more than one term"):
        g.find("(a)-[e]->(b); (b)-[e]->(c)")
    with pytest.raises(GraphFrameError, match="at least one positive"):
        g.find("!(a)-[]->(b)")


def test_disconnected_components_cross_join(g):
    out = g.find("(a)-[]->(b); (c)-[]->(d)")
    assert out.count() == 25  # 5 edges x 5 edges
