"""Core GraphFrame tests, mirroring reference src/lib.rs:374-696."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphframes_rs_spark import GraphFrame
from graphframes_rs_spark.graphframe import GraphFrameError, symmetrize_edges


def hub_graph(spark):
    """10 vertices; vertex 1 fans out to all others + some extra edges
    (reference hub fixture, src/lib.rs:381-397)."""
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 11)], "id long, name string"
    )
    edges = [(1, d) for d in range(2, 11)] + [
        (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9), (9, 10), (10, 2),
        (2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1),
        (2, 4), (4, 6), (6, 8),
    ]
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    return GraphFrame(vertices, edges_df), edges


def test_counts(spark):
    g, edges = hub_graph(spark)
    assert g.num_nodes() == 10
    assert g.num_edges() == len(edges)


def test_degrees(spark):
    g, edges = hub_graph(spark)
    out_deg = {r["id"]: r["out_degree"] for r in g.out_degrees.collect()}
    in_deg = {r["id"]: r["in_degree"] for r in g.in_degrees.collect()}
    deg = {r["id"]: r["degree"] for r in g.degrees.collect()}
    for v in range(1, 11):
        expected_out = sum(1 for s, _ in edges if s == v)
        expected_in = sum(1 for _, d in edges if d == v)
        assert out_deg.get(v, 0) == expected_out
        assert in_deg.get(v, 0) == expected_in
        assert deg.get(v, 0) == expected_in + expected_out


def test_constructor_rejects_wrong_types(spark):
    v_bad = spark.createDataFrame([(1,)], "id int")
    e_ok = spark.createDataFrame([(1, 2)], "src long, dst long")
    v_ok = spark.createDataFrame([(1,)], "id long")
    e_bad = spark.createDataFrame([(1, 2)], "src long, dst int")
    with pytest.raises(GraphFrameError):
        GraphFrame(v_bad, e_ok)
    with pytest.raises(GraphFrameError):
        GraphFrame(v_ok, e_bad)
    with pytest.raises(GraphFrameError):
        GraphFrame(spark.createDataFrame([(1,)], "vertex long"), e_ok)


def test_symmetrize_method_preserves_attrs_and_order(spark):
    v = spark.createDataFrame([(1,), (2,)], "id long")
    e = spark.createDataFrame(
        [(1, 2, 0.5, "a")], "src long, dst long, weight double, label string"
    )
    g = GraphFrame(v, e).symmetrize()
    assert g.edges.columns == ["src", "dst", "weight", "label"]
    rows = sorted(
        [(r["src"], r["dst"], r["weight"], r["label"]) for r in g.edges.collect()]
    )
    assert rows == [(1, 2, 0.5, "a"), (2, 1, 0.5, "a")]


def test_symmetrize_util_simple_undirected(spark):
    # self-loop dropped, reciprocal pair deduplicated
    e = spark.createDataFrame([(1, 1), (1, 2), (2, 1), (2, 3)], "src long, dst long")
    out = sorted(
        [(r["src"], r["dst"]) for r in symmetrize_edges(e, deduplicate=True).collect()]
    )
    assert out == [(1, 2), (2, 1), (2, 3), (3, 2)]


def test_triplets_three_cycle(spark):
    """3-cycle with string attrs pins the struct schema
    (reference src/lib.rs:492-536)."""
    v = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, name string")
    e = spark.createDataFrame(
        [(1, 3, "x"), (2, 1, "y"), (3, 2, "z")], "src long, dst long, label string"
    )
    t = GraphFrame(v, e).triplets()
    assert t.columns == ["src_vertex", "edge", "dst_vertex"]
    assert t.count() == 3
    rows = {
        (r["edge"]["src"], r["edge"]["dst"]): r
        for r in t.collect()
    }
    assert rows[(1, 3)]["src_vertex"]["name"] == "a"
    assert rows[(1, 3)]["dst_vertex"]["name"] == "c"
    assert rows[(1, 3)]["edge"]["label"] == "x"
    # struct field sets
    assert set(t.schema["src_vertex"].dataType.fieldNames()) == {"id", "name"}
    assert set(t.schema["edge"].dataType.fieldNames()) == {"src", "dst", "label"}


def test_triplets_missing_vertex_is_null_struct(spark):
    v = spark.createDataFrame([(1, "a")], "id long, name string")
    e = spark.createDataFrame([(1, 99)], "src long, dst long")
    t = GraphFrame(v, e).triplets().collect()
    assert len(t) == 1
    assert t[0]["dst_vertex"] is None
    assert t[0]["src_vertex"]["name"] == "a"


def test_aggregate_messages_both_directions(spark):
    """One-shot neighbourhood aggregation: each vertex sums the vals of
    all neighbours (in + out), hand-checked on a 4-vertex path + attr."""
    from pyspark.sql import functions as F

    from graphframes_rs_spark.graphframe import GraphFrame, GraphFrameError
    from graphframes_rs_spark.pregel import Pregel

    v = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, val long"
    )
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    g = GraphFrame(v, e)
    got = {r["id"]: r["agg"] for r in g.aggregate_messages(
        F.sum(Pregel.msg()),
        send_to_src=Pregel.dst("val"),
        send_to_dst=Pregel.src("val"),
    ).collect()}
    assert got == {1: 20, 2: 40, 3: 60, 4: 30}

    # single direction: only dst receives, edge attrs usable in messages
    ew = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 7)], "src long, dst long, w long"
    )
    gw = GraphFrame(v, ew)
    got_w = {r["id"]: r["agg"] for r in gw.aggregate_messages(
        F.sum(Pregel.msg()),
        send_to_dst=Pregel.src("val") * Pregel.edge("w"),
    ).collect()}
    assert got_w == {2: 50, 3: 140}

    with pytest.raises(GraphFrameError, match="at least one"):
        g.aggregate_messages(F.sum(Pregel.msg()))


def test_subgraph_helpers(spark):
    """filter_vertices / filter_edges / drop_isolated_vertices parity."""
    from pyspark.sql import functions as F

    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)], "id long, score long"
    )
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 3.0), (4, 5, 4.0)],
        "src long, dst long, w double",
    )
    g = GraphFrame(v, e)

    fv = g.filter_vertices(F.col("score") >= 20)  # drops vertex 1
    assert {r["id"] for r in fv.vertices.collect()} == {2, 3, 4, 5}
    assert {(r["src"], r["dst"]) for r in fv.edges.collect()} == {
        (2, 3), (3, 4), (4, 5)
    }
    # SQL-string condition form
    assert g.filter_vertices("score >= 20").num_nodes() == 4

    fe = g.filter_edges("w > 2.0")
    assert fe.num_nodes() == 5            # vertex set untouched
    assert {(r["src"], r["dst"]) for r in fe.edges.collect()} == {
        (3, 4), (4, 5)
    }
    pruned = fe.drop_isolated_vertices()
    assert {r["id"] for r in pruned.vertices.collect()} == {3, 4, 5}
    # edge attrs survive the semi joins
    assert {r["w"] for r in fv.edges.collect()} == {2.0, 3.0, 4.0}


def test_degree_assortativity_closed_forms(spark):
    """Star: perfectly disassortative (-1); path of 4: -0.5 (hand
    computed); regular cycle: NULL (zero degree variance)."""
    from graphframes_rs_spark.graphframe import GraphFrame

    def r(edges, n):
        v = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
        e = spark.createDataFrame(edges, "src long, dst long")
        return GraphFrame(v, e).degree_assortativity().collect()[0][0]

    assert r([(1, i) for i in range(2, 6)], 5) == -1.0
    assert abs(r([(1, 2), (2, 3), (3, 4)], 4) - (-0.5)) < 1e-9
    assert r([(1, 2), (2, 3), (3, 1)], 3) is None


def test_rich_club_hand_computed(spark):
    """K4 on {1,2,3,4} (degree 3 each) + pendant 5-1 (deg(1)=4, deg(5)=1).
    k=1: N={1,2,3,4} (deg>1), all 6 K4 edges qualify -> phi=1.0.
    k=3: N={1} (only deg>3) -> fewer than 2 nodes -> phi NULL.
    k=0: N=all 5, qualifying edges=7, phi=2*7/(5*4)=0.7."""
    from graphframes_rs_spark import GraphFrame
    from pyspark.sql import functions as F

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: r for r in GraphFrame(v, e).rich_club(ks=(0, 1, 3)).collect()}
    assert out[0]["n_nodes"] == 5 and out[0]["n_edges"] == 7
    assert abs(out[0]["phi"] - 0.7) < 1e-9
    assert out[1]["n_nodes"] == 4 and out[1]["n_edges"] == 6
    assert out[1]["phi"] == 1.0
    assert out[3]["n_nodes"] == 1 and out[3]["n_edges"] == 0
    assert out[3]["phi"] is None
