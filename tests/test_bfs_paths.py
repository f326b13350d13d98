"""BFS-with-paths semantics (GraphFrames bfs parity) on hand-built graphs."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, GraphFrameError


@pytest.fixture()
def g(spark):
    # 1->2->4 and 1->3->4 (two shortest), 4->5, plus a long detour 1->6->7->5
    v = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 8)], "id long, name string"
    )
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (1, 6), (6, 7), (7, 5)],
        "src long, dst long",
    )
    return GraphFrame(v, e)


def test_bfs_finds_all_shortest_paths(g):
    rows = g.bfs("id = 1", "id = 4").collect()
    paths = {tuple(r["path"]) for r in rows}
    assert paths == {(1, 2, 4), (1, 3, 4)}
    assert all(r["length"] == 2 for r in rows)
    assert all(r["from_id"] == 1 and r["to_id"] == 4 for r in rows)


def test_bfs_global_shortest_cuts_longer_routes(g):
    # 5 is reachable at depth 3 (via 4) and depth 3 (via 7): both length-3
    # routes are returned; nothing longer
    rows = g.bfs("id = 1", "id = 5").collect()
    paths = {tuple(r["path"]) for r in rows}
    assert paths == {(1, 2, 4, 5), (1, 3, 4, 5), (1, 6, 7, 5)}


def test_bfs_source_is_target(g):
    rows = g.bfs("id = 1", "name = 'n1'").collect()
    assert len(rows) == 1
    assert rows[0]["length"] == 0 and list(rows[0]["path"]) == [1]


def test_bfs_unreachable_returns_empty_with_schema(g):
    out = g.bfs("id = 5", "id = 1", max_path_length=4)
    assert out.columns == ["from_id", "to_id", "path", "length"]
    assert out.count() == 0


def test_bfs_depth_budget(g):
    assert g.bfs("id = 1", "id = 5", max_path_length=2).count() == 0
    with pytest.raises(GraphFrameError, match=">= 0"):
        g.bfs("id = 1", "id = 5", max_path_length=-1)


def test_bfs_expr_columns_and_sets(g, spark):
    # set-to-set: sources {2, 3}, targets {5}: both length-2 paths
    rows = g.bfs(F.col("id").isin(2, 3), "id = 5").collect()
    paths = {tuple(r["path"]) for r in rows}
    assert paths == {(2, 4, 5), (3, 4, 5)}


def test_bfs_edge_filter_reroutes(spark):
    """Filtering out the direct edge forces the longer route — GraphFrames'
    edgeFilter semantics (filter applies to traversal, not endpoints)."""
    v = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    e = spark.createDataFrame(
        [(1, 4, "toll"), (1, 2, "free"), (2, 3, "free"), (3, 4, "free")],
        "src long, dst long, kind string",
    )
    g = GraphFrame(v, e)
    direct = g.bfs("id = 1", "id = 4")
    assert {tuple(r["path"]) for r in direct.collect()} == {(1, 4)}
    rerouted = g.bfs("id = 1", "id = 4", edge_filter="kind = 'free'")
    assert {tuple(r["path"]) for r in rerouted.collect()} == {(1, 2, 3, 4)}
    # Column-expression form
    rerouted2 = g.bfs("id = 1", "id = 4", edge_filter=F.col("kind") == "free")
    assert {tuple(r["path"]) for r in rerouted2.collect()} == {(1, 2, 3, 4)}
