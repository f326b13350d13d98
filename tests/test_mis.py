"""MIS invariant tests (reference maximal_independent_set.rs:559-755):
assert *independence* and *maximality* rather than exact membership; exact
sizes only where deterministic (K5 => 1, edgeless => all)."""

from graphframes_rs_spark import GraphFrame
from graphframes_rs_spark.graphframe import symmetrize_edges


def _run_mis(spark, ckpt_dir, vertices, edges, seed=42):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    g = GraphFrame(v, e)
    mis = (
        g.maximal_independent_set()
        .with_random_seed(seed)
        .set_checkpoint_dir(ckpt_dir)
        .run()
    )
    members = {r["id"] for r in mis.collect()}
    _assert_valid_mis(vertices, edges, members)
    return members


def _assert_valid_mis(vertices, edges, members):
    undirected = {(s, d) for s, d in edges if s != d}
    undirected |= {(d, s) for s, d in undirected}
    # independence: no edge inside the set
    for s, d in undirected:
        assert not (s in members and d in members), f"edge ({s},{d}) inside MIS"
    # maximality: every non-member has a member neighbour
    neighbours = {}
    for s, d in undirected:
        neighbours.setdefault(s, set()).add(d)
    for v in vertices:
        if v not in members:
            assert neighbours.get(v, set()) & members, f"vertex {v} could join MIS"


def test_k5_has_mis_of_exactly_one(spark, ckpt_dir):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    members = _run_mis(spark, ckpt_dir, list(range(5)), edges)
    assert len(members) == 1


def test_edgeless_graph_all_members(spark, ckpt_dir):
    members = _run_mis(spark, ckpt_dir, [1, 2, 3], [])
    assert members == {1, 2, 3}


def test_isolated_always_in_mis(spark, ckpt_dir):
    members = _run_mis(spark, ckpt_dir, [0, 1, 2, 3], [(0, 1)])
    assert {2, 3} <= members


def test_path6_and_cycle6_invariants(spark, ckpt_dir):
    path = [(i, i + 1) for i in range(5)]
    members = _run_mis(spark, ckpt_dir + "p", list(range(6)), path)
    assert 2 <= len(members) <= 3
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    members = _run_mis(spark, ckpt_dir + "c", list(range(6)), cycle, seed=7)
    assert len(members) in (2, 3)


def test_reproducible_with_seed(spark, ckpt_dir):
    edges = [(i, j) for i in range(8) for j in range(i + 1, 8) if (i + j) % 3 == 0]
    a = _run_mis(spark, ckpt_dir + "a", list(range(8)), edges, seed=11)
    b = _run_mis(spark, ckpt_dir + "b", list(range(8)), edges, seed=11)
    assert a == b
