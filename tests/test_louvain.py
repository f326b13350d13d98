"""Louvain community detection: planted-structure recovery, modularity
improvement over trivial partitions, contraction behaviour, determinism."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame


def _graph(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    ids = vertices or sorted({v for pair in edges for v in pair})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    return GraphFrame(v, e)


def _clique(ids):
    return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]


def _ring_of_cliques(n_cliques, size):
    """Cliques 0..n-1 of ``size`` vertices; one ring edge between the
    first members of consecutive cliques."""
    edges, base = [], lambda g: [g * size + j for j in range(size)]
    for g in range(n_cliques):
        edges += _clique(base(g))
        edges.append((base(g)[0], base((g + 1) % n_cliques)[0]))
    return edges


def test_two_triangles_bridge(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    got = {r["id"]: r["community"] for r in g.louvain().run().collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 4


def test_ring_of_cliques_recovered(spark):
    # 6 cliques of 5: well under the resolution limit, so each clique is
    # its own community, labelled by its minimum member
    g = _graph(spark, _ring_of_cliques(6, 5))
    got = {r["id"]: r["community"] for r in g.louvain().run().collect()}
    for v, c in got.items():
        assert c == (v // 5) * 5, (v, c)


def test_modularity_beats_singletons_and_matches_planted(spark):
    edges = _ring_of_cliques(4, 6)
    g = _graph(spark, edges)
    labels = g.louvain().run().select("id", F.col("community").alias("label"))
    q = g.modularity(labels).collect()[0]["modularity"]
    # planted partition's Q on a ring of 4 K6: e_c=15+1? compute loosely —
    # just require strongly positive and near the planted score
    planted = spark.createDataFrame(
        [(i, (i // 6) * 6) for i in range(24)], "id long, label long"
    )
    q_planted = g.modularity(planted).collect()[0]["modularity"]
    assert q == pytest.approx(q_planted, abs=1e-9)
    assert q > 0.5


def test_contraction_merges_past_resolution_limit(spark):
    # ring of 24 triangles: m = 24*3 + 24 = 96, sqrt(2m) ~ 13.9 < 24, so
    # optimal modularity MERGES adjacent triangles — only the contraction
    # levels can do that; level 1 alone stops at one-triangle communities
    edges = _ring_of_cliques(24, 3)
    g = _graph(spark, edges)
    one = g.louvain().max_levels(1).run()
    multi = g.louvain().max_levels(3).run()
    n_one = one.select("community").distinct().count()
    n_multi = multi.select("community").distinct().count()
    assert n_one == 24
    assert n_multi < 24


def test_isolated_vertices_are_singletons(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3)], vertices=[1, 2, 3, 99])
    got = {r["id"]: r["community"] for r in g.louvain().run().collect()}
    assert got[99] == 99
    assert got[1] == got[2] == got[3]


def test_no_edges_all_singletons(spark):
    g = _graph(spark, [], vertices=[7, 8, 9])
    e = spark.createDataFrame([], "src long, dst long")
    v = spark.createDataFrame([(7,), (8,), (9,)], "id long")
    got = {r["id"]: r["community"] for r in GraphFrame(v, e).louvain().run().collect()}
    assert got == {7: 7, 8: 8, 9: 9}


def test_deterministic_across_runs_and_partitionings(spark):
    edges = _ring_of_cliques(5, 4)
    g1 = _graph(spark, edges)
    e2 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    v2 = g1.vertices.repartition(3)
    r1 = sorted(map(tuple, g1.louvain().run().collect()))
    r2 = sorted(map(tuple, GraphFrame(v2, e2).louvain().run().collect()))
    assert r1 == r2


def test_weighted_louvain_follows_heavy_edges(spark):
    # path 1-2-3-4 where (1,2) and (3,4) are heavy, (2,3) light: weighted
    # Louvain must pair {1,2} and {3,4}
    e = spark.createDataFrame(
        [(1, 2, 10.0), (2, 3, 0.1), (3, 4, 10.0)], "src long, dst long, w double"
    )
    v = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    got = {
        r["id"]: r["community"]
        for r in GraphFrame(v, e).louvain("w").run().collect()
    }
    assert got[1] == got[2]
    assert got[3] == got[4]
    assert got[1] != got[3]


def test_louvain_phase_stats_trail(spark, tmp_path):
    """phase_stats_ records prep, per-round moves, contraction and compose
    in execution order, with move counts summing to moves_."""
    from graphframes_rs_spark.graphframe import GraphFrame
    from pyspark.sql import functions as F

    # two 4-cliques joined by one bridge edge: one move round collapses
    # each clique, contraction leaves a 2-vertex graph
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    v = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "id long"
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    b = (
        GraphFrame(v, e)
        .louvain()
        .max_levels(2)
        .max_moves(3)
        .set_checkpoint_dir(str(tmp_path / "lv"))
    )
    b.run().count()
    phases = [p[0] for p in b.phase_stats_]
    assert phases[0] == "prep"
    assert phases[-1] == "compose"
    moves = sum(p[1] for p in b.phase_stats_ if p[0].startswith("move "))
    assert moves == b.moves_
    # level 0 moved and max_levels=2, so the level-0 contraction ran
    assert "contract l0" in phases


def test_move_tolerance_stops_early_and_stays_valid(spark, tmp_path):
    """with_move_tolerance ends a level's move rounds once the wants-to-move
    tail is below frac·|V|: the stop is recorded in phase_stats_, the
    result is still a valid min-member-labelled clustering, and frac=0
    (default) is exact — identical output to an explicit 0.0."""
    g = _graph(spark, _ring_of_cliques(6, 5))
    # frac just under 1: stop right after the first round (its wants count
    # can never exceed |V|-1 here since clique minima are settled movers)
    b = (
        g.louvain()
        .with_move_tolerance(0.99)
        .set_checkpoint_dir(str(tmp_path / "tol"))
    )
    out = {r["id"]: r["community"] for r in b.run().collect()}
    stops = [p for p in b.phase_stats_ if p[0].startswith("move_tol_stop")]
    assert stops, b.phase_stats_
    # clustering validity: labels are member ids, min-member convention
    for v, c in out.items():
        assert c in out  # label is a vertex id
        assert out[c] == c  # the label's own community is itself
    # exactness default: tolerance 0.0 == plain run
    a = g.louvain().set_checkpoint_dir(str(tmp_path / "ex")).run()
    b0 = g.louvain().with_move_tolerance(0.0).set_checkpoint_dir(
        str(tmp_path / "ex0")
    )
    assert {tuple(r) for r in a.collect()} == {
        tuple(r) for r in b0.run().collect()
    }
    with pytest.raises(ValueError, match="move tolerance"):
        g.louvain().with_move_tolerance(1.0)
