"""Sampled-source Brandes betweenness: hand-computed paths, diamonds
(path multiplicity), undirected star vs the known closed form, and
unreachable-source robustness."""

from graphframes_rs_spark.graphframe import GraphFrame, symmetrize_edges


def _bw(spark, ckpt, vertices, edges, sources, sub, undirected=False):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    if undirected:
        e = symmetrize_edges(e, deduplicate=True)
    b = GraphFrame(v, e).betweenness(sources)
    got = {
        r["id"]: r["betweenness"]
        for r in b.set_checkpoint_dir(f"{ckpt}/{sub}").run().collect()
    }
    return got, b


def test_betweenness_directed_path(spark, ckpt_dir):
    """1->2->3->4 from source 1: delta(2)=2, delta(3)=1, source excluded."""
    got, b = _bw(
        spark, ckpt_dir, [1, 2, 3, 4],
        [(1, 2), (2, 3), (3, 4)], [1], "path",
    )
    assert got == {1: 0.0, 2: 2.0, 3: 1.0, 4: 0.0}
    assert b.max_distance_ == 3


def test_betweenness_diamond_splits_dependency(spark, ckpt_dir):
    """1->{2,3}->4: two shortest paths to 4, each middle carries 1/2."""
    got, _ = _bw(
        spark, ckpt_dir, [1, 2, 3, 4],
        [(1, 2), (1, 3), (2, 4), (3, 4)], [1], "diamond",
    )
    assert got == {1: 0.0, 2: 0.5, 3: 0.5, 4: 0.0}


def test_betweenness_undirected_star_exact(spark, ckpt_dir):
    """All-sources undirected star: center betweenness = ordered leaf
    pairs = 3*2 = 6; leaves 0 (the textbook closed form)."""
    got, _ = _bw(
        spark, ckpt_dir, [1, 2, 3, 4],
        [(1, 2), (1, 3), (1, 4)], [1, 2, 3, 4], "star", undirected=True,
    )
    assert got == {1: 6.0, 2: 0.0, 3: 0.0, 4: 0.0}


def test_betweenness_sink_source_contributes_nothing(spark, ckpt_dir):
    """A source with no out-edges adds zero everywhere; totals match the
    single-source run."""
    got, _ = _bw(
        spark, ckpt_dir, [1, 2, 3, 4],
        [(1, 2), (2, 3), (3, 4)], [1, 4], "sink",
    )
    assert got == {1: 0.0, 2: 2.0, 3: 1.0, 4: 0.0}


def test_betweenness_no_edges(spark, ckpt_dir):
    got, b = _bw(spark, ckpt_dir, [1, 2], [], [1], "empty")
    assert got == {1: 0.0, 2: 0.0}
    assert b.max_distance_ == 0


def test_betweenness_max_distance_bound(spark, ckpt_dir):
    """max_distance(2) on 1->2->3->4: only pairs within 2 hops count, so
    vertex 2 keeps just the (1,3) intermediate credit and 3 loses its."""
    got, b = _bw2(spark, ckpt_dir)
    assert got == {1: 0.0, 2: 1.0, 3: 0.0, 4: 0.0}
    assert b.max_distance_ == 2


def _bw2(spark, ckpt):
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    b = GraphFrame(v, e).betweenness([1]).max_distance(2)
    got = {
        r["id"]: r["betweenness"]
        for r in b.set_checkpoint_dir(f"{ckpt}/bounded").run().collect()
    }
    return got, b


def test_betweenness_phase_stats_trail(spark, ckpt_dir):
    """phase_stats_ records the prep/forward/backward evidence trail in the
    house (phase, rows_or_supersteps, seconds) format: prep carries the
    materialized edge count, forward/backward carry each Pregel program's
    executed superstep count (forward = full path depth, backward =
    max_distance_ layers)."""
    got, b = _bw(
        spark, ckpt_dir, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)], [1], "ph"
    )
    phases = [p[0] for p in b.phase_stats_]
    assert phases == ["prep", "forward", "prep_rev", "backward"]
    assert b.phase_stats_[0][1] == 3  # materialized edges
    assert b.phase_stats_[3][1] == b.max_distance_ == 3
    assert all(isinstance(p[2], float) and p[2] >= 0 for p in b.phase_stats_)
