"""Time-respecting reachability semantics."""

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.temporal import LONG_MAX


def _tgraph(spark, edges):
    vids = sorted({u for u, v, _ in edges} | {v for u, v, _ in edges})
    v = spark.createDataFrame([(i,) for i in vids], "id long")
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    return GraphFrame(v, e)


def _run(g, sources, ckpt, **kw):
    return {
        r.id: (r.arrival, r.reachable)
        for r in g.temporal_reachability(sources, **kw)
        .set_checkpoint_dir(ckpt)
        .run()
        .collect()
    }


def test_decreasing_timestamps_block_path(spark, ckpt_dir):
    # 0 -(5)-> 1 -(3)-> 2: the second edge departs before arrival at 1
    out = _run(_tgraph(spark, [(0, 1, 5), (1, 2, 3)]), [0], ckpt_dir)
    assert out[0] == (0, True)
    assert out[1] == (5, True)
    assert out[2] == (LONG_MAX, False)


def test_waiting_at_vertex_allowed(spark, ckpt_dir):
    # arrival 5 at vertex 1; edge at ts 9 departs later: valid
    out = _run(_tgraph(spark, [(0, 1, 5), (1, 2, 9)]), [0], ckpt_dir)
    assert out[2] == (9, True)


def test_earliest_arrival_over_two_paths(spark, ckpt_dir):
    # diamond: 0->1->3 arrives at 7; 0->2->3 arrives at 6
    edges = [(0, 1, 1), (1, 3, 7), (0, 2, 2), (2, 3, 6)]
    out = _run(_tgraph(spark, edges), [0], ckpt_dir)
    assert out[3] == (6, True)


def test_start_time_excludes_earlier_edges(spark, ckpt_dir):
    # starting at t=10, the ts=5 edge already departed
    out = _run(
        _tgraph(spark, [(0, 1, 5), (0, 2, 12)]), [0], ckpt_dir, start_time=10
    )
    assert out[1] == (LONG_MAX, False)
    assert out[2] == (12, True)


def test_later_shortcut_still_relaxes(spark, ckpt_dir):
    # 0->1 at 10 first; a second edge 0->1 at 2 gives the earlier arrival,
    # which then unlocks 1->2 at 4
    edges = [(0, 1, 10), (0, 1, 2), (1, 2, 4)]
    out = _run(_tgraph(spark, edges), [0], ckpt_dir)
    assert out[1] == (2, True)
    assert out[2] == (4, True)
