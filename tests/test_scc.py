"""SCC semantics on hand-built graphs (forward-backward coloring)."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame


def _scc(spark, tmp_path, edges, n_vertices, **kw):
    v = spark.createDataFrame([(i,) for i in range(1, n_vertices + 1)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    b = GraphFrame(v, e).strongly_connected_components().set_checkpoint_dir(
        str(tmp_path / "scc")
    )
    for k, val in kw.items():
        getattr(b, k)(val)
    out = {r["id"]: r["component"] for r in b.run().collect()}
    assert set(out) == set(range(1, n_vertices + 1))  # every vertex labeled
    return out


def test_scc_figure_eight_is_one_component(spark, tmp_path):
    # 1->2->1 and 2->3->2 share vertex 2: all mutually reachable
    got = _scc(spark, tmp_path, [(1, 2), (2, 1), (2, 3), (3, 2)], 3)
    assert got == {1: 1, 2: 1, 3: 1}


def test_scc_two_cycles_with_bridge(spark, tmp_path):
    # cycle {1,2,3} -> bridge -> cycle {4,5}; bridge is one-way
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4)]
    got = _scc(spark, tmp_path, edges, 5)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4


def test_scc_dag_all_singletons(spark, tmp_path):
    got = _scc(spark, tmp_path, [(1, 2), (2, 3), (1, 3), (3, 4)], 4)
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_scc_isolated_and_self_loop(spark, tmp_path):
    # self-loops are dropped (singleton SCC either way); isolated vertex too
    got = _scc(spark, tmp_path, [(1, 1), (2, 3), (3, 2)], 4)
    assert got[1] == 1 and got[4] == 4
    assert got[2] == got[3] == 2


def test_scc_cycle_reachable_from_smaller_ids(spark, tmp_path):
    """The cycle's members have smaller-id ancestors OUTSIDE the cycle:
    round 1 can only extract the ancestor chain, the cycle must wait for a
    later round — the multi-round path of the coloring algorithm."""
    # 1 -> 2 -> {3,4,5 cycle}; also 2 -> 6 (singleton tail)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3), (2, 6)]
    got = _scc(spark, tmp_path, edges, 6)
    assert got[3] == got[4] == got[5] == 3
    assert got[1] == 1 and got[2] == 2 and got[6] == 6
