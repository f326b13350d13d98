"""Coarsening semantics: member counts, weight conservation minus
intra-pair edges, parallel-edge collapse, multilevel composition."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.coarsen import coarsen_graph


def _graph(spark, edges, n, weights=None):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    if weights:
        e = spark.createDataFrame(
            [(a, b, w) for (a, b), w in zip(edges, weights)],
            "src long, dst long, weight double",
        )
    else:
        e = spark.createDataFrame(edges, "src long, dst long")
    return GraphFrame(v, e)


def _matching(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "id long, partner long")


def test_coarsen_merges_pairs_and_sums_weights(spark):
    # pairs (0,1), (2,3); edges 0-2 and 1-3 become parallel super-edges
    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], 4)
    m = _matching(spark, [(0, 1), (2, 3)])
    c = coarsen_graph(g, m)
    vs = {r["id"]: r["n_members"] for r in c.vertices.collect()}
    assert vs == {0: 2, 2: 2}
    es = {(r["src"], r["dst"]): r["weight"] for r in c.edges.collect()}
    # 0-2 and 1-3 both map to (0, 2): weight 2; intra-pair edges dropped
    assert es == {(0, 2): 2.0}


def test_coarsen_unmatched_carry_over(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 4)], 5)
    m = _matching(spark, [(0, 1)])
    c = coarsen_graph(g, m)
    vs = {r["id"]: r["n_members"] for r in c.vertices.collect()}
    assert vs == {0: 2, 2: 1, 3: 1, 4: 1}
    es = {(r["src"], r["dst"]): r["weight"] for r in c.edges.collect()}
    assert es == {(0, 2): 1.0, (2, 4): 1.0}


def test_coarsen_weight_conservation(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    weights = [5.0, 1.0, 2.0, 3.0, 7.0]
    g = _graph(spark, edges, 5, weights)
    m = _matching(spark, [(0, 1), (2, 3)])
    c = coarsen_graph(g, m, weight_col="weight")
    total_after = c.edges.agg(F.sum("weight")).collect()[0][0]
    # dropped: intra-pair 0-1 (5.0) and 2-3 (3.0)
    assert total_after == pytest.approx(sum(weights) - 5.0 - 3.0)


def test_coarsen_composes_with_matching_operator(spark, ckpt_dir):
    # end-to-end: real matching, then coarsen; vertex count shrinks by
    # exactly the number of matched pairs and every edge endpoint exists
    edges = [(i, (i + 1) % 10) for i in range(10)]
    g = _graph(spark, edges, 10)
    m = g.maximal_matching().set_checkpoint_dir(ckpt_dir).run()
    n_pairs = m.count() // 2
    c = coarsen_graph(g, m)
    assert c.vertices.count() == 10 - n_pairs
    vids = {r["id"] for r in c.vertices.collect()}
    for r in c.edges.collect():
        assert r["src"] in vids and r["dst"] in vids
