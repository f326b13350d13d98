"""Link prediction: hand-computed square-cycle scores, existing-edge
exclusion, hub cap semantics."""

import math

from graphframes_rs_spark.graphframe import GraphFrame


def _lp(spark, edges, n, **kw):
    v = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["a"], r["b"]): r
        for r in GraphFrame(v, e).link_prediction(**kw).collect()
    }


def test_square_cycle_hand_computed(spark):
    """4-cycle 1-2-3-4-1: the two diagonals are the only predictions,
    each with both neighbors as witnesses."""
    got = _lp(spark, [(1, 2), (2, 3), (3, 4), (4, 1)], 4)
    assert set(got) == {(1, 3), (2, 4)}
    for pair in ((1, 3), (2, 4)):
        r = got[pair]
        assert r["common"] == 2
        assert abs(r["jaccard"] - 1.0) < 1e-9  # union == common here
        assert abs(r["adamic_adar"] - round(2 / math.log(2), 6)) < 1e-9


def test_triangle_has_no_predictions(spark):
    """Every 2-hop pair in a triangle is already an edge."""
    assert _lp(spark, [(1, 2), (2, 3), (1, 3)], 3) == {}


def test_hub_cap_drops_star_center_witness(spark):
    """Star 1-{2,3,4}: leaves pair only through the center; capping the
    center's degree below 3 removes every candidate."""
    edges = [(1, 2), (1, 3), (1, 4)]
    uncapped = _lp(spark, edges, 4, max_degree=None)
    assert set(uncapped) == {(2, 3), (2, 4), (3, 4)}
    assert abs(uncapped[(2, 3)]["adamic_adar"] - round(1 / math.log(3), 6)) < 1e-9
    assert _lp(spark, edges, 4, max_degree=2) == {}


def test_min_common_threshold(spark):
    """Path 1-2-3-4-5: every 2-hop pair has exactly one witness, so
    min_common=2 filters them all and min_common=1 keeps the three."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _lp(spark, edges, 5, min_common=2) == {}
    got = _lp(spark, edges, 5, min_common=1)
    assert set(got) == {(1, 3), (2, 4), (3, 5)}
    assert all(r["common"] == 1 for r in got.values())


def test_bipartite_projection_counts_and_cap(spark):
    from graphframes_rs_spark.operators.link_prediction import (
        bipartite_projection,
    )

    # orders o1..o3 -> suppliers; o3 is a "hub" with 3 suppliers
    e = spark.createDataFrame(
        [
            (1, 10), (1, 11),
            (2, 10), (2, 11),
            (3, 10), (3, 11), (3, 12),
        ],
        "src long, dst long",
    )
    out = {
        (r["a"], r["b"]): r["n_common"]
        for r in bipartite_projection(e, side="dst", max_degree=None).collect()
    }
    assert out == {(10, 11): 3, (10, 12): 1, (11, 12): 1}

    # cap drops the degree-3 hub order before the join
    capped = {
        (r["a"], r["b"]): r["n_common"]
        for r in bipartite_projection(e, side="dst", max_degree=2).collect()
    }
    assert capped == {(10, 11): 2}

    # min_common prunes weak links
    strong = {
        (r["a"], r["b"]): r["n_common"]
        for r in bipartite_projection(
            e, side="dst", max_degree=None, min_common=2
        ).collect()
    }
    assert strong == {(10, 11): 3}

    # side="src": orders sharing a supplier
    src_side = {
        (r["a"], r["b"]): r["n_common"]
        for r in bipartite_projection(e, side="src", max_degree=None).collect()
    }
    assert src_side == {(1, 2): 2, (1, 3): 2, (2, 3): 2}

    import pytest as _pt

    with _pt.raises(ValueError):
        bipartite_projection(e, side="mid")
