"""feature_propagation: exact agreement with a pure-python replay of the
blended-mean rounds, plus missing-feature and no-in-neighbour handling."""

from collections import defaultdict

import pytest

from graphframes_rs_spark.graphframe import GraphFrame

EDGES = [(1, 3), (2, 3), (3, 4), (4, 4)]  # 3 averages {1,2}; 4 self+3
VERTICES = [1, 2, 3, 4, 5]                # 5 isolated
FEATS = {1: [2.0, 10.0], 2: [4.0, 20.0], 3: [0.0, 0.0], 4: [8.0, 40.0]}
# 5 missing from the feature frame -> zero vector


def _replay(rounds, alpha, d=2):
    preds = defaultdict(list)
    for s, t in EDGES:
        preds[t].append(s)
    x = {v: list(FEATS.get(v, [0.0] * d)) for v in VERTICES}
    for _ in range(rounds):
        nxt = {}
        for v in VERTICES:
            ps = preds.get(v)
            if not ps:
                nxt[v] = list(x[v])
                continue
            nxt[v] = [
                (1 - alpha) * x[v][j]
                + alpha * (sum(x[u][j] for u in ps) / len(ps))
                for j in range(d)
            ]
        x = nxt
    return x


def _run(spark, rounds, alpha):
    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    feats = spark.createDataFrame(
        [(k, v_) for k, v_ in FEATS.items()], "id long, features array<double>"
    )
    out = GraphFrame(v, e).feature_propagation(
        feats, rounds=rounds, alpha=alpha
    )
    return {r["id"]: list(r["features"]) for r in out.collect()}


def test_matches_pure_python_replay(spark):
    for rounds, alpha in ((1, 1.0), (2, 0.5), (3, 0.25)):
        got = _run(spark, rounds, alpha)
        want = _replay(rounds, alpha)
        for v in VERTICES:
            assert got[v] == pytest.approx(want[v]), (rounds, alpha, v)


def test_edge_cases(spark):
    got = _run(spark, 2, 0.5)
    # no in-neighbours: features unchanged
    assert got[1] == [2.0, 10.0]
    # isolated AND missing from features: zero vector
    assert got[5] == [0.0, 0.0]
    v = spark.createDataFrame([(1,)], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    feats = spark.createDataFrame([(1, [1.0])], "id long, features array<double>")
    g = GraphFrame(v, e)
    with pytest.raises(ValueError):
        g.feature_propagation(feats, rounds=0)
    with pytest.raises(ValueError):
        g.feature_propagation(feats, alpha=0.0)
