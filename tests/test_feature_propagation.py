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


def test_fastrp_embedding_hand_computed(spark):
    """2-vertex path a-b: h1(a,d) = R(b,d); h2(a,d) = h1(b,d) = R(a,d);
    emb(a,d) = R(b,d) + R(a,d) — symmetric, so emb(a) == emb(b)."""
    from graphframes_rs_spark.operators.fastrp import fastrp_embedding
    from graphframes_rs_spark.pipeline.text import hash60
    from pyspark.sql import functions as F

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = fastrp_embedding(e, dims=3, hops=2, seed=7)
    rows = {(r["id"], r["dim"]): r["emb"] for r in out.collect()}
    assert len(rows) == 6
    # replicate the sign rule for the expected values
    signs = {
        (i, d): r["s"]
        for i in (1, 2)
        for d, r in [
            (d, spark.range(1).select(
                F.when(
                    F.pmod(hash60(F.lit(f"{i}:{d}:7")), F.lit(2)) == 0, 1
                ).otherwise(-1).alias("s")
            ).collect()[0])
            for d in (0, 1, 2)
        ]
    }
    for d in (0, 1, 2):
        expected = signs[(1, d)] + signs[(2, d)]
        assert rows[(1, d)] == expected
        assert rows[(2, d)] == expected
