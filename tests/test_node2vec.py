"""node2vec_walks: exact agreement with an independent pure-python replay
of the second-order biased hash-choice process, plus limiting behavior
(p=q=1 reduces to a first-order walk over the same neighbour ranking)
and partitioning-independence."""

import hashlib
from collections import defaultdict

import pytest

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.operators.random_walks import (
    WEIGHT_SCALE,
    node2vec_walks,
)

EDGES = [
    (1, 2), (1, 3), (1, 4),      # branching source
    (2, 3), (2, 1), (3, 1),      # cycles: return (x==prev) cases exercised
    (3, 4),                      # 1->3->4 with 1->4 present: distance-1 case
    (4, 5),                      # chain into a sink
    (2, 3),                      # duplicate edge: must collapse
    (6, 6),                      # self-loop
]
VERTICES = list(range(1, 8))     # 7 isolated


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _simulate(num_walks, walk_length, p, q, seed):
    adj = defaultdict(set)
    for s, d in EDGES:
        adj[s].add(d)
    ranked = {
        s: sorted(ds, key=lambda d: (_h60(f"{d}|{seed}"), d))
        for s, ds in adj.items()
    }
    w_ret = max(1, round(WEIGHT_SCALE / p))
    w_d1 = WEIGHT_SCALE
    w_d2 = max(1, round(WEIGHT_SCALE / q))
    out = {}
    for v in VERTICES:
        for w in range(num_walks):
            wid = v * num_walks + w
            prev, cur, path = None, v, [v]
            for t in range(1, walk_length + 1):
                nbrs = ranked.get(cur)
                if not nbrs:
                    break
                if t == 1:
                    cur, prev = nbrs[_h60(f"{wid}|{t}|{seed}") % len(nbrs)], cur
                else:
                    ws = [
                        w_ret if x == prev
                        else (w_d1 if x in adj.get(prev, ()) else w_d2)
                        for x in nbrs
                    ]
                    u = _h60(f"{wid}|{t}|{seed}") % sum(ws)
                    cum = 0
                    for x, wx in zip(nbrs, ws):
                        cum += wx
                        if u < cum:
                            cur, prev = x, cur
                            break
                path.append(cur)
            out[wid] = path
    return out


def _run(spark, num_walks, walk_length, p, q, seed, repartition=None):
    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    if repartition:
        v, e = v.repartition(repartition), e.repartition(repartition, "dst")
    g = GraphFrame(v, e)
    rows = node2vec_walks(
        g, num_walks=num_walks, walk_length=walk_length, p=p, q=q, seed=seed
    ).collect()
    return {r["walk_id"]: list(r["path"]) for r in rows}


def test_biased_walks_match_pure_python_replay(spark):
    for p, q, seed in ((1.0, 1.0, 42), (0.25, 4.0, 42), (4.0, 0.5, 7)):
        got = _run(spark, num_walks=2, walk_length=4, p=p, q=q, seed=seed)
        want = _simulate(2, 4, p, q, seed)
        assert got == want, (p, q, seed)


def test_bias_changes_walks(spark):
    """Strong return bias (tiny p) vs strong exploration (tiny q) must
    produce different corpora on a graph with return edges."""
    ret = _run(spark, 2, 4, 0.01, 1.0, 42)
    far = _run(spark, 2, 4, 100.0, 0.01, 42)
    assert ret != far


def test_partitioning_independent_and_edge_cases(spark):
    base = _run(spark, 1, 3, 0.5, 2.0, 42)
    assert base == _run(spark, 1, 3, 0.5, 2.0, 42, repartition=5)
    assert base[5] == [5]           # sink stays
    assert base[7] == [7]           # isolated stays
    assert base[6] == [6, 6, 6, 6]  # self-loop cycles


def test_start_column_and_validation(spark):
    v = spark.createDataFrame([(1,), (2,)], "id long")
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    g = GraphFrame(v, e)
    rows = node2vec_walks(g, num_walks=2, walk_length=2).collect()
    assert len(rows) == 4
    assert all(r["start"] == r["path"][0] for r in rows)
    with pytest.raises(ValueError):
        node2vec_walks(g, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(g, walk_length=0)


def test_weighted_walks_match_pure_python_replay(spark):
    from graphframes_rs_spark.operators.random_walks import (
        WEIGHT_QUANTUM,
        weighted_random_walks,
    )

    w_edges = [
        (1, 2, 0.75), (1, 3, 0.25),      # biased branch
        (2, 4, 1.0), (3, 4, 2.0),
        (4, 1, 0.5), (4, 5, 0.5),
        (1, 2, 0.25),                     # duplicate edge: weights sum
    ]
    verts = [1, 2, 3, 4, 5, 6]

    def replay(num_walks, walk_length, seed):
        agg = {}
        for s, d, w in w_edges:
            agg[(s, d)] = agg.get((s, d), 0) + round(w * WEIGHT_QUANTUM)
        adj = defaultdict(list)
        for (s, d), w in agg.items():
            adj[s].append((d, w))
        for s in adj:
            adj[s].sort(key=lambda t: (_h60(f"{t[0]}|{seed}"), t[0]))
        out = {}
        for v in verts:
            for i in range(num_walks):
                wid = v * num_walks + i
                cur, path = v, [v]
                for t in range(1, walk_length + 1):
                    nbrs = adj.get(cur)
                    if not nbrs:
                        break
                    tot = sum(w for _, w in nbrs)
                    u = _h60(f"{wid}|{t}|{seed}") % tot
                    c = 0
                    for d, w in nbrs:
                        c += w
                        if u < c:
                            cur = d
                            break
                    path.append(cur)
                out[wid] = path
        return out

    v = spark.createDataFrame([(i,) for i in verts], "id long")
    e = spark.createDataFrame(w_edges, "src long, dst long, weight double")
    g = GraphFrame(v, e)
    for seed in (42, 7):
        got = {
            r["walk_id"]: list(r["path"])
            for r in weighted_random_walks(
                g, "weight", num_walks=2, walk_length=4, seed=seed
            ).collect()
        }
        assert got == replay(2, 4, seed), seed
    # heavy bias sanity: weight 1000:1 from vertex 1 almost always goes to 2
    e2 = spark.createDataFrame(
        [(1, 2, 1000.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    g2 = GraphFrame(
        spark.createDataFrame([(1,), (2,), (3,)], "id long"), e2
    )
    hits = [
        r["path"][1]
        for r in weighted_random_walks(
            g2, "weight", num_walks=50, walk_length=1
        ).collect()
        if len(r["path"]) > 1
    ]
    assert hits.count(2) >= 45
