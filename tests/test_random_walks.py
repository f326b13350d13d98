"""random_walks: exact agreement with an independent pure-python replay
of the hash-choice process, plus partitioning-independence."""

import hashlib
from collections import defaultdict

from graphframes_rs_spark.graphframe import GraphFrame

EDGES = [
    (1, 2), (1, 3), (1, 4),      # branching source
    (2, 3), (3, 1),              # cycle 1-2-3
    (4, 5),                      # chain into a sink
    (2, 3),                      # duplicate edge: must collapse
    (6, 6),                      # self-loop: a valid 1-cycle walk
]
VERTICES = list(range(1, 8))     # 7 is isolated: walk stays [7]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _simulate(num_walks, walk_length, seed):
    adj = defaultdict(set)
    for s, d in EDGES:
        adj[s].add(d)
    ranked = {
        s: sorted(ds, key=lambda d: (_h60(f"{d}|{seed}"), d))
        for s, ds in adj.items()
    }
    out = {}
    for v in VERTICES:
        for w in range(num_walks):
            wid = v * num_walks + w
            cur, path = v, [v]
            for t in range(1, walk_length + 1):
                nbrs = ranked.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h60(f"{wid}|{t}|{seed}") % len(nbrs)]
                path.append(cur)
            out[wid] = path
    return out


def _run(spark, num_walks, walk_length, seed, repartition=None):
    v = spark.createDataFrame([(i,) for i in VERTICES], "id long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    if repartition:
        v, e = v.repartition(repartition), e.repartition(repartition, "dst")
    g = GraphFrame(v, e)
    rows = g.random_walks(
        num_walks=num_walks, walk_length=walk_length, seed=seed
    ).collect()
    return {r["walk_id"]: list(r["path"]) for r in rows}


def test_walks_match_pure_python_replay(spark):
    for seed in (42, 7):
        got = _run(spark, num_walks=2, walk_length=4, seed=seed)
        want = _simulate(2, 4, seed)
        assert got == want


def test_walks_partitioning_independent(spark):
    base = _run(spark, 1, 3, 42)
    assert base == _run(spark, 1, 3, 42, repartition=5)
    # sanity: sink and isolated vertices stop/never move
    assert base[5] == [5]
    assert base[7] == [7]
    # self-loop walks keep cycling
    assert base[6] == [6, 6, 6, 6]


def test_walk_start_column(spark):
    v = spark.createDataFrame([(1,), (2,)], "id long")
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = GraphFrame(v, e).random_walks(num_walks=3, walk_length=2)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["start"] == r["path"][0] for r in rows)
    assert len({r["walk_id"] for r in rows}) == 6


def test_skipgram_pairs_hand_checked(spark):
    from graphframes_rs_spark.operators.random_walks import skipgram_pairs

    walks = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [40])],
        "walk_id long, path array<long>",
    )
    got = sorted(
        (r["center"], r["context"], r["offset"])
        for r in skipgram_pairs(walks, window=2).collect()
    )
    want = sorted([
        (10, 20, 1), (10, 30, 2),
        (20, 10, -1), (20, 30, 1),
        (30, 10, -2), (30, 20, -1),
    ])  # the singleton path emits nothing
    assert got == want
    import pytest as _pytest
    with _pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


def test_sample_neighbors_fanout(spark):
    import pytest as _pt

    from graphframes_rs_spark.operators.random_walks import sample_neighbors

    v = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    e = spark.createDataFrame(
        [(1, d) for d in (2, 3, 4, 5, 6)] + [(2, 3), (3, 3), (4, 5), (4, 5)],
        "src long, dst long",
    )
    g = GraphFrame(v, e)
    out = sample_neighbors(g, k=3, seed=42).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["rank"], r["neighbor"]))
    assert len(by_id[1]) == 3                       # capped at k
    assert sorted(r for r, _ in by_id[1]) == [1, 2, 3]
    assert by_id[2] == [(1, 3)]                     # degree < k keeps all
    assert by_id[4] == [(1, 5)]                     # duplicate edge collapses
    assert 5 not in by_id and 6 not in by_id        # sinks emit nothing
    # the chosen subset matches the walk ranking (same hash, same order)
    s1 = sample_neighbors(g, k=3, seed=42).collect()
    s2 = sample_neighbors(g, k=3, seed=42).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    with _pt.raises(ValueError):
        sample_neighbors(g, k=0)


def test_negative_samples_distribution_and_determinism(spark):
    from pyspark.sql import functions as F

    from graphframes_rs_spark.operators.random_walks import negative_samples

    # hub vertex 0 touches everyone; leaves have degree 1
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    pairs = spark.createDataFrame(
        [(i, (i % 8) + 1) for i in range(200, 300)],
        "center long, context long",
    )
    out = negative_samples(edges, pairs, k=4).toPandas()
    # every (distinct pair, slot) draws exactly one negative
    assert len(out) == 100 * 4
    counts = out.groupby("neg_id").size()
    # deg^0.75 smoothing: hub (deg 8 -> w~4757) vs leaf (deg 1 -> w 1000):
    # hub should draw ~4757/(4757+8000) ~ 37% of samples
    hub_frac = counts.get(0, 0) / len(out)
    assert 0.2 < hub_frac < 0.55
    again = negative_samples(edges, pairs, k=4).toPandas()
    a = sorted(map(tuple, out[["center", "context", "slot", "neg_id"]].values))
    b = sorted(map(tuple, again[["center", "context", "slot", "neg_id"]].values))
    assert a == b
