"""End-to-end golden tests against the LDBC Graphalytics fixtures bundled
with the reference (Apache-2.0 per its NOTICE), mirroring reference test
layer 2 (SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.operators.shortest_paths import INT_MAX
from graphframes_rs_spark.sources.ldbc import load_ldbc_expected, load_ldbc_graph

LDBC_DIR = "/root/reference/testing/data/ldbc"
I64_MAX = 9223372036854775807


def test_bfs_golden(spark, ckpt_dir):
    g = load_ldbc_graph(spark, LDBC_DIR, "test-bfs-directed")
    expected = load_ldbc_expected(spark, LDBC_DIR, "test-bfs-directed", "BFS")
    sp = g.shortest_paths([1]).set_checkpoint_dir(ckpt_dir)
    result = sp.run()
    joined = result.join(
        expected, result["id"] == expected["vertex_id"], "inner"
    ).select(
        "id",
        "dist_1",
        # golden files use i64::MAX for unreachable; our sentinel is INT_MAX
        F.when(F.col("expected") == I64_MAX, F.lit(INT_MAX))
        .otherwise(F.col("expected"))
        .alias("expected"),
    )
    rows = joined.collect()
    assert len(rows) == g.num_nodes()
    for r in rows:
        assert r["dist_1"] == r["expected"], f"vertex {r['id']}"


def test_bfs_to_landmarks_golden_on_transpose(spark, ckpt_dir):
    """to_landmarks (reversed BFS, shortest_paths.rs:187-198) checked
    against the LDBC BFS golden: distance TO landmark 1 on the TRANSPOSED
    fixture graph equals the golden distance FROM 1 on the original."""
    from graphframes_rs_spark import GraphFrame

    g = load_ldbc_graph(spark, LDBC_DIR, "test-bfs-directed")
    transposed = GraphFrame(
        g.vertices,
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    expected = load_ldbc_expected(spark, LDBC_DIR, "test-bfs-directed", "BFS")
    sp = transposed.shortest_paths([1]).to_landmarks().set_checkpoint_dir(ckpt_dir)
    result = sp.run()
    joined = result.join(
        expected, result["id"] == expected["vertex_id"], "inner"
    ).select(
        "id",
        "dist_1",
        F.when(F.col("expected") == I64_MAX, F.lit(INT_MAX))
        .otherwise(F.col("expected"))
        .alias("expected"),
    )
    rows = joined.collect()
    assert len(rows) == g.num_nodes()
    for r in rows:
        assert r["dist_1"] == r["expected"], f"vertex {r['id']}"


def test_wcc_golden(spark, ckpt_dir):
    g = load_ldbc_graph(spark, LDBC_DIR, "test-wcc-directed")
    expected = load_ldbc_expected(spark, LDBC_DIR, "test-wcc-directed", "WCC")
    result = g.connected_components().set_checkpoint_dir(ckpt_dir).run()
    joined = result.join(expected, result["id"] == expected["vertex_id"]).collect()
    assert len(joined) == g.num_nodes()
    for r in joined:
        assert r["component"] == r["expected"], f"vertex {r['id']}"


def test_pagerank_golden_fixed_iterations(spark, ckpt_dir):
    """14 fixed iterations reach <= 0.0015 abs error (pagerank.rs:296-319)."""
    g = load_ldbc_graph(spark, LDBC_DIR, "test-pr-directed")
    expected = load_ldbc_expected(spark, LDBC_DIR, "test-pr-directed", "PR")
    pr = g.page_rank().max_iterations(14).with_tol(0.0).set_checkpoint_dir(ckpt_dir)
    result = pr.run()
    joined = result.join(expected, result["id"] == expected["vertex_id"]).collect()
    assert len(joined) == g.num_nodes()
    max_err = max(abs(r["pagerank"] - r["expected"]) for r in joined)
    assert max_err <= 0.0015, f"max abs error {max_err}"


def test_pagerank_golden_convergence_mode(spark, ckpt_dir):
    """tol=0.0001 early-stop reaches <= 0.01 abs error (pagerank.rs:331-364)."""
    g = load_ldbc_graph(spark, LDBC_DIR, "test-pr-directed")
    expected = load_ldbc_expected(spark, LDBC_DIR, "test-pr-directed", "PR")
    pr = g.page_rank().with_tol(0.0001).set_checkpoint_dir(ckpt_dir)
    result = pr.run()
    joined = result.join(expected, result["id"] == expected["vertex_id"]).collect()
    max_err = max(abs(r["pagerank"] - r["expected"]) for r in joined)
    assert max_err <= 0.01, f"max abs error {max_err}"


def test_personalized_pagerank_hand_checked(spark, ckpt_dir):
    """Personalized PR on a 4-vertex path 1->2->3->4 from source 1: the
    delta chain gives 0.15, 0.85*0.15, 0.85^2*0.15, 0.85^3*0.15 before
    normalization; vertices unreachable from the source rank 0."""
    from graphframes_rs_spark.graphframe import GraphFrame
    from pyspark.sql import functions as F

    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    # vertex 5 is isolated: unreachable, must rank 0 under personalization
    g = GraphFrame(v, e)
    got = {r["id"]: r["pagerank"] for r in (
        g.page_rank().personalized([1]).max_iterations(5).with_tol(0.0)
        .set_checkpoint_dir(str(ckpt_dir) + "/ppr").run().collect()
    )}
    raw = [0.15, 0.85 * 0.15, 0.85**2 * 0.15, 0.85**3 * 0.15]
    s = sum(raw)
    for vid, expect in zip((1, 2, 3, 4), raw):
        assert abs(got[vid] - expect / s) < 1e-9, (vid, got[vid])
    assert got[5] == 0.0
    # uniform run on the same graph ranks vertex 5 > 0 (sanity contrast)
    uni = {r["id"]: r["pagerank"] for r in (
        g.page_rank().max_iterations(5).with_tol(0.0)
        .set_checkpoint_dir(str(ckpt_dir) + "/uni").run().collect()
    )}
    assert uni[5] > 0.0


def test_weighted_pagerank_hand_checked(spark, ckpt_dir):
    """Weighted PR on a 3-vertex fan 1->2 (w=3), 1->3 (w=1): vertex 1's
    delta splits 75/25 instead of 50/50; 2 iterations reach the fixpoint
    (2 and 3 have no out-edges)."""
    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    e = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    g = GraphFrame(v, e)
    got = {r["id"]: r["pagerank"] for r in (
        g.page_rank().weighted("weight").max_iterations(2).with_tol(0.0)
        .set_checkpoint_dir(str(ckpt_dir) + "/wpr").run().collect()
    )}
    raw = {1: 0.15, 2: 0.15 + 0.85 * 0.15 * 0.75, 3: 0.15 + 0.85 * 0.15 * 0.25}
    s = sum(raw.values())
    for vid in (1, 2, 3):
        assert abs(got[vid] - raw[vid] / s) < 1e-9, (vid, got[vid])
    # unweighted on the same graph splits evenly — sanity contrast
    uni = {r["id"]: r["pagerank"] for r in (
        g.page_rank().max_iterations(2).with_tol(0.0)
        .set_checkpoint_dir(str(ckpt_dir) + "/upr").run().collect()
    )}
    assert abs(uni[2] - uni[3]) < 1e-9
    assert got[2] > uni[2] > got[3]


def test_parallel_personalized_pagerank(spark, ckpt_dir):
    """K=2 personalized walks batched into one Pregel loop must be
    element-for-element identical to two independent personalized runs
    (same graph, same rounds) — the batching is a plan optimization, not
    a semantics change. Sources at different hierarchy levels exercise
    chains that converge at different supersteps."""
    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 3)], "src long, dst long"
    )
    g = GraphFrame(v, e)
    par = {r["id"]: r["pageranks"] for r in (
        g.page_rank().parallel_personalized([1, 5]).max_iterations(4)
        .with_tol(0.0).set_checkpoint_dir(str(ckpt_dir) + "/par")
        .run().collect()
    )}
    for i, src in enumerate((1, 5)):
        single = {r["id"]: r["pagerank"] for r in (
            g.page_rank().personalized([src]).max_iterations(4)
            .with_tol(0.0).set_checkpoint_dir(f"{ckpt_dir}/s{src}")
            .run().collect()
        )}
        for vid in range(1, 6):
            assert abs(par[vid][i] - single[vid]) < 1e-9, (src, vid)
    # chain 0 never reaches 5; chain 1 never reaches 1 or 2
    assert par[5][0] == 0.0 and par[1][1] == 0.0 and par[2][1] == 0.0


def test_parallel_personalized_voting_mode(spark, ckpt_dir):
    """tol-voting converges when the SLOWEST chain stops moving; the
    4-path chain needs more rounds than the 1-hop chain."""
    from graphframes_rs_spark.graphframe import GraphFrame

    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 3)], "src long, dst long"
    )
    g = GraphFrame(v, e)
    pr = (
        g.page_rank().parallel_personalized([1, 5]).with_tol(1e-12)
        .set_checkpoint_dir(str(ckpt_dir) + "/vote")
    )
    got = {r["id"]: r["pageranks"] for r in pr.run().collect()}
    # chain 0 fixpoint = full 4-hop geometric series, normalized
    raw = [0.15 * 0.85**k for k in range(4)]
    s = sum(raw)
    for vid, expect in zip((1, 2, 3, 4), raw):
        assert abs(got[vid][0] - expect / s) < 1e-9, (vid, got[vid])
    # deltas die only after the long chain drains: >= 4 supersteps ran
    assert pr.iterations_ >= 4
