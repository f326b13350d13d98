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
