"""k-core hand-computed fixtures (reference k_core.rs:289-502)."""

from graphframes_rs_spark import GraphFrame


def _kcore(spark, ckpt_dir, vertices, edges):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    out = GraphFrame(v, e).k_core().set_checkpoint_dir(ckpt_dir).run()
    return {r["id"]: r["kcore"] for r in out.collect()}


def test_triangle_is_2core(spark, ckpt_dir):
    assert _kcore(spark, ckpt_dir, [1, 2, 3], [(1, 2), (2, 3), (3, 1)]) == {
        1: 2, 2: 2, 3: 2,
    }


def test_star_is_1core(spark, ckpt_dir):
    out = _kcore(spark, ckpt_dir, [0, 1, 2, 3], [(0, 1), (0, 2), (0, 3)])
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


def test_triangle_with_tail_kcore_ne_degree(spark, ckpt_dir):
    """Vertex 1 has degree 3 but coreness 2 (the kcore != degree trap,
    k_core.rs:365-389)."""
    out = _kcore(
        spark, ckpt_dir, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)]
    )
    assert out == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_reciprocal_pair_counts_once(spark, ckpt_dir):
    """(0,1) and (1,0) describe ONE undirected edge: core 1 not 2
    (k_core.rs:486-502)."""
    assert _kcore(spark, ckpt_dir, [0, 1], [(0, 1), (1, 0)]) == {0: 1, 1: 1}


def test_isolated_vertex_is_0core(spark, ckpt_dir):
    out = _kcore(spark, ckpt_dir, [1, 2, 9], [(1, 2)])
    assert out == {1: 1, 2: 1, 9: 0}


def test_hierarchy_bands(spark, ckpt_dir):
    """K5 core + mid band + outer chain (k_core.rs:391-484, simplified):
    K5 members have core 4; each mid vertex attaches to 2 core members and
    one outer vertex; outer chain has core <= 2."""
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    mid = []
    for m in range(5, 10):
        mid += [(m, m - 5), (m, (m - 4) % 5)]
    outer = [(m + 5, m) for m in range(5, 10)]
    vertices = list(range(15))
    out = _kcore(spark, ckpt_dir, vertices, k5 + mid + outer)
    for i in range(5):
        assert out[i] == 4, f"K5 vertex {i}"
    for m in range(5, 10):
        assert 2 <= out[m] <= 3, f"mid vertex {m}"
    for o in range(10, 15):
        assert out[o] == 1, f"outer vertex {o}"


def test_kcore_merge_pairs_matches_raw(spark):
    """The histogram fold must equal the raw H-index merge on multisets."""
    from pyspark.sql import functions as F

    from graphframes_rs_spark.operators.k_core import (
        kcore_merge_expr,
        kcore_merge_pairs_expr,
    )

    cases = [
        ([3, 3, 2, 1], 5),
        ([5, 4, 4, 2], 9),
        ([1, 1, 1], 2),
        ([7], 3),
        ([2, 2, 2, 2, 2], 2),
        ([], 4),
    ]
    rows = []
    for i, (msgs, core) in enumerate(cases):
        hist = {}
        for m in msgs:
            hist[m] = hist.get(m, 0) + 1
        rows.append((i, msgs, [{"value": v, "cnt": c} for v, c in hist.items()], core))
    df = spark.createDataFrame(
        rows,
        "id long, msgs array<long>, pairs array<struct<value: long, cnt: long>>, core long",
    )
    out = df.select(
        "id",
        kcore_merge_expr(F.col("msgs"), F.col("core")).alias("raw"),
        kcore_merge_pairs_expr(F.col("pairs"), F.col("core")).alias("packed"),
    ).collect()
    for r in out:
        assert r["raw"] == r["packed"], f"case {r['id']}: {r['raw']} != {r['packed']}"


def test_specialized_loop_equals_pregel(spark, tmp_path):
    """The specialized single-exchange loop (default) must reach the same
    fixpoint as the Pregel-client form on the bipartite lineitem graph."""
    from graphframes_rs_spark.sources.graphs import lineitem_graph

    g = lineitem_graph(spark, "/root/testdata/sf0.001")
    fast = g.k_core().set_checkpoint_dir(str(tmp_path / "s")).run()
    spark.conf.set("spark.graphframes.kcore.specializedLoop", "false")
    try:
        pregel = g.k_core().set_checkpoint_dir(str(tmp_path / "p")).run()
    finally:
        spark.conf.unset("spark.graphframes.kcore.specializedLoop")
    a = {(r["id"], r["kcore"]) for r in fast.collect()}
    b = {(r["id"], r["kcore"]) for r in pregel.collect()}
    assert a == b


def test_incremental_equals_full_rebroadcast(spark, tmp_path):
    """The delta-histogram protocol must match the reference's full
    re-aggregation round-for-round on the bipartite lineitem graph."""
    from graphframes_rs_spark.sources.graphs import lineitem_graph

    g = lineitem_graph(spark, "/root/testdata/sf0.001")
    inc = (
        g.k_core()
        .with_incremental_messages(True)
        .set_checkpoint_dir(str(tmp_path / "i"))
        .run()
    )
    full = (
        g.k_core()
        .with_incremental_messages(False)
        .set_checkpoint_dir(str(tmp_path / "f"))
        .run()
    )
    a = {(r["id"], r["kcore"]) for r in inc.collect()}
    b = {(r["id"], r["kcore"]) for r in full.collect()}
    assert a == b


def test_change_tolerance_upper_bound_and_exact_default(spark, tmp_path):
    """with_change_tolerance: tolerance 0 (default) reaches the exact
    fixpoint; a huge tolerance stops after the FIRST refinement and every
    estimate is a pointwise upper bound on true coreness (H-index
    refinement from degree seeds is monotone non-increasing). A long
    chain off a clique forces a multi-round trajectory."""
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(i, i + 1) for i in range(10, 30)]
    edges = k5 + [(4, 10)] + chain
    vertices = sorted({u for e in edges for u in e})
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")

    def build(tol, seed_rounds):
        return (
            GraphFrame(v, e)
            .k_core()
            .with_fused_seed_rounds(seed_rounds)
            .with_change_tolerance(tol)
            .set_checkpoint_dir(str(tmp_path / f"t{tol}_{seed_rounds}"))
        )

    exact_b = build(0, 0)
    exact = {r["id"]: r["kcore"] for r in exact_b.run().collect()}
    assert len(exact_b.round_changes_) >= 3  # multi-round trajectory
    assert exact_b.round_changes_[-1] == 0
    assert exact[0] == 4 and exact[15] == 1  # clique 4-core, chain 1-core

    trunc_b = build(10**9, 0)
    trunc = {r["id"]: r["kcore"] for r in trunc_b.run().collect()}
    assert len(trunc_b.round_changes_) == 1  # stopped after round 1
    assert all(trunc[i] >= exact[i] for i in vertices)  # upper bounds

    import pytest

    with pytest.raises(ValueError):
        build(-1, 0)


def test_change_tolerance_rejected_on_pregel_path(spark, tmp_path):
    """with_change_tolerance only exists on the specialized loop; routing
    to the Pregel form with a tolerance set must refuse loudly instead of
    silently running to the exact fixpoint."""
    import pytest

    v = spark.createDataFrame([(1,), (2,)], "id long")
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    b = (
        GraphFrame(v, e)
        .k_core()
        .with_incremental_messages(True)
        .with_change_tolerance(5)
        .set_checkpoint_dir(str(tmp_path))
    )
    with pytest.raises(ValueError, match="specialized"):
        b.run()
