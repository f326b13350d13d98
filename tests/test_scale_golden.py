"""Opt-in scale CORRECTNESS gate (``pytest -m scale``).

The reference carries an ``#[ignore]``'d 17M-edge LDBC ``kgs`` WCC test
(reference ``src/algorithm/connectivity/connected_components.rs:705-746``)
that asserts exact per-vertex component parity against the published LDBC
result file; the dataset is download-on-demand and not bundled. This gate
ports the CONTRACT — exact component parity at the ~18M-edge scale the
engine benches — onto the bench's deterministic 18M-edge synthetic tier,
with the expected labels COMPUTED by an independent engine (a DuckDB
min-label fixpoint) instead of shipped: the scale path gets a correctness
gate, not just a bench wall.

Excluded from default runs via ``-m "not scale"`` in addopts (the tier
generates ~300 MB of parquet and runs minutes); ``pytest -m scale``
overrides the marker filter and runs exactly this file.
"""

import os

import duckdb
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame

# the bench's 18m tier recipe, verbatim (bench.py _prepare_scale_graph):
# src/dst are xxhash64-derived, so the graph is bit-identical to the one
# every BENCH_r*.json row measures — the gate certifies THAT graph
VERTICES = 6_000_000
EDGES = 18_000_000


@pytest.fixture(scope="module")
def spark_big(tmp_path_factory):
    """Dedicated big-heap session for the scale gates: the shared test
    session's default ~1 GB driver heap OOMs on an 18M-edge contraction
    (measured), and driver memory cannot change after start. Safe to
    coexist with conftest's session fixture because a ``-m scale`` run
    deselects every test that would request it."""
    ckpt = str(tmp_path_factory.mktemp("scale_ckpt"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # getOrCreate() silently IGNORES driver-memory config if a session is
    # already live in this process — the gate would then run on the shared
    # ~1 GB heap and OOM with a confusing executor stack. Fail loudly
    # instead of inheriting the wrong heap.
    existing = SparkSession.getActiveSession()
    if existing is not None:
        pytest.fail(
            "scale gate needs a fresh JVM with a 32g driver heap, but a "
            f"SparkSession already exists ({existing.sparkContext.appName!r}) "
            "and getOrCreate() would silently ignore spark.driver.memory. "
            "Run this file alone: `pytest -m scale` (which deselects every "
            "test that builds the shared session)."
        )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes-rs-spark-scale-gate")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(ckpt)
    yield spark
    spark.stop()


@pytest.mark.scale
def test_wcc_18m_exact_parity_vs_duckdb_fixpoint(spark_big, tmp_path):
    spark = spark_big
    # tmp_path, not mkdtemp: the tier is ~600 MB of parquet and pytest's
    # fixture retention/cleanup handles it (mkdtemp would accumulate)
    base = str(tmp_path / "gf_scale_gate")
    src = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(VERTICES))
    dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(VERTICES))
    edges = spark.range(EDGES).select(
        src.cast("long").alias("src"), dst.cast("long").alias("dst")
    )
    edges.write.mode("overwrite").parquet(base + "/edges")
    vertices = spark.range(VERTICES).select(F.col("id"))
    g = GraphFrame(vertices, spark.read.parquet(base + "/edges"))

    result = (
        g.connected_components()
        .set_checkpoint_dir(str(tmp_path / "ckpt"))
        .run()
    )
    result.write.mode("overwrite").parquet(base + "/result")

    # Independent oracle: undirected min-label propagation to fixpoint
    # in DuckDB. Converges in O(diameter) rounds (~15 on this random
    # graph); every vertex ends at the min id reachable from it — the
    # same min-member labeling contract the LDBC goldens pin at small
    # scale (tests/test_algorithms_golden.py).
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE e AS "
        f"SELECT src, dst FROM read_parquet('{base}/edges/*.parquet') "
        f"UNION ALL "
        f"SELECT dst, src FROM read_parquet('{base}/edges/*.parquet')"
    )
    con.execute(
        f"CREATE TABLE lbl AS SELECT range AS id, range AS comp "
        f"FROM range({VERTICES})"
    )
    for _ in range(200):
        con.execute(
            "CREATE OR REPLACE TABLE nxt AS "
            "SELECT l.id, least(l.comp, coalesce(m.mc, l.comp)) AS comp "
            "FROM lbl l LEFT JOIN ("
            "  SELECT e.dst AS id, min(l2.comp) AS mc "
            "  FROM e JOIN lbl l2 ON l2.id = e.src GROUP BY e.dst"
            ") m ON m.id = l.id"
        )
        changed = con.execute(
            "SELECT count(*) FROM nxt JOIN lbl USING (id) "
            "WHERE nxt.comp <> lbl.comp"
        ).fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE nxt RENAME TO lbl")
        if changed == 0:
            break
    else:
        pytest.fail("DuckDB fixpoint did not converge in 200 rounds")

    # exact per-vertex parity — the reference test's assert_eq(diff, 0)
    diff = con.execute(
        f"SELECT count(*) FROM "
        f"read_parquet('{base}/result/*.parquet') r "
        f"JOIN lbl ON lbl.id = r.id "
        f"WHERE r.component <> lbl.comp"
    ).fetchone()[0]
    n_result = con.execute(
        f"SELECT count(*) FROM read_parquet('{base}/result/*.parquet')"
    ).fetchone()[0]
    assert n_result == VERTICES
    assert diff == 0, f"{diff} vertices with mismatched component"
