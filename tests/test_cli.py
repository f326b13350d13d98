"""CLI runner test (reference main.rs:38-127 dispatch semantics)."""

import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pytest


def _cli_cmd(vpath, epath, algo, param, out, cpus="2", partitions="2"):
    return [
        sys.executable, "-m", "graphframes_rs_spark",
        str(vpath), str(epath), algo, param, str(out),
        "--partitions", partitions, "--cpus", cpus,
    ]


def _run_concurrently(cmds):
    """Run independent CLI subprocesses concurrently (each is its own
    JVM; serial execution paid ~10s of JVM startup per invocation —
    the r14 verify window timed out on exactly this overhead). The
    invocations are identical to the old serial form; only wall-clock
    overlap changes."""
    with ThreadPoolExecutor(max_workers=len(cmds)) as pool:
        return list(
            pool.map(
                lambda c: subprocess.run(
                    c, capture_output=True, text=True, timeout=600
                ),
                cmds,
            )
        )


@pytest.fixture(scope="module")
def graph_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_graph")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT CAST(range AS BIGINT) AS id FROM range(6)) "
        f"TO '{d}/v.parquet' (FORMAT PARQUET)"
    )
    # two components: 0-1-2 chain, 3-4-5 chain; edge file uses the
    # source/target naming the CLI must rename (main.rs:75-81)
    con.execute(
        f"COPY (SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(1 AS BIGINT)), "
        f"(1, 2), (3, 4), (4, 5)) t(source, target)) "
        f"TO '{d}/e.parquet' (FORMAT PARQUET)"
    )
    return d


def test_cli_wcc_end_to_end(graph_parquet, tmp_path):
    out = tmp_path / "wcc_out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "graphframes_rs_spark",
            f"{graph_parquet}/v.parquet",
            f"{graph_parquet}/e.parquet",
            "wcc",
            "42",
            str(out),
            "--partitions",
            "4",
            "--cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = duckdb.sql(f"SELECT id, component FROM '{out}/*.parquet' ORDER BY id").fetchall()
    assert rows == [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)]


def test_cli_new_algorithms_dispatch(graph_parquet, tmp_path):
    """The round-5 algorithms run end-to-end through the CLI: coloring
    (proper, non-NULL), hits (normalized), walks (one per vertex)."""
    import duckdb

    cases = [
        ("coloring", "7", "SELECT count(*) FROM __T__ WHERE color IS NULL"),
        ("hits", "3", "SELECT count(*) FROM __T__ WHERE authority < 0"),
        ("walks", "2", "SELECT count(*) - 6 FROM __T__"),
    ]
    results = _run_concurrently([
        _cli_cmd(f"{graph_parquet}/v.parquet", f"{graph_parquet}/e.parquet",
                 algo, param, tmp_path / f"{algo}_out")
        for algo, param, _ in cases
    ])
    for (algo, param, check), r in zip(cases, results):
        out = tmp_path / f"{algo}_out"
        assert r.returncode == 0, (algo, r.stderr[-2000:])
        con = duckdb.connect()
        bad = con.execute(
            check.replace("__T__", f"'{out}/*.parquet'")
        ).fetchone()[0]
        assert bad == 0, (algo, bad)


def test_cli_session3_algorithms_dispatch(graph_parquet, tmp_path):
    """node2vec (one walk per vertex), anf (positive estimates), fanout
    (rank bounded by k) run end-to-end through the CLI."""
    import duckdb

    cases = [
        ("node2vec", "2,4.0,0.25", "SELECT count(*) - 6 FROM __T__"),
        ("anf", "2", "SELECT count(*) FROM __T__ WHERE nf_est <= 0"),
        ("fanout", "2", "SELECT count(*) FROM __T__ WHERE rank > 2"),
    ]
    results = _run_concurrently([
        _cli_cmd(f"{graph_parquet}/v.parquet", f"{graph_parquet}/e.parquet",
                 algo, param, tmp_path / f"{algo}_out")
        for algo, param, _ in cases
    ])
    for (algo, param, check), r in zip(cases, results):
        out = tmp_path / f"{algo}_out"
        assert r.returncode == 0, (algo, r.stderr[-2000:])
        con = duckdb.connect()
        bad = con.execute(
            check.replace("__T__", f"'{out}/*.parquet'")
        ).fetchone()[0]
        assert bad == 0, (algo, bad)


def test_cli_round5_algorithms_dispatch(graph_parquet, tmp_path):
    """mst / closeness / temporal / eigenvector dispatch end-to-end; the
    attribute-carrying edge file keeps weight+ts through the CLI loader."""
    d = tmp_path / "attr_graph"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT CAST(range AS BIGINT) AS id FROM range(4)) "
        f"TO '{d}/v.parquet' (FORMAT PARQUET)"
    )
    # ring 0-1-2-3-0 with weights 1,2,3,9 and increasing timestamps
    con.execute(
        f"COPY (SELECT * FROM (VALUES "
        f"(CAST(0 AS BIGINT), CAST(1 AS BIGINT), 1.0, CAST(10 AS BIGINT)), "
        f"(1, 2, 2.0, 20), (2, 3, 3.0, 30), (3, 0, 9.0, 40)) "
        f"t(source, target, weight, ts)) "
        f"TO '{d}/e.parquet' (FORMAT PARQUET)"
    )
    cases = [
        ("mst", "weight",
         "SELECT count(*) - 3 FROM __T__"),                    # ring minus max
        ("closeness", "0,2",
         "SELECT count(*) FROM __T__ WHERE harmonic < 0"),
        ("temporal", "0,ts",
         "SELECT count(*) FROM __T__ WHERE id = 3 AND arrival <> 30"),
        ("eigenvector", "2",
         "SELECT count(*) FROM __T__ WHERE eigenvector < 0"),  # cycle: no drain
    ]
    cmds = [
        _cli_cmd(f"{d}/v.parquet", f"{d}/e.parquet",
                 algo, param, tmp_path / f"{algo}_out")
        for algo, param, _ in cases
    ]
    # missing weight column surfaces the clear validation error — runs in
    # the same concurrent wave (independent subprocess)
    cmds.append(
        _cli_cmd(f"{graph_parquet}/v.parquet", f"{graph_parquet}/e.parquet",
                 "mst", "weight", tmp_path / "mst_bad")
    )
    results = _run_concurrently(cmds)
    for (algo, param, check), r in zip(cases, results):
        out = tmp_path / f"{algo}_out"
        assert r.returncode == 0, (algo, r.stderr[-2000:])
        bad = con.execute(
            check.replace("__T__", f"'{out}/*.parquet'")
        ).fetchone()[0]
        assert bad == 0, (algo, bad)
    r = results[-1]
    assert r.returncode != 0
    assert "not found" in r.stderr


def test_cli_katz_densest_dispatch(graph_parquet, tmp_path):
    """katz / densest dispatch end-to-end on the two-chain fixture."""
    cases = [
        # chains: sinks accumulate katz > beta, sources stay at beta
        ("katz", "0.1", "SELECT count(*) FROM __T__ WHERE katz < 1.0"),
        # both 3-vertex chains tie at density 2/3: best snapshot holds all 6
        ("densest", "0.1", "SELECT 6 - count(*) FROM __T__"),
    ]
    import duckdb

    con = duckdb.connect()
    results = _run_concurrently([
        _cli_cmd(f"{graph_parquet}/v.parquet", f"{graph_parquet}/e.parquet",
                 algo, param, tmp_path / f"{algo}_out")
        for algo, param, _ in cases
    ])
    for (algo, param, check), r in zip(cases, results):
        out = tmp_path / f"{algo}_out"
        assert r.returncode == 0, (algo, r.stderr[-2000:])
        bad = con.execute(
            check.replace("__T__", f"read_parquet('{out}/*.parquet')")
        ).fetchone()[0]
        assert bad == 0, (algo, bad)
