"""Replicates the driver's t2 correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB over the same
parquet tables (sf0.01), then compare row count, column names, and
order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry
from graphframes_rs_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"

ORACLES = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    # POLICY: queries() entries must be NULL-free (coalesce subtotal keys
    # etc. at the entry level) — None is unorderable against real values
    # here, and the driver-side comparator is an unknown quantity on NULLs.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    # POLICY: entries must be scalar-typed — the driver's pandas
    # canonicalizer cannot sort array/map/struct columns (round-5 reds).
    # Serialize arrays ('->'-join) or posexplode them at the entry level.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed columns {complex_cols} are not "
        "driver-comparable; scalarize them in the entry projection"
    )
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) vs {len(d_rows)} (duckdb)"
    )
    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: values differ; first diffs: {diffs}")


def test_every_query_runs_rows_only(spark):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.columns == ["id", "pagerank"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_driver_safe(duck, name):
    """Entry policy: no oracle may emit a HUGEINT (or UHUGEINT) column.
    The driver compares through a pandas round-trip, where DuckDB's
    HUGEINT — the un-CAST ``sum()`` of any integer column — degrades to
    float64 (121.0) while Spark emits int64 (121): raw values equal,
    value-hash red (the round-6 ``conductance`` defect). DESCRIBE plans
    the query without running it, so this lint is cheap and exact where
    a ``CAST``-regex lint would be brittle."""
    bad = [
        (col, typ)
        for col, typ, *_ in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
        if "HUGEINT" in typ.upper()
    ]
    assert not bad, (
        f"{name}: oracle emits HUGEINT columns {bad}; wrap the aggregate "
        "in CAST(... AS BIGINT) so the driver's pandas path keeps int64"
    )


def test_verification_order_rotates_with_artifacts(tmp_path):
    """The served queries() order must be driven by the committed
    CORRECTNESS artifacts: never-checked entries first (declaration
    order), then reds at their latest check, then greens least-recently-
    verified first — so each driver round's 50-entry window always hits
    the entries with the least evidence, and a green round ROTATES the
    next round's front instead of re-proving the same prefix."""
    import json as _json

    base = {f"q{i}": (lambda s, d: None) for i in range(6)}
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red = dict(green, hash_match=False)
    no_oracle = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 1, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        _json.dumps({"q0": green, "q1": green, "q2": red}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        _json.dumps({"q1": green, "q3": no_oracle}))

    order = list(entry._verification_order(base, str(tmp_path)))
    # q4, q5 never checked (declaration order); q2 red@r1, q3 red@r2;
    # greens stalest-first: q0 (r1) before q1 (r2)
    assert order == ["q4", "q5", "q2", "q3", "q0", "q1"]

    # a later green flip moves q2 behind the other greens
    (tmp_path / "CORRECTNESS_r03.json").write_text(_json.dumps({"q2": green}))
    assert list(entry._verification_order(base, str(tmp_path))) == [
        "q4", "q5", "q3", "q0", "q1", "q2"]
