"""asof_join: hand-checked point-in-time semantics, tolerance nulling,
and agreement with DuckDB's native ASOF JOIN on shared data."""

import duckdb
import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline.joins import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 5, "t2"), (2, 7, "t3"), (3, 4, "t4")],
        "sym long, ts long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 4, 100.0), (1, 9, 110.0), (1, 11, 120.0), (2, 7, 200.0)],
        "sym long, ts long, px double",
    )
    return trades, quotes


def test_asof_hand_checked(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade"]: (r["ts_right"], r["px_right"])
        for r in asof_join(trades, quotes, "sym").collect()
    }
    assert out["t1"] == (9, 110.0)    # latest quote <= 10
    assert out["t2"] == (4, 100.0)
    assert out["t3"] == (7, 200.0)    # tie: quote AT the trade ts matches
    assert out["t4"] == (None, None)  # no quotes for sym 3
    # left row count preserved
    assert asof_join(trades, quotes, "sym").count() == 4


def test_asof_matches_duckdb_native(spark):
    """Cross-check against an INDEPENDENT implementation: DuckDB's ASOF."""
    trades, quotes = _frames(spark)
    got = {
        (r["sym"], r["ts"]): (r["ts_right"], r["px_right"])
        for r in asof_join(trades, quotes, "sym").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(sym BIGINT, ts BIGINT, trade VARCHAR); "
        "INSERT INTO t VALUES (1,10,'t1'),(1,5,'t2'),(2,7,'t3'),(3,4,'t4'); "
        "CREATE TABLE q(sym BIGINT, ts BIGINT, px DOUBLE); "
        "INSERT INTO q VALUES (1,4,100.0),(1,9,110.0),(1,11,120.0),(2,7,200.0)"
    )
    want = {
        (s, ts): (rts, px)
        for s, ts, rts, px in con.execute(
            "SELECT t.sym, t.ts, q.ts, q.px FROM t "
            "ASOF LEFT JOIN q ON t.sym = q.sym AND q.ts <= t.ts"
        ).fetchall()
    }
    assert got == want


def test_asof_tolerance_and_collision(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "buy")],
        "user long, ts string, act string",
    ).withColumn("ts", F.to_timestamp("ts"))
    snap = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", 5.0)],
        "user long, ts string, score double",
    ).withColumn("ts", F.to_timestamp("ts"))
    fresh = asof_join(ev, snap, "user", tolerance_seconds=3 * 3600).collect()[0]
    assert fresh["score_right"] == 5.0
    stale = asof_join(ev, snap, "user", tolerance_seconds=3600).collect()[0]
    assert stale["score_right"] is None and stale["ts_right"] is None
    # suffixed-name collision is rejected
    bad = ev.withColumn("score_right", F.lit(1.0))
    with pytest.raises(ValueError):
        asof_join(bad, snap, "user")
