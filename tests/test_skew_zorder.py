"""Salted-aggregate/join equivalence, z-order pruning, graph round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame
from graphframes_rs_spark.pipeline import skew
from graphframes_rs_spark.sources import sinks
from graphframes_rs_spark.sources.graphs import load_graph, save_graph


def _skewed(spark, hot=2000, cold=50):
    # key 0 owns `hot` rows (distinct payloads -> salts spread), keys 1..10
    # own `cold` each
    rows = [(0, i) for i in range(hot)] + [
        (k, i) for k in range(1, 11) for i in range(cold)
    ]
    return spark.createDataFrame(rows, "k long, v long")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in skew.salted_agg(
            df,
            ["k"],
            [F.count("*").alias("pn"), F.sum("v").alias("ps"), F.max("v").alias("pm")],
            [F.sum("pn").alias("n"), F.sum("ps").alias("s"), F.max("pm").alias("mx")],
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_actually_fans_out_hot_key(spark):
    df = _skewed(spark)
    partial = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(8))
    ).groupBy("k", "__salt").count()
    # the hot key occupies >1 salt bucket (deterministic hash over payloads)
    assert partial.filter(F.col("k") == 0).count() > 4


def test_salted_agg_rejects_degenerate_buckets(spark):
    with pytest.raises(ValueError):
        skew.salted_agg(_skewed(spark, 5, 1), ["k"], [], [], buckets=1)


def test_replicated_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(8)], "k long, name string"
    )
    plain = big.join(small, "k").groupBy("k", "name").count()
    salted = skew.replicated_broadcast_join(big, small, ["k"], buckets=4)
    got = salted.groupBy("k", "name").count()
    assert sorted(got.collect()) == sorted(plain.collect())
    assert "__salt" not in salted.columns


def test_replicated_join_left_keeps_unmatched(spark):
    big = _skewed(spark, hot=10, cold=2)
    small = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = skew.replicated_broadcast_join(big, small, ["k"], buckets=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("name").isNull()).count() == big.filter("k <> 0").count()


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    import pyarrow.parquet as pq

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    sinks.write_zordered(orders, zpath, ["o_custkey", "o_orderkey"], num_files=8)
    sinks.write_sorted(orders, spath, ["o_custkey"], num_files=8)
    assert spark.read.parquet(zpath).count() == orders.count()

    def overlap_fraction(path, col, probes):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        hits = total = 0
        for v in probes:
            for f in files:
                md = pq.read_metadata(f)
                idx = md.schema.names.index(col)
                lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
                hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
                total += 1
                if lo <= v <= hi:
                    hits += 1
        return hits / total

    probes = [r["o_orderkey"] for r in orders.orderBy("o_orderkey").limit(40).collect()][::8]
    # the single-column layout sorts o_custkey only: o_orderkey spans
    # nearly every file. Z-order clusters both: point probes on the
    # SECONDARY column overlap strictly fewer files.
    z_frac = overlap_fraction(zpath, "o_orderkey", probes)
    s_frac = overlap_fraction(spath, "o_orderkey", probes)
    assert z_frac < s_frac, (z_frac, s_frac)


def test_zorder_validations(spark):
    with pytest.raises(ValueError):
        sinks.zorder_value([("a", 0, 10)])
    with pytest.raises(ValueError):
        sinks.zorder_value([("a", 0, 10)] * 4, bits=16)
    with pytest.raises(ValueError):
        sinks.zorder_value([("a", 0, 10), ("b", 5, 5)])


def test_graph_save_load_round_trip(spark, tmp_path):
    v = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    e = spark.createDataFrame([(1, 2, 0.5)], "src long, dst long, w double")
    g = GraphFrame(v, e)
    save_graph(g, str(tmp_path / "g"))
    back = load_graph(spark, str(tmp_path / "g"))
    assert sorted(back.vertices.collect()) == sorted(v.collect())
    assert sorted(back.edges.collect()) == sorted(e.collect())
    assert back.vertices.schema == v.schema and back.edges.schema == e.schema
