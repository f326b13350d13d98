"""Sink contracts: partition pruning, ORC round-trip + pushdown, sorted files.

These are plan-level performance contracts in the spirit of
test_plan_shape.py — a partitioned layout whose reads DON'T prune, or an
ORC scan that doesn't push filters, is a silent 100 TB regression even
though every value round-trips."""

import os

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.sources import sinks


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def test_partitioned_write_prunes_partitions(spark, orders, tmp_path):
    path = str(tmp_path / "by_status")
    sinks.write_partitioned(orders, path, ["o_orderstatus"])
    # hive layout on disk: one dir per status value
    dirs = sorted(d for d in os.listdir(path) if d.startswith("o_orderstatus="))
    assert len(dirs) >= 2
    back = spark.read.parquet(path)
    one = back.filter(F.col("o_orderstatus") == "F")
    plan = _executed_plan(one)
    # the status filter must prune directories, not scan-and-filter
    assert "PartitionFilters" in plan, plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200], plan
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert one.count() == expected


def test_partitioned_write_no_small_files_explosion(spark, orders, tmp_path):
    path = str(tmp_path / "by_status2")
    sinks.write_partitioned(orders, path, ["o_orderstatus"], mode="overwrite")
    # repartition-by-key first => each partition dir holds ONE data file
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if os.path.isdir(full):
            files = [f for f in os.listdir(full) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)


def test_orc_round_trip_and_pushdown(spark, orders, tmp_path):
    path = str(tmp_path / "orders_orc")
    sinks.write_orc(orders, path)
    back = sinks.read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    # values identical (checksum the price column both ways)
    a = orders.agg(F.round(F.sum("o_totalprice"), 4).alias("s")).collect()[0]["s"]
    b = back.agg(F.round(F.sum("o_totalprice"), 4).alias("s")).collect()[0]["s"]
    assert a == b
    filtered = back.select("o_orderkey").filter(F.col("o_orderkey") == 7)
    plan = _executed_plan(filtered)
    assert "PushedFilters" in plan and "o_orderkey" in plan, plan
    # column pruning reaches the ORC scan
    assert "o_totalprice" not in plan.split("ReadSchema")[1][:300], plan


def test_write_sorted_files_are_sorted_and_ranged(spark, orders, tmp_path):
    path = str(tmp_path / "orders_sorted")
    sinks.write_sorted(orders, path, ["o_orderkey"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # per-file sortedness: within every parquet file the key is monotone
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys), f
        ranges.append((keys[0], keys[-1]))
    # range partitioning: file key ranges don't interleave
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_partitioned_write_rejects_empty_cols(spark, orders, tmp_path):
    with pytest.raises(ValueError):
        sinks.write_partitioned(orders, str(tmp_path / "x"), [])
    with pytest.raises(ValueError):
        sinks.write_sorted(orders, str(tmp_path / "y"), [])


def test_compact_parquet_reduces_files_preserves_rows(spark, orders, tmp_path):
    from graphframes_rs_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "many_small")
    orders.repartition(37).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before == 37
    stats = compact_parquet(spark, path, target_file_mb=256)
    assert stats["files_before"] == 37
    assert stats["files_after"] < 37
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema


def test_compact_parquet_with_resort(spark, orders, tmp_path):
    import pyarrow.parquet as pq
    from graphframes_rs_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "resort")
    orders.repartition(20).write.parquet(path)
    compact_parquet(spark, path, target_file_mb=1, sort_cols=["o_orderkey"])
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    for f in files:
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys)
    assert spark.read.parquet(path).count() == orders.count()
