import os

from graphframes_rs_spark import ParquetCheckpointer


def test_push_roundtrip_and_evict(spark, tmp_path):
    ck = ParquetCheckpointer(spark, str(tmp_path / "ck"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out1 = ck.push(df, "s")
    assert sorted(r["id"] for r in out1.collect()) == [1, 2]
    assert ck.num_checkpoints == 1
    out2 = ck.push(out1.filter("id = 1"), "s")
    assert ck.num_checkpoints == 2
    ck.evict_all_but_latest(1)
    assert ck.num_checkpoints == 1
    # the latest checkpoint is still readable after eviction of older ones
    assert out2.collect()[0]["v"] == "a"
    ck.purge()
    assert ck.num_checkpoints == 0


def test_empty_dataframe_push(spark, tmp_path):
    """Empty pushes stay readable (either a LocalRelation when no part file
    was emitted, or a scan of an empty parquet file) and never break later
    eviction — the loop-termination path of every iterative operator."""
    ck = ParquetCheckpointer(spark, str(tmp_path / "ck2"))
    df = spark.createDataFrame([], "id long")
    out = ck.push(df, "s")
    assert out.count() == 0
    assert out.schema == df.schema


def test_remove_last_and_bucketed_roundtrip(spark, tmp_path):
    ck = ParquetCheckpointer(spark, str(tmp_path / "ck3"))
    df = spark.createDataFrame([(i, i * 2) for i in range(10)], "id long, v long")
    out = ck.push_bucketed(df, "id", 2, "b")
    assert sorted(r["id"] for r in out.collect()) == list(range(10))
    ck.push(out.filter("id < 5"), "s")
    assert ck.num_checkpoints == 2
    ck.remove_last(1)
    assert ck.num_checkpoints == 1
    # the remaining (bucketed) checkpoint is still readable
    assert out.count() == 10
    ck.purge()
    assert ck.num_checkpoints == 0


def test_bucketed_empty_dataframe(spark, tmp_path):
    ck = ParquetCheckpointer(spark, str(tmp_path / "ck4"))
    df = spark.createDataFrame([], "id long, v long")
    out = ck.push_bucketed(df, "id", 2, "empty")
    assert out.count() == 0
    assert out.schema == df.schema
    ck.purge()


def test_rejects_remote_uri_accepts_file_scheme(spark, tmp_path):
    import pytest
    from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

    with pytest.raises(ValueError, match="local-filesystem"):
        ParquetCheckpointer(spark, "s3a://bucket/ckpt")
    with pytest.raises(ValueError, match="local-filesystem"):
        ParquetCheckpointer(spark, "hdfs://nn:8020/ckpt")
    local = str(tmp_path / "via_file_scheme")
    ckpt = ParquetCheckpointer(spark, "file://" + local)
    assert ckpt.directory == local
    df = ckpt.push(spark.range(3))
    assert df.count() == 3
