"""Snapshot diff + bucketed merge-upsert semantics."""

import glob
import os

from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline.cdc import (
    merge_upsert,
    snapshot_diff,
    write_bucketed_table,
)


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    out = {r.id: r.change for r in snapshot_diff(old, new, "id").collect()}
    assert out == {1: "deleted", 2: "unchanged", 3: "updated", 4: "inserted"}


def test_merge_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    write_bucketed_table(base, path, "id", num_buckets=16)

    # record per-bucket file sets before the upsert
    def bucket_files():
        out = {}
        for d in glob.glob(os.path.join(path, "__bucket=*")):
            out[os.path.basename(d)] = sorted(os.listdir(d))
        return out

    before = bucket_files()
    updates = spark.createDataFrame(
        [(7, 777), (1007, 111)], "id long, v long"
    )
    n = merge_upsert(spark, path, updates, "id", num_buckets=16)
    assert 1 <= n <= 2

    after = bucket_files()
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == n  # untouched buckets keep their exact files

    final = spark.read.parquet(path)
    assert final.count() == 1001  # 1000 originals + 1 new key
    got = {r.id: r.v for r in final.filter(F.col("id").isin(7, 8, 1007)).collect()}
    assert got[7] == 777 and got[1007] == 111
    assert got[8] == 16  # untouched row intact


def test_streaming_upsert_applies_batches_idempotently(spark, tmp_path):
    """foreachBatch CDC apply: stream a feed of updates (with duplicate
    keys, __seq ordering) into a bucketed table; the final table must be
    last-writer-wins per key and only the touched buckets rewrite."""
    from graphframes_rs_spark.pipeline.cdc import streaming_upsert

    path = str(tmp_path / "tbl_stream")
    base = spark.range(0, 200).select(F.col("id"), (F.col("id") * 2).alias("v"))
    write_bucketed_table(base, path, "id", num_buckets=8)

    feed_dir = str(tmp_path / "feed")
    updates = spark.createDataFrame(
        # key 5 updated twice — seq 2 must win; key 1005 is an insert
        [(5, 500, 1), (5, 555, 2), (9, 900, 1), (1005, 1, 1)],
        "id long, v long, __seq long",
    )
    updates.write.json(feed_dir)
    stream = spark.readStream.schema(updates.schema).json(feed_dir)
    q = streaming_upsert(
        stream,
        path,
        "id",
        num_buckets=8,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)

    final = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert final[5] == 555
    assert final[9] == 900
    assert final[1005] == 1
    assert final[7] == 14  # untouched key unchanged
    assert len(final) == 201

    # restart over the same checkpoint: no new data -> no change (idempotent)
    stream2 = spark.readStream.schema(updates.schema).json(feed_dir)
    q2 = streaming_upsert(
        stream2, path, "id", num_buckets=8,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(180)
    again = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert again == final
