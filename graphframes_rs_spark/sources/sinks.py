"""Batch sinks: partitioned parquet, ORC, and sorted single-key outputs.

The reference's only sink is parquet (checkpoints + CLI output,
`/root/reference/src/memory/parquet_checkpointer.rs`, `src/main.rs`);
this module rounds the surface out to what a lakehouse pipeline needs:

* ``write_partitioned`` — hive-style ``partitionBy`` layout so downstream
  readers get PARTITION PRUNING (a filter on the partition column skips
  whole directories — the only filter that costs zero IO at 100 TB).
  The write repartitions by the partition columns first: without it,
  every task holding rows of k partitions writes k small files
  (task_count × partition_count files total — the classic small-files
  explosion); with it, each partition's rows concentrate in one task.
  ``max_records_per_file`` caps file size so one giant partition still
  splits into parallel-readable files.
* ``write_orc`` / ``read_orc`` — Spark's built-in columnar alternative;
  same predicate-pushdown + column-pruning contract as parquet (ORC
  readers push filters into stripe/row-group skipping).
* ``write_sorted`` — per-file sorted parquet via ``sortWithinPartitions``
  after a range repartition: gives min/max row-group statistics their
  bite (a point filter on the sort key skips all but one file's groups).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "error",
    max_records_per_file: Optional[int] = None,
) -> None:
    cols = list(partition_cols)
    if not cols:
        raise ValueError("partition_cols must be non-empty; use df.write directly")
    w = df.repartition(*cols).write.mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.format(fmt).save(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "error",
) -> None:
    cols = list(sort_cols)
    if not cols:
        raise ValueError("sort_cols must be non-empty")
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(cols: Sequence, bits: int = 16):
    """Z-order (Morton) key over numeric columns: each column min-max
    scales to ``bits`` bits (requires the (min, max) pairs precomputed —
    one cheap agg — so the expression stays deterministic and narrow),
    then the bits interleave. Rows close in the z-curve are close in
    EVERY dimension, which is what gives multi-column min/max pruning its
    bite — a single-column sort only clusters the leading column.

    ``cols`` is a list of (column, lo, hi) triples; returns a LongType
    expression. bits * len(cols) must be <= 62."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_sorted for 1")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must fit a signed long")
    scaled = []
    for c, lo, hi in cols:
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            raise ValueError(f"column {c}: hi must exceed lo")
        x = ((col.cast("double") - float(lo)) / span * ((1 << bits) - 1))
        scaled.append(
            F.least(F.greatest(x, F.lit(0.0)), F.lit(float((1 << bits) - 1)))
            .cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, x in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
    mode: str = "error",
) -> None:
    """Parquet clustered along the Z-curve of ``cols``: one agg computes
    each column's (min, max), rows sort by the interleaved-bit key via
    ``repartitionByRange + sortWithinPartitions``, and the key itself is
    dropped before writing. Point/range filters on ANY of the columns
    then skip most files/row-groups on min-max statistics — the lakehouse
    layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) on plain parquet."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    triples = [(c, row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols]
    z = zorder_value(triples, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    sort_cols: Optional[Sequence[str]] = None,
) -> dict:
    """Small-file compaction for a plain parquet directory: rewrite to
    ceil(total_bytes / target_file_mb) files via a sibling temp dir + two
    directory renames. Readers never see a HALF-WRITTEN layout (the new
    files become visible only by the final rename), but the swap itself is
    not atomic: between the two renames the table path briefly does not
    exist, so a reader racing the swap can hit a transient not-found —
    run compaction when the table has no concurrent readers, or point
    readers at a catalog/manifest layer. All directory operations go
    through the Hadoop ``FileSystem`` API resolved from the path's scheme
    (same code path as the checkpointer), so ``file://``, ``hdfs://`` and
    object stores with rename support work alike; note object-store
    renames (``s3a://``) are copies, not metadata ops.

    Long-running ingest — streaming sinks, per-batch appends, hive
    partitions written task-per-task — accretes thousands of KB-sized
    files; each costs a scan task + a NameNode/liststatus entry, and at
    100 TB file-count, not byte-count, becomes the scan bottleneck.
    Optionally re-sorts while it is at it (``sort_cols`` — compaction is
    the natural moment to restore clustering). Returns
    {files_before, files_after, bytes}."""
    import math

    from graphframes_rs_spark.plans.checkpointer import _HadoopFS

    fs = _HadoopFS(spark, path)
    files = [
        (name, size)
        for name, size in fs.list_files(path)
        if name.endswith(".parquet") and not name.startswith(".")
    ]
    total = sum(size for _, size in files)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if sort_cols:
        (
            df.repartitionByRange(n_out, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("error").parquet(tmp)
        )
    else:
        df.coalesce(n_out).write.mode("error").parquet(tmp)
    # Hadoop FileSystem.rename signals failure by returning false, not
    # by raising — check each step, and if the second rename fails roll
    # the original directory back before raising: deleting ``old``
    # unconditionally would destroy the only remaining copy.
    old = path.rstrip("/") + "__compact_old"
    if not fs.rename(path.rstrip("/"), old):
        fs.delete_recursive(tmp)
        raise IOError(
            f"compact_parquet: rename {path!r} -> {old!r} failed; "
            "table left untouched, temp output removed"
        )
    if not fs.rename(tmp, path.rstrip("/")):
        restored = fs.rename(old, path.rstrip("/"))
        raise IOError(
            f"compact_parquet: rename {tmp!r} -> {path!r} failed; "
            + (
                "original table restored"
                if restored
                else f"ROLLBACK ALSO FAILED — data is at {old!r}"
            )
        )
    fs.delete_recursive(old)
    out_files = [
        name for name, _ in fs.list_files(path) if name.endswith(".parquet")
    ]
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bytes": total,
    }
