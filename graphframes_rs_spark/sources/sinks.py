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
