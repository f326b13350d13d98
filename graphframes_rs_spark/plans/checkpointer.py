"""Parquet checkpoint manager for iterative dataflow.

Why this exists (and is load-bearing, not an optimization): Spark's
analyzer cost grows superlinearly with logical-plan depth. An iterative
algorithm that rewrites its state DataFrame every superstep would build a
plan that doubles per iteration and stall the driver. Writing the state to
parquet and re-reading it truncates lineage to a flat scan, exactly like
the reference's ``ParquetCheckpointer``
(reference: src/memory/parquet_checkpointer.rs:80-165).

Checkpoint directories may live on ANY store Spark itself can write —
bare local paths, ``file://``, ``hdfs://``, ``s3a://``, ... — like the
reference's ``with_checkpoint_store(ObjectStoreUrl)``
(parquet_checkpointer.rs:80-131). The driver-side bookkeeping
(existence checks, recursive deletes) goes through the Hadoop
``FileSystem`` API resolved from the SAME Hadoop configuration Spark's
writers use, so a scheme that writes also evicts.

Eviction keeps disk usage bounded: a new checkpoint is always written
*before* older ones are deleted, so a live DataFrame handle never points at
removed files (same ordering contract as the reference WCC driver,
connected_components.rs "write first ... avoids a NotFound").
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession


class _HadoopFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for the
    checkpoint bookkeeping. The filesystem instance is resolved from the
    checkpoint directory's scheme + the session's Hadoop configuration, so
    local paths, ``file://``, ``hdfs://`` and object stores (``s3a://`` &c,
    given their connector jars) all work through the one code path."""

    def __init__(self, spark: SparkSession, directory: str):
        sc = spark.sparkContext
        self._path_cls = sc._jvm.org.apache.hadoop.fs.Path
        self._fs = self._path_cls(directory).getFileSystem(
            sc._jsc.hadoopConfiguration()
        )

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path_cls(path))

    def delete_recursive(self, path: str) -> None:
        self._fs.delete(self._path_cls(path), True)

    def rename(self, src: str, dst: str) -> bool:
        return self._fs.rename(self._path_cls(src), self._path_cls(dst))

    def list_files(self, path: str) -> List[Tuple[str, int]]:
        """[(name, size)] for direct children of ``path``."""
        return [
            (st.getPath().getName(), st.getLen())
            for st in self._fs.listStatus(self._path_cls(path))
        ]

    def has_parquet_parts(self, path: str) -> bool:
        p = self._path_cls(path)
        if not self._fs.exists(p):
            return False
        return any(
            st.getPath().getName().endswith(".parquet")
            for st in self._fs.listStatus(p)
        )


class ParquetCheckpointer:
    def __init__(self, spark: SparkSession, directory: Optional[str] = None):
        self.spark = spark
        if directory is None:
            directory = os.path.join(
                tempfile.gettempdir(), f"gf_ckpt_{uuid.uuid4().hex[:12]}"
            )
        self.directory = directory.rstrip("/")
        self._fs = _HadoopFS(spark, self.directory)
        self._fs.mkdirs(self.directory)
        self._seq = 0
        self._uid = uuid.uuid4().hex[:10]
        # (path, table_name_or_None) per live checkpoint, oldest first
        self._entries: List[Tuple[str, Optional[str]]] = []

    @property
    def _paths(self) -> List[str]:
        return [p for p, _ in self._entries]

    def push(self, df: DataFrame, name: str = "state") -> DataFrame:
        """Materialize ``df`` to parquet and return a fresh scan of it.

        The write IS the only execution — emptiness is detected from the
        written files afterwards, never via a pre-flight ``isEmpty()``
        (which would execute every upstream shuffle stage a second time).
        An empty result leaves no parquet part files; it comes back as a
        fresh LocalRelation so the returned handle carries NO lineage over
        earlier checkpoint files (which eviction may delete later) —
        mirroring the reference's empty-frame passthrough
        (parquet_checkpointer.rs:93-102).
        """
        path = f"{self.directory}/{self._seq:05d}_{name}"
        self._seq += 1
        df.write.mode("overwrite").parquet(path)
        if not self._fs.has_parquet_parts(path):
            self._fs.delete_recursive(path)
            return self.spark.createDataFrame([], df.schema)
        self._entries.append((path, None))
        return self.spark.read.parquet(path)

    def push_partitioned(
        self,
        df: DataFrame,
        key: str,
        num_partitions: int,
        name: str = "state",
        assume_partitioned: bool = False,
    ) -> DataFrame:
        """Checkpoint hash-partitioned by ``key`` — the files come back
        clustered by the join key so the next superstep's shuffle reads are
        local-ish. (The shuffle itself is not elided without bucketed-table
        metadata; for that use :meth:`push_bucketed`.)

        ``assume_partitioned``: caller guarantees ``df`` already ends in
        Murmur3 ``HashPartitioning(key, num_partitions)`` (e.g. it is the
        output of an equi-join/aggregate keyed on ``key``), so the write
        skips its repartition — eliding one full exchange of the frame."""
        if not assume_partitioned:
            df = df.repartition(num_partitions, key)
        return self.push(df, name)

    def push_bucketed(
        self,
        df: DataFrame,
        key: str,
        num_buckets: int,
        name: str = "state",
        assume_partitioned: bool = False,
    ) -> DataFrame:
        """Checkpoint as a hash-BUCKETED, per-bucket-sorted parquet table and
        return a scan that *declares* ``HashPartitioning(key, num_buckets)``.

        This is the Spark-native form of the reference's shuffle-free
        sorted-merge iteration (``push_pre_sorted`` + the partitioning-aware
        re-read TableProvider, src/memory/hash_partitioned.rs:36-360): a join
        of two such checkpoints on their bucket keys with matching bucket
        counts is planned as SMJ with NO Exchange on either side, so the
        per-superstep join of an iterative algorithm stops re-shuffling state
        that was already hash-placed when it was written. The invariant the
        reference documents (writer N == reader N == session partitions,
        parquet_checkpointer.rs:108-119) maps to bucket metadata here, which
        Spark enforces for us.

        Requires a catalog (any in-memory-catalog session works); rows are
        also sorted within buckets so enabling
        ``spark.sql.legacy.bucketedTableScan.outputOrdering`` can elide the
        SMJ sort too.
        """
        table = f"gf_ckpt_{self._uid}_{self._seq}_{name}".lower()
        path = f"{self.directory}/{self._seq:05d}_{name}"
        self._seq += 1
        # repartition on the key first: Spark's repartition and bucketing
        # use the same Murmur3 hash family, so each task then holds
        # exactly one bucket's rows and writes exactly one file — the
        # reference's one-file-per-bucket layout (hash_partitioned.rs).
        # With ``assume_partitioned`` the caller vouches the frame already
        # carries that exact partitioning (same Murmur3 family from an
        # id-keyed join/aggregate), eliding one full exchange per write;
        # if the guarantee ever failed, the bucket writer would still place
        # every row in its correct bucket — buckets would merely span
        # multiple files (losing the sorted-scan metadata), never misjoin.
        if not assume_partitioned:
            df = df.repartition(num_buckets, key)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(table)
        )
        self._entries.append((path, table))
        return self.spark.table(table)

    # -- eviction bookkeeping (parquet_checkpointer.rs:134-165) -------------
    def _delete(self, entry: Tuple[str, Optional[str]]) -> None:
        path, table = entry
        if table is not None:
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        self._fs.delete_recursive(path)

    def evict(self, n: int = 1) -> None:
        """Delete the ``n`` oldest checkpoints."""
        for entry in self._entries[:n]:
            self._delete(entry)
        self._entries = self._entries[n:]

    def evict_all_but_latest(self, n: int = 1) -> None:
        if len(self._entries) > n:
            self.evict(len(self._entries) - n)

    def remove_last(self, n: int = 1) -> None:
        """Forget (and delete) the n most recent checkpoints."""
        if n <= 0:
            return
        for entry in self._entries[-n:]:
            self._delete(entry)
        self._entries = self._entries[: len(self._entries) - n]

    def purge(self) -> None:
        for entry in self._entries:
            self._delete(entry)
        self._fs.delete_recursive(self.directory)
        self._entries = []
        self._fs.mkdirs(self.directory)

    @property
    def num_checkpoints(self) -> int:
        return len(self._entries)
