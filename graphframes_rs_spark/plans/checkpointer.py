"""Parquet checkpoint manager for iterative dataflow.

Why this exists (and is load-bearing, not an optimization): Spark's
analyzer cost grows superlinearly with logical-plan depth. An iterative
algorithm that rewrites its state DataFrame every superstep would build a
plan that doubles per iteration and stall the driver. Writing the state to
parquet and re-reading it truncates lineage to a flat scan, exactly like
the reference's ``ParquetCheckpointer``
(reference: src/memory/parquet_checkpointer.rs:80-165).

Eviction keeps disk usage bounded: a new checkpoint is always written
*before* older ones are deleted, so a live DataFrame handle never points at
removed files (same ordering contract as the reference WCC driver,
connected_components.rs "write first ... avoids a NotFound").
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession


def _require_local_dir(directory: str) -> str:
    """Checkpoint bookkeeping (listdir / rmtree) runs on the driver's local
    filesystem, so remote URIs (hdfs://, s3a://, ...) would write parquet via
    Spark but break the existence checks with FileNotFoundError. Reject them
    up front with an actionable error; accept and strip a ``file:`` scheme."""
    scheme, sep, rest = directory.partition("://")
    if not sep:
        return directory
    if scheme == "file":
        return rest if rest.startswith("/") else "/" + rest
    raise ValueError(
        f"ParquetCheckpointer requires a local-filesystem checkpoint dir; "
        f"got '{directory}'. Remote stores ({scheme}://) are not supported "
        f"by the driver-side eviction bookkeeping — mount the store locally "
        f"or point spark.graphframes.checkpointDir at a local path."
    )


class ParquetCheckpointer:
    def __init__(self, spark: SparkSession, directory: Optional[str] = None):
        self.spark = spark
        if directory is None:
            directory = os.path.join(
                tempfile.gettempdir(), f"gf_ckpt_{uuid.uuid4().hex[:12]}"
            )
        self.directory = _require_local_dir(directory)
        os.makedirs(self.directory, exist_ok=True)
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
        path = os.path.join(self.directory, f"{self._seq:05d}_{name}")
        self._seq += 1
        df.write.mode("overwrite").parquet(path)
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            shutil.rmtree(path, ignore_errors=True)
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
        path = os.path.join(self.directory, f"{self._seq:05d}_{name}")
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
        shutil.rmtree(path, ignore_errors=True)

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
        shutil.rmtree(self.directory, ignore_errors=True)
        self._entries = []
        os.makedirs(self.directory, exist_ok=True)

    @property
    def num_checkpoints(self) -> int:
        return len(self._entries)
