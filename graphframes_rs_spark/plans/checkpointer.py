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
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


class ParquetCheckpointer:
    def __init__(self, spark: SparkSession, directory: Optional[str] = None):
        self.spark = spark
        if directory is None:
            directory = os.path.join(
                tempfile.gettempdir(), f"gf_ckpt_{uuid.uuid4().hex[:12]}"
            )
        self.directory = directory
        os.makedirs(self.directory, exist_ok=True)
        self._seq = 0
        self._paths: List[str] = []

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
        self._paths.append(path)
        return self.spark.read.parquet(path)

    def push_partitioned(
        self, df: DataFrame, key: str, num_partitions: int, name: str = "state"
    ) -> DataFrame:
        """Checkpoint hash-partitioned by ``key`` — the files come back
        clustered by the join key so the next superstep's shuffle reads are
        local-ish. (The shuffle itself is not elided without bucketed-table
        metadata; see the reference's ``push_pre_sorted``,
        src/memory/hash_partitioned.rs:36-137, and README notes on the
        bucketed variant.)"""
        return self.push(df.repartition(num_partitions, key), name)

    # -- eviction bookkeeping (parquet_checkpointer.rs:134-165) -------------
    def evict(self, n: int = 1) -> None:
        """Delete the ``n`` oldest checkpoints."""
        for path in self._paths[:n]:
            shutil.rmtree(path, ignore_errors=True)
        self._paths = self._paths[n:]

    def evict_all_but_latest(self, n: int = 1) -> None:
        if len(self._paths) > n:
            self.evict(len(self._paths) - n)

    def remove_last(self, n: int = 1) -> None:
        """Forget (and delete) the n most recent checkpoints."""
        if n <= 0:
            return
        for path in self._paths[-n:]:
            shutil.rmtree(path, ignore_errors=True)
        self._paths = self._paths[: len(self._paths) - n]

    def purge(self) -> None:
        shutil.rmtree(self.directory, ignore_errors=True)
        self._paths = []
        os.makedirs(self.directory, exist_ok=True)

    @property
    def num_checkpoints(self) -> int:
        return len(self._paths)
