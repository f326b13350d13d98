"""Streaming deduplication: the continuous-ingest face of the batch dedup
operators (``pipeline.dedup``). A training-data pipeline that ingests a
corpus as a stream needs first-arrival-wins exact dedup at the door —
downstream near-dup passes stay batch (they need corpus-global candidate
generation), but exact dedup is a per-key decision Spark's streaming
state store answers natively.

Scale notes: ``dropDuplicates`` on an unbounded stream grows one state
entry per distinct hash forever; ``dropDuplicatesWithinWatermark`` bounds
the store by evicting hashes older than the event-time watermark — the
right default when duplicates cluster in time (re-crawls, retries,
mirror bursts). Content hashing stays a JVM-side ``md5`` projection.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming documents source:
    input rows + a ``content_hash`` column, one output row per distinct
    content hash.

    With ``ts_col`` + ``watermark`` the dedup state is watermark-bounded
    (``dropDuplicatesWithinWatermark``): a duplicate arriving later than
    the watermark re-emits — the bounded-memory trade every unbounded
    streaming dedup must pick. Without them the state store holds every
    hash seen (exact forever, unbounded growth — batch-backfill and
    bounded-ingest use only)."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
