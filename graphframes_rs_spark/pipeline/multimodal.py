"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema contract, Arrow-batched
``mapInPandas`` iteration, partition sizing, metadata propagation. The codec
step itself is stubbed: decode libraries (PIL/ffmpeg/torchaudio) are not in
this container, so ``decode=`` accepts either the deterministic fake
(default, for tests) or raises ``NotImplementedError`` in ``strict`` mode to
mark exactly where a real decoder plugs in.

Schema contract:
    media(media_id: long, media_type: string, payload: binary,
          meta: struct<width:int, height:int, sample_rate:int, duration_ms:int>)

At 100 TB: payloads dominate partition size, so ``mapInPandas`` batches are
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; keep payloads
out of shuffles by extracting features early and joining on media_id.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: md5-seeded
    pseudo-features. Replace with a real codec via ``decode=``."""
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def _strict_decode(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment; plug a decoder into extract_features(decode=...)"
    )


def extract_features(
    media: DataFrame, decode=None, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    [media_id, media_type, n_bytes, feature: array<float>]
    """
    decode_fn = decode or (_strict_decode if strict else _fake_decode_features)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(p if isinstance(p, bytes) else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Pure-SQL frame-sampling plan for video rows: one output row per
    sampled timestamp (the decode of each frame is the stubbed step).
    [media_id, frame_ts_ms]"""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 64))
        meta = {
            "width": 64 + i if mtype == "image" else None,
            "height": 48 + i if mtype == "image" else None,
            "sample_rate": 16000 if mtype == "audio" else None,
            "duration_ms": 3000 + 100 * i if mtype in ("audio", "video") else None,
        }
        rows.append((i, mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
