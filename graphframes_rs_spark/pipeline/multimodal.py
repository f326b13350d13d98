"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema contract, Arrow-batched
``mapInPandas`` iteration, partition sizing, metadata propagation. Two REAL
codecs ship dependency-free: ``decode_ppm`` (binary P6 PPM images, pure
numpy header parse + frombuffer) and ``decode_wav`` (PCM WAV via the stdlib
``wave`` module), each with a feature extractor (``image_features`` /
``audio_features``) that runs the decode inside ``mapInPandas``. Formats
needing external libraries (JPEG/PNG/MP4/Opus) sit behind the ``decode=``
plug point: the deterministic fake (default, for tests), or in ``strict``
mode the best importable real decoder per media_type — Pillow for images
(``real_decoder``), PyAV for video/audio (``real_av_decoder``) — with the
documented ``NotImplementedError`` when the library is absent.

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


def pil_decode_features(payload: bytes) -> np.ndarray:
    """Real raster decode via Pillow (optional dependency): decodes any
    PIL-readable payload (PNG/JPEG/PPM/...) and extracts a deterministic
    FEATURE_DIM vector — [log1p(w), log1p(h), per-channel RGB mean (3),
    per-channel RGB std (3), 8-bin grayscale histogram] = 16 dims. Pure
    numpy after the decode; no RNG, so identical payloads always map to
    identical features (the contract the dedup/similarity operators
    downstream rely on). Raises ImportError when Pillow is absent —
    callers that want graceful fallback use :func:`real_decoder`."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    px = np.asarray(img, dtype=np.float64)  # (h, w, 3) in [0, 255]
    h, w = px.shape[0], px.shape[1]
    flat = px.reshape(-1, 3) / 255.0
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    hist = hist / max(gray.size, 1)
    feat = np.concatenate(
        [
            [np.log1p(w), np.log1p(h)],
            flat.mean(axis=0),
            flat.std(axis=0),
            hist,
        ]
    )
    return feat.astype(np.float32)


def real_decoder():
    """The best available REAL image decoder, or ``None``: Pillow-backed
    when importable (:func:`pil_decode_features`), nothing otherwise. The
    pure-python P6-PPM/PCM-WAV codecs and header parsers in this module
    stay the dependency-free baseline either way."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        return None
    return pil_decode_features


def av_decode_features(payload: bytes) -> np.ndarray:
    """Real video/audio decode via PyAV (optional dependency, ffmpeg
    bindings): opens the container, decodes up to 8 video frames (evenly
    consumed from the stream head) or up to 1s of audio samples, and
    extracts the SAME deterministic FEATURE_DIM layout as
    :func:`pil_decode_features` — video: [log1p(w), log1p(h), per-channel
    RGB mean (3) and std (3) over the sampled frames, 8-bin grayscale
    histogram]; audio: [log1p(n_samples), log1p(sample_rate), mean, std,
    RMS, zero-crossing rate, 2 zero pads, 8-bin amplitude histogram].
    No RNG — identical payloads map to identical features. Raises
    ImportError when PyAV is absent — graceful callers use
    :func:`real_av_decoder`."""
    import io

    import av

    with av.open(io.BytesIO(payload)) as container:
        vstreams = [s for s in container.streams if s.type == "video"]
        astreams = [s for s in container.streams if s.type == "audio"]
        if vstreams:
            frames = []
            for frame in container.decode(vstreams[0]):
                frames.append(frame.to_ndarray(format="rgb24"))
                if len(frames) >= 8:
                    break
            if not frames:
                raise ValueError("video stream decoded zero frames")
            px = np.concatenate(
                [f.reshape(-1, 3) for f in frames]
            ).astype(np.float64) / 255.0
            h, w = frames[0].shape[0], frames[0].shape[1]
            gray = px.mean(axis=1)
            hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
            hist = hist / max(gray.size, 1)
            feat = np.concatenate(
                [[np.log1p(w), np.log1p(h)], px.mean(axis=0), px.std(axis=0), hist]
            )
            return feat.astype(np.float32)
        if astreams:
            rate = int(astreams[0].rate or 0)
            # sample cap: ~1s at the reported rate; when the container
            # reports no rate (raw ADTS, broken headers) fall back to
            # 48000 so a multi-hour payload can never accumulate its whole
            # decoded stream into one row's memory
            cap = rate or 48_000
            chunks, n = [], 0
            for frame in container.decode(astreams[0]):
                arr = frame.to_ndarray()
                mono = arr.mean(axis=0) if arr.ndim > 1 else arr
                chunks.append(mono.astype(np.float64))
                n += mono.shape[-1]
                if n >= cap:  # ~1s is plenty for summary stats
                    break
            if not chunks:
                raise ValueError("audio stream decoded zero samples")
            sig = np.concatenate(chunks)
            peak = np.abs(sig).max() or 1.0
            norm = sig / peak
            # size-1 stream: np.diff is empty and mean(empty) is NaN,
            # which would silently poison every downstream cosine — a
            # single sample has zero crossings by definition
            zcr = (
                float(np.mean(np.abs(np.diff(np.signbit(norm).astype(int)))))
                if norm.size > 1
                else 0.0
            )
            hist, _ = np.histogram(norm, bins=8, range=(-1.0, 1.0))
            hist = hist / max(norm.size, 1)
            feat = np.concatenate(
                [
                    [np.log1p(sig.size), np.log1p(rate)],
                    [norm.mean(), norm.std(), float(np.sqrt((norm**2).mean())),
                     zcr, 0.0, 0.0],
                    hist,
                ]
            )
            return feat.astype(np.float32)
    raise ValueError("container has no decodable video or audio stream")


def real_av_decoder():
    """The best available REAL video/audio decoder, or ``None``: PyAV when
    importable (:func:`av_decode_features`), nothing otherwise — the
    audio/video twin of :func:`real_decoder`. The pure-python MP4/WAV
    header parsers stay the dependency-free baseline either way."""
    try:
        import av  # noqa: F401
    except ImportError:
        return None
    return av_decode_features


def _strict_decode(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment (pip install Pillow, or plug a decoder into "
        "extract_features(decode=...))"
    )


def extract_features(
    media: DataFrame, decode=None, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    [media_id, media_type, n_bytes, feature: array<float>]

    ``decode`` plugs any payload->feature codec in. ``strict=True`` means
    "real features or fail", dispatched PER media_type: image rows use
    the Pillow-backed decoder when Pillow is importable
    (:func:`real_decoder`); video/audio rows use the PyAV-backed decoder
    when PyAV is importable (:func:`real_av_decoder`); anything the
    available libraries can't cover raises the documented
    ``NotImplementedError`` (never a library-dependent
    ``UnidentifiedImageError`` from feeding an audio payload to an image
    codec). Availability is resolved ON THE EXECUTORS, inside the UDF —
    decode runs there, so a driver with Pillow but workers without it
    raises the documented error rather than a worker-side ImportError
    (and the inverse install skew finds the decoder that actually
    exists where the work runs). The deterministic fake remains the
    default for plumbing tests and fixtures.
    """
    if decode is not None:
        def make_decode_for():
            return lambda media_type: decode
    elif strict:
        def make_decode_for():
            # resolved in the Python worker, once per partition iterator
            _pil = real_decoder()
            _av = real_av_decoder()

            def decode_for(media_type):
                mt = str(media_type)
                if _pil is not None and mt.startswith("image"):
                    return _pil
                if _av is not None and (
                    mt.startswith("video") or mt.startswith("audio")
                ):
                    return _av
                return _strict_decode

            return decode_for
    else:
        def make_decode_for():
            return lambda media_type: _fake_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode_for = make_decode_for()
        for pdf in batches:
            feats = [
                decode_for(mt)(p if isinstance(p, bytes) else bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
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


# --------------------------------------------------------------------------
# real codecs (dependency-free formats)
# --------------------------------------------------------------------------

def encode_ppm(width: int, height: int, pixels: "np.ndarray") -> bytes:
    """Binary P6 PPM encoder: pixels is a (height, width, 3) uint8 array."""
    if pixels.shape != (height, width, 3):
        raise ValueError(f"pixels shape {pixels.shape} != {(height, width, 3)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple:
    """Real binary-PPM (P6) decoder: (width, height, (h, w, 3) uint8 array).
    Handles the three whitespace-separated header fields and ``#`` comment
    lines per the netpbm spec; no external libraries."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    n = width * height * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, raster.reshape(height, width, 3)


# SOF (start-of-frame) markers carry the image dimensions. C4/C8/CC are
# DHT/JPG/DAC — table segments, not frames.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_jpeg_header(payload: bytes) -> tuple:
    """(width, height, n_components) from a JPEG's SOF segment — a
    pure-python marker walk over the segment headers, no raster decode and
    no codec library. Handles baseline (SOF0) through progressive (SOF2)
    and fill-byte padding between markers per ITU T.81 §B. Raster decode
    stays behind the ``extract_features(decode=...)`` plug point (PIL &c);
    dimensions-only is enough for schema validation, partition sizing and
    resolution filtering at ingest."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI marker)")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at byte {pos}")
        # fill bytes: any number of 0xFF may pad before the marker id
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # RSTn/SOI/TEM: bare
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if marker in _JPEG_SOF_MARKERS:
            # segment: len(2) precision(1) height(2) width(2) ncomp(1)
            if pos + 8 > n:
                raise ValueError("truncated SOF segment")
            height = int.from_bytes(payload[pos + 3 : pos + 5], "big")
            width = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            ncomp = payload[pos + 7]
            return width, height, ncomp
        pos += seglen
    raise ValueError("no SOF marker found (truncated or not an image JPEG)")


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def parse_png_header(payload: bytes) -> tuple:
    """(width, height, bit_depth, color_type) from a PNG's IHDR chunk — a
    pure-python chunk walk, no raster decode. Per the PNG spec the IHDR
    chunk MUST be first, so this is a fixed-offset read after validating
    the signature and chunk framing (length + type + 13-byte payload)."""
    if payload[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    if len(payload) < 33:  # sig(8) + len(4) + 'IHDR'(4) + data(13) + crc(4)
        raise ValueError("truncated PNG (no room for IHDR chunk)")
    chunk_len = int.from_bytes(payload[8:12], "big")
    if payload[12:16] != b"IHDR" or chunk_len != 13:
        raise ValueError("first PNG chunk is not a well-formed IHDR")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    bit_depth = payload[24]
    color_type = payload[25]
    if width == 0 or height == 0:
        raise ValueError("PNG IHDR declares zero dimension")
    return width, height, bit_depth, color_type


def parse_mp4_duration(payload: bytes) -> tuple:
    """(duration_ms, timescale) from an MP4/ISO-BMFF ``moov/mvhd`` box — a
    pure-python box walk (size+type framing, 64-bit largesize, version 0/1
    mvhd layouts per ISO 14496-12 §8.2.2). No sample tables are touched:
    container-level duration is what frame-sampling plans need.

    The spec's all-ones "unknown duration" sentinel (0xFFFFFFFF for v0,
    2**64-1 for v1) yields ``(None, timescale)`` — the file is valid but
    its duration is undeclared, so callers must not feed it to a sampling
    plan. Limitation: fragmented MP4s legitimately carry mvhd duration 0
    (the real duration lives in ``mvex/mehd`` or the fragments); this
    parser reports that 0 as-is."""

    def walk(buf: bytes, start: int, end: int, path: tuple):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            header = 8
            if size == 1:  # 64-bit largesize follows the type
                if pos + 16 > end:
                    raise ValueError("truncated MP4 largesize box header")
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                header = 16
            elif size == 0:  # box runs to end of enclosing scope
                size = end - pos
            if size < header or pos + size > end:
                raise ValueError(f"bad MP4 box size at byte {pos}")
            if btype == path[0]:
                if len(path) == 1:
                    return pos + header, pos + size
                return walk(buf, pos + header, pos + size, path[1:])
            pos += size
        raise ValueError(f"MP4 box {path[0]!r} not found")

    body_start, body_end = walk(payload, 0, len(payload), (b"moov", b"mvhd"))
    body = payload[body_start:body_end]
    if len(body) < 4:
        raise ValueError("truncated mvhd box")
    version = body[0]
    if version == 1:  # creation(8) modification(8) timescale(4) duration(8)
        if len(body) < 32:
            raise ValueError("truncated mvhd v1 box")
        timescale = int.from_bytes(body[20:24], "big")
        duration = int.from_bytes(body[24:32], "big")
    else:  # v0: creation(4) modification(4) timescale(4) duration(4)
        if len(body) < 20:
            raise ValueError("truncated mvhd v0 box")
        timescale = int.from_bytes(body[12:16], "big")
        duration = int.from_bytes(body[16:20], "big")
    if timescale == 0:
        raise ValueError("mvhd declares zero timescale")
    unknown = (2**64 - 1) if version == 1 else 0xFFFFFFFF
    if duration == unknown:
        return None, timescale
    return (duration * 1000) // timescale, timescale


def sniff_media_format(payload: bytes) -> str:
    """'ppm' | 'jpeg' | 'png' | 'wav' | 'mp4' | 'unknown' from magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:8] == _PNG_SIGNATURE:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def image_dimensions(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """[media_id, format, width, height]: real header parsing over a mixed
    image table — PPM via the full decoder, JPEG via the SOF header walk,
    PNG via the IHDR chunk walk.
    No fake decoder anywhere in this path; unknown formats yield NULL dims,
    and a payload that sniffs as a known format but is malformed is marked
    format='corrupt' with NULL dims instead of failing the task — at ingest
    scale one bad row must never poison the batch (filter on format for
    strictness)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "format", "width", "height")}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                p = payload if isinstance(payload, bytes) else bytes(payload)
                fmt = sniff_media_format(p)
                w = h = None
                try:
                    if fmt == "ppm":
                        w, h, _ = decode_ppm(p)
                    elif fmt == "jpeg":
                        w, h, _ = parse_jpeg_header(p)
                    elif fmt == "png":
                        w, h, _, _ = parse_png_header(p)
                except (ValueError, IndexError):
                    fmt, w, h = "corrupt", None, None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, format string, width long, height long"
    )


def decode_wav(payload: bytes) -> tuple:
    """Real PCM WAV decoder via the stdlib ``wave`` module:
    (sample_rate, (n_frames, n_channels) float64 array in [-1, 1])."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, x.reshape(-1, n_ch)


def image_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """[media_id, width, height, mean_r, mean_g, mean_b]: real PPM decode +
    per-channel means, Arrow-batched. Means are rounded to 6 so results are
    reproducible bit-for-bit in plain SQL over the same pixel formula."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                w, h, px = decode_ppm(
                    payload if isinstance(payload, bytes) else bytes(payload)
                )
                means = px.reshape(-1, 3).mean(axis=0)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        "media_id long, width long, height long, "
        "mean_r double, mean_g double, mean_b double",
    )


def audio_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """[media_id, sample_rate, n_frames, rms]: real WAV decode + loudness."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_frames", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                rate, x = decode_wav(
                    payload if isinstance(payload, bytes) else bytes(payload)
                )
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_frames"].append(x.shape[0])
                out["rms"].append(round(float(np.sqrt((x ** 2).mean())), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, sample_rate long, n_frames long, rms double"
    )


def synthetic_ppm_media(
    ids: DataFrame, id_col: str = "media_id", width: int = 8, height: int = 6
) -> DataFrame:
    """[media_id, payload]: deterministic PPM payloads for testing the real
    decoder at scale — byte i of image m is ``(m*31 + i*7) % 256``, a
    closed form a SQL oracle can integrate analytically."""
    n_bytes = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_bytes, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_ppm(
                    width,
                    height,
                    ((int(m) * 31 + i * 7) % 256)
                    .astype(np.uint8)
                    .reshape(height, width, 3),
                )
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        run, "media_id long, payload binary"
    )


def encode_jpeg_header(
    width: int, height: int, ncomp: int = 3, progressive: bool = False
) -> bytes:
    """Valid JPEG segment stream — SOI + JFIF APP0 + SOF0 (or SOF2 when
    ``progressive``) + EOI — with no entropy-coded raster: the synthetic
    twin of :func:`encode_ppm` for header-level operators
    (:func:`parse_jpeg_header` / :func:`image_dimensions`). Grammar per
    ITU T.81 §B; a full encoder would append DQT/DHT/SOS + scan data."""
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x02\x00" + b"\x00\x48\x00\x48\x00\x00"
    )
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    sof = (
        marker + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
        + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([ncomp]) + comps
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def synthetic_jpeg_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """[media_id, payload]: deterministic JPEG header payloads — image m is
    ``(16 + m % 97) x (9 + m % 53)``, progressive (SOF2) for odd m — a
    closed form a SQL oracle reproduces, exercising both baseline and
    progressive marker paths of the header parser."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_jpeg_header(
                    16 + int(m) % 97, 9 + int(m) % 53,
                    progressive=bool(int(m) % 2),
                )
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        run, "media_id long, payload binary"
    )


def encode_png_header(
    width: int, height: int, bit_depth: int = 8, color_type: int = 6
) -> bytes:
    """Valid PNG byte stream — signature + IHDR (with correct CRC32) +
    IEND — with no IDAT raster: the synthetic twin of
    :func:`encode_jpeg_header` for header-level operators
    (:func:`parse_png_header` / :func:`image_dimensions`)."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return _PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def synthetic_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """[media_id, payload]: deterministic PNG header payloads — image m is
    ``(32 + m % 89) x (11 + m % 41)``, RGBA for even m and RGB for odd — a
    closed form a SQL oracle reproduces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_png_header(
                    32 + int(m) % 89, 11 + int(m) % 41,
                    color_type=6 if int(m) % 2 == 0 else 2,
                )
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        run, "media_id long, payload binary"
    )


def encode_mp4_header(
    duration: int, timescale: int = 1000, version: int = 0
) -> bytes:
    """Minimal valid ISO-BMFF byte stream — ``ftyp`` + ``moov/mvhd`` with
    the requested duration (in timescale units), v0 or v1 layout — the
    synthetic twin of :func:`encode_ppm` for container-level operators
    (:func:`parse_mp4_duration` / :func:`video_durations`). No track or
    sample-table boxes: duration lives in mvhd per ISO 14496-12 §8.2.2."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    if version == 1:
        body = (
            bytes([1, 0, 0, 0]) + b"\x00" * 16
            + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
        )
    else:
        body = (
            bytes([0, 0, 0, 0]) + b"\x00" * 8
            + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        )
    return ftyp + box(b"moov", box(b"mvhd", body))


def synthetic_mp4_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """[media_id, payload]: deterministic MP4 container payloads — clip m
    lasts ``500 + (m % 997) * 10`` ms at timescale 1000, mvhd v1 for odd m
    — a closed form a SQL oracle reproduces, exercising both mvhd layouts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_mp4_header(
                    500 + (int(m) % 997) * 10,
                    timescale=1000,
                    version=int(m) % 2,
                )
                for m in pdf[id_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        run, "media_id long, payload binary"
    )


def video_durations(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """[media_id, format, duration_ms, timescale]: real container parsing
    over a video table — MP4 via the mvhd box walk. The container-duration
    twin of :func:`image_dimensions`, with the same ingest-scale contract:
    non-MP4 formats yield NULL duration, a payload that sniffs as MP4 but is
    malformed is marked format='corrupt' instead of failing the task, and a
    valid MP4 with the spec's unknown-duration sentinel keeps format='mp4'
    with NULL duration_ms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "format", "duration_ms", "timescale")}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                p = payload if isinstance(payload, bytes) else bytes(payload)
                fmt = sniff_media_format(p)
                dur = ts = None
                if fmt == "mp4":
                    try:
                        dur, ts = parse_mp4_duration(p)
                    except (ValueError, IndexError):
                        fmt, dur, ts = "corrupt", None, None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["duration_ms"].append(dur)
                out["timescale"].append(ts)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, format string, duration_ms long, timescale long"
    )


def synthetic_wav_media(
    ids: DataFrame,
    id_col: str = "media_id",
    n_samples: int = 256,
    sample_rate: int = 8000,
) -> DataFrame:
    """[media_id, payload]: deterministic 16-bit mono PCM WAV payloads —
    sample i of clip m is ``((m*31 + i*7) % 256 - 128) * 256`` (int16), so
    a SQL oracle can integrate loudness analytically."""
    import io
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for m in pdf[id_col]:
                sig = (((int(m) * 31 + i * 7) % 256 - 128) * 256).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(sig.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        run, "media_id long, payload binary"
    )


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


def frame_sample_from_payload(
    media: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """:func:`frame_sample_plan` driven by the container itself: duration is
    parsed from the MP4 payload (:func:`video_durations`), not read from a
    trusted meta column, so the plan is runnable on raw ingested video rows.
    Corrupt containers, unknown-duration files (NULL must never reach
    ``F.sequence``) and mvhd duration 0 (fragmented MP4s report 0 there —
    the real duration lives in the fragments, which this container-level
    parser deliberately doesn't walk) are all excluded.
    [media_id, frame_ts_ms]"""
    durs = video_durations(media, payload_col=payload_col)
    return (
        durs.filter((F.col("format") == "mp4") & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
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
