"""Property-based tests (hypothesis) for the pure-python media kernels.

Two properties per codec, mirroring what the ingest operators rely on:
* encode→parse roundtrip identity over the full legal parameter space;
* parsers NEVER raise anything but ValueError on malformed input — the
  corrupt-marking contract of image_dimensions/video_durations catches
  (ValueError, IndexError); anything else would fail a whole Arrow batch
  at ingest scale.

No SparkSession anywhere in this file: kernels are plain functions, so
hypothesis can drive thousands of cases in seconds.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graphframes_rs_spark.pipeline import multimodal as mm


@given(
    w=st.integers(1, 2**31 - 1),
    h=st.integers(1, 2**31 - 1),
    bd=st.sampled_from([1, 2, 4, 8, 16]),
    ct=st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_roundtrip(w, h, bd, ct):
    assert mm.parse_png_header(mm.encode_png_header(w, h, bd, ct)) == (w, h, bd, ct)


@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    ncomp=st.integers(1, 4),
    progressive=st.booleans(),
)
def test_jpeg_roundtrip(w, h, ncomp, progressive):
    payload = mm.encode_jpeg_header(w, h, ncomp=ncomp, progressive=progressive)
    assert mm.parse_jpeg_header(payload) == (w, h, ncomp)


@given(
    duration=st.integers(0, 2**32 - 2),
    timescale=st.integers(1, 2**32 - 1),
    version=st.sampled_from([0, 1]),
)
def test_mp4_roundtrip(duration, timescale, version):
    got = mm.parse_mp4_duration(
        mm.encode_mp4_header(duration, timescale=timescale, version=version)
    )
    assert got == ((duration * 1000) // timescale, timescale)


@given(version=st.sampled_from([0, 1]), timescale=st.integers(1, 2**32 - 1))
def test_mp4_unknown_duration_sentinel(version, timescale):
    sentinel = (2**64 - 1) if version == 1 else 0xFFFFFFFF
    got = mm.parse_mp4_duration(
        mm.encode_mp4_header(sentinel, timescale=timescale, version=version)
    )
    assert got == (None, timescale)


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    data=st.data(),
)
def test_ppm_roundtrip(w, h, data):
    seed = data.draw(st.integers(0, 2**32 - 1))
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    rw, rh, rpx = mm.decode_ppm(mm.encode_ppm(w, h, px))
    assert (rw, rh) == (w, h)
    assert (rpx == px).all()


# --- malformed input: only ValueError may escape ---------------------------

_PARSERS = {
    "jpeg": (mm.parse_jpeg_header, b"\xff\xd8"),
    "png": (mm.parse_png_header, mm._PNG_SIGNATURE),
    "ppm": (mm.decode_ppm, b"P6"),
    "mp4": (mm.parse_mp4_duration, b"\x00\x00\x00\x10ftyp"),
}


@pytest.mark.parametrize("fmt", sorted(_PARSERS))
@settings(max_examples=300, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_parser_never_crashes_on_garbage(fmt, junk):
    """Magic prefix + random junk: the parser either succeeds or raises
    ValueError — IndexError/struct.error/OverflowError would poison an
    ingest batch instead of marking the row corrupt."""
    parse, magic = _PARSERS[fmt]
    try:
        parse(magic + junk)
    except ValueError:
        pass


@pytest.mark.parametrize("fmt", sorted(_PARSERS))
@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_parser_never_crashes_on_truncation(fmt, data):
    """Every prefix of a VALID payload parses or raises ValueError."""
    parse, _ = _PARSERS[fmt]
    full = {
        "jpeg": lambda: mm.encode_jpeg_header(320, 240, progressive=True),
        "png": lambda: mm.encode_png_header(320, 240),
        "ppm": lambda: mm.encode_ppm(
            4, 3, np.zeros((3, 4, 3), dtype=np.uint8)
        ),
        "mp4": lambda: mm.encode_mp4_header(2500, version=1),
    }[fmt]()
    cut = data.draw(st.integers(0, len(full) - 1))
    try:
        parse(full[:cut])
    except ValueError:
        pass
