"""Multimodal plumbing + streaming operator tests."""

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline import multimodal
from graphframes_rs_spark.sources.tables import load_table
from graphframes_rs_spark.streaming import events as ev

SF_DIR = "/root/testdata/sf0.001"


def test_extract_features_deterministic(spark):
    media = multimodal.synthetic_media(spark, n=32)
    out = multimodal.extract_features(media)
    rows = out.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism: same payload -> same features
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first


def _pil_available():
    try:
        import PIL  # noqa: F401
    except ImportError:
        return False
    return True


@pytest.mark.skipif(
    _pil_available(), reason="with Pillow installed, strict mode decodes for real"
)
def test_extract_features_strict_raises(spark):
    media = multimodal.synthetic_media(spark, n=3)
    out = multimodal.extract_features(media, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        out.collect()


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_extract_features_strict_uses_pil_when_available(spark):
    """With Pillow importable, strict mode decodes for real: PPM payloads
    (PIL reads netpbm natively) produce content-derived features — the
    RGB means of a solid-colour image are its colour, not md5 noise."""
    import numpy as np

    red = multimodal.encode_ppm(4, 4, np.full((4, 4, 3), [255, 0, 0], dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, "image/ppm", bytearray(red), None)], multimodal.MEDIA_SCHEMA
    )
    out = multimodal.extract_features(media, strict=True).collect()
    feat = out[0]["feature"]
    assert len(feat) == multimodal.FEATURE_DIM
    assert abs(feat[2] - 1.0) < 1e-6  # mean R
    assert abs(feat[3]) < 1e-6 and abs(feat[4]) < 1e-6  # mean G, B


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_pil_decode_features_deterministic():
    import numpy as np

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payload = multimodal.encode_ppm(4, 4, px)
    a = multimodal.pil_decode_features(payload)
    b = multimodal.pil_decode_features(payload)
    assert np.array_equal(a, b)
    assert a.shape == (multimodal.FEATURE_DIM,)


def test_real_decoder_matches_pil_availability():
    dec = multimodal.real_decoder()
    if _pil_available():
        assert dec is multimodal.pil_decode_features
    else:
        assert dec is None


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, n=9)
    out = ( multimodal.frame_sample_plan(media, every_ms=1000)
        .groupBy("media_id").agg(F.count(F.lit(1)).alias("n")) ).collect()
    metas = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()
             if r["media_type"] == "video"}
    got = {r["media_id"]: r["n"] for r in out}
    assert set(got) == set(metas)
    for mid, dur in metas.items():
        assert got[mid] == (dur - 1) // 1000 + 1


def test_tumbling_counts_batch(spark):
    events = load_table(spark, SF_DIR, "events")
    out = ev.tumbling_counts(events, "1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # a (window, type) bucket never exceeds the type's total
    per_type = {r["event_type"]: r["cnt"] for r in
                events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for r in out.collect():
        assert r["n_events"] <= per_type[r["event_type"]]


def test_sessionize_batch_gap_semantics(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=10)),          # session 1
        (1, base + dt.timedelta(minutes=60)),                     # session 2
        (2, base),                                                # session 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = ev.sessionize(df, gap_minutes=30)
    got = {(r["user_id"], r["session_id"]): r["n_events"] for r in out.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_streaming_tumbling_counts_matches_batch(spark, tmp_path):
    """Stream the events parquet with availableNow and compare against the
    batch face — same expressions, same results."""
    events = load_table(spark, SF_DIR, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.tumbling_counts(events, "6 hours").collect()
    }
    src = str(tmp_path / "events_micro")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = ev.streaming_tumbling_counts(stream, "6 hours", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from stream_counts").collect()
    }
    assert got == batch


def test_streaming_sessionize_runs(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_micro2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = ev.streaming_sessionize(stream, gap_minutes=30, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from stream_sessions").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_ppm_codec_roundtrip_and_comments():
    import numpy as np
    from graphframes_rs_spark.pipeline import multimodal as mm

    px = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    payload = mm.encode_ppm(5, 4, px)
    w, h, out = mm.decode_ppm(payload)
    assert (w, h) == (5, 4)
    assert np.array_equal(out, px)
    # netpbm comment lines between header fields must be skipped
    commented = b"P6\n# a comment\n5 4\n# another\n255\n" + px.tobytes()
    w2, h2, out2 = mm.decode_ppm(commented)
    assert (w2, h2) == (5, 4) and np.array_equal(out2, px)


def test_wav_codec_roundtrip():
    import io
    import wave

    import numpy as np
    from graphframes_rs_spark.pipeline import multimodal as mm

    t = np.arange(1600) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())
    rate, x = mm.decode_wav(buf.getvalue())
    assert rate == 16000 and x.shape == (1600, 1)
    expected_rms = float(np.sqrt(((sig.astype(np.float64) / 32768.0) ** 2).mean()))
    assert abs(float(np.sqrt((x ** 2).mean())) - expected_rms) < 1e-12


def test_image_and_audio_features_distributed(spark):
    import io
    import wave

    import numpy as np
    from graphframes_rs_spark.pipeline import multimodal as mm

    ids = spark.range(16).select(F.col("id").alias("media_id"))
    media = mm.synthetic_ppm_media(ids, width=8, height=6)
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert len(feats) == 16
    i = np.arange(8 * 6 * 3, dtype=np.int64)
    for m in (0, 7, 15):
        vals = (m * 31 + i * 7) % 256
        assert feats[m]["width"] == 8 and feats[m]["height"] == 6
        assert feats[m]["mean_r"] == round(float(vals[0::3].mean()), 6)
        assert feats[m]["mean_b"] == round(float(vals[2::3].mean()), 6)

    def wav_payload(m):
        sig = (((np.arange(800) * (m + 3)) % 256 - 128) * 100).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(sig.tobytes())
        return buf.getvalue()

    rows = [(m, wav_payload(m)) for m in range(6)]
    media_a = spark.createDataFrame(rows, "media_id long, payload binary")
    arows = {r["media_id"]: r for r in mm.audio_features(media_a).collect()}
    assert len(arows) == 6
    assert all(r["sample_rate"] == 8000 and r["n_frames"] == 800 for r in arows.values())
    assert all(0 < r["rms"] < 1 for r in arows.values())


def test_streaming_user_stats_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    feeding the same source twice (two files) must yield cumulative counts."""
    import os

    events = load_table(spark, SF_DIR, "events").limit(200).cache()
    src = str(tmp_path / "user_stats_src")
    os.makedirs(src, exist_ok=True)
    half = events.limit(100)
    half.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    events.subtract(half).coalesce(1).write.mode("append").parquet(src + "/b1")
    # one directory, two files -> with maxFilesPerTrigger=1 they become two
    # micro-batches against the same state store
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b1")
    )
    out = ev.streaming_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per touched batch; the LAST row per
    # user carries the cumulative profile
    rows = spark.sql(
        "select * from (select *, row_number() over (partition by user_id "
        "order by n_events desc) rn from user_stats) where rn = 1"
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    expected = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == expected
    events.unpersist()


def _tiny_jpeg(width, height, progressive=False, ncomp=3):
    """Hand-assembled JPEG header stream: SOI + JFIF APP0 + (fill bytes) +
    SOF0/SOF2 carrying the dimensions + EOI. Valid per ITU T.81 segment
    grammar — exactly what a header parser must handle, no raster needed."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    sof = sof_marker + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8]) \
        + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp]) + comp
    return b"\xff\xd8" + app0 + b"\xff" + sof[1:] + b"\xff\xd9"


def test_jpeg_header_parser_pure_python():
    for w, h, prog in [(640, 480, False), (31, 7, True), (4096, 2160, False)]:
        got = multimodal.parse_jpeg_header(_tiny_jpeg(w, h, progressive=prog))
        assert got == (w, h, 3)
    assert multimodal.parse_jpeg_header(_tiny_jpeg(8, 8, ncomp=1)) == (8, 8, 1)
    with pytest.raises(ValueError, match="SOI"):
        multimodal.parse_jpeg_header(b"P6\n1 1\n255\n\x00\x00\x00")
    with pytest.raises(ValueError, match="SOF"):
        multimodal.parse_jpeg_header(b"\xff\xd8\xff\xd9")


def test_image_dimensions_mixed_formats_no_fake_decoder(spark):
    """media_type='image/jpeg' rows flow through real header parsing —
    the fake feature decoder is nowhere in this path. Mixed PPM + JPEG +
    junk in one table; per-row format sniffing, NULL dims for junk."""
    import numpy as np

    rows = [
        (1, multimodal.encode_ppm(4, 3, np.zeros((3, 4, 3), dtype=np.uint8))),
        (2, _tiny_jpeg(800, 600)),
        (3, _tiny_jpeg(64, 64, progressive=True)),
        (4, b"\x00\x01not media"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.image_dimensions(media).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("ppm", 4, 3)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 800, 600)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 64, 64)
    assert got[4]["format"] == "unknown" and got[4]["width"] is None


def test_jpeg_truncated_sof_raises_value_error():
    """A JPEG truncated mid-SOF must raise the documented ValueError, not
    IndexError from reading past the buffer."""
    full = _tiny_jpeg(640, 480)
    sof_at = full.index(b"\xff\xc0")
    truncated = full[: sof_at + 5]  # cuts inside the SOF payload
    with pytest.raises(ValueError, match="truncated SOF"):
        multimodal.parse_jpeg_header(truncated)


def test_image_dimensions_corrupt_row_does_not_poison_batch(spark):
    """A payload that sniffs as a known format but is malformed must come
    back as format='corrupt' with NULL dims — one bad row at ingest scale
    must never fail the whole task."""
    import numpy as np

    full = _tiny_jpeg(320, 240)
    rows = [
        (1, full),
        (2, full[: full.index(b"\xff\xc0") + 5]),   # truncated SOF
        (3, b"\xff\xd8\xff\xd9"),                    # JPEG with no SOF
        (4, b"P6\n9 9\n255\n\x00"),                  # PPM raster too short
        (5, multimodal.encode_ppm(2, 2, np.zeros((2, 2, 3), dtype=np.uint8))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.image_dimensions(media).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 320, 240)
    for bad in (2, 3, 4):
        assert got[bad]["format"] == "corrupt", bad
        assert got[bad]["width"] is None and got[bad]["height"] is None
    assert (got[5]["format"], got[5]["width"], got[5]["height"]) == ("ppm", 2, 2)


def test_extract_features_jpeg_plug_point_without_fake(spark):
    """The decode= plug point accepts a real header-driven extractor: JPEG
    rows produce features derived from parsed dimensions, proving the
    plumbing works end-to-end with no _fake_decode_features involvement."""
    import numpy as np

    def header_features(payload: bytes) -> np.ndarray:
        w, h, ncomp = multimodal.parse_jpeg_header(payload)
        f = np.zeros(multimodal.FEATURE_DIM, dtype=np.float32)
        f[0], f[1], f[2] = w, h, ncomp
        return f

    media = spark.createDataFrame(
        [(i, "image/jpeg", _tiny_jpeg(100 + i, 50 + i), None) for i in range(6)],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in
           multimodal.extract_features(media, decode=header_features).collect()}
    assert len(out) == 6
    for i in range(6):
        assert out[i]["feature"][0] == 100.0 + i
        assert out[i]["feature"][1] == 50.0 + i
        assert out[i]["feature"][2] == 3.0


def test_png_header_parser_pure_python():
    for w, h, ct in [(640, 480, 6), (1, 1, 2), (4096, 2160, 0)]:
        got = multimodal.parse_png_header(multimodal.encode_png_header(w, h, color_type=ct))
        assert got == (w, h, 8, ct)
    with pytest.raises(ValueError, match="signature"):
        multimodal.parse_png_header(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 30)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.parse_png_header(multimodal.encode_png_header(8, 8)[:20])
    # first chunk must be IHDR
    bad = multimodal._PNG_SIGNATURE + (13).to_bytes(4, "big") + b"IDAT" + b"\x00" * 17
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.parse_png_header(bad)
    # zero dimension is declared-malformed per spec
    with pytest.raises(ValueError, match="zero dimension"):
        multimodal.parse_png_header(multimodal.encode_png_header(0, 5))


def test_mp4_duration_parser_pure_python():
    # v0 and v1 mvhd layouts, ms conversion at non-1000 timescales
    assert multimodal.parse_mp4_duration(
        multimodal.encode_mp4_header(90000, timescale=90000, version=0)
    ) == (1000, 90000)
    assert multimodal.parse_mp4_duration(
        multimodal.encode_mp4_header(2500, timescale=1000, version=1)
    ) == (2500, 1000)
    # the spec's all-ones unknown-duration sentinel -> duration None, file valid
    assert multimodal.parse_mp4_duration(
        multimodal.encode_mp4_header(0xFFFFFFFF, timescale=1000, version=0)
    ) == (None, 1000)
    assert multimodal.parse_mp4_duration(
        multimodal.encode_mp4_header(2**64 - 1, timescale=1000, version=1)
    ) == (None, 1000)
    with pytest.raises(ValueError, match="zero timescale"):
        multimodal.parse_mp4_duration(
            multimodal.encode_mp4_header(10, timescale=0, version=0)
        )
    with pytest.raises(ValueError, match="not found"):
        multimodal.parse_mp4_duration(
            (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big")
        )
    # truncated mid-mvhd
    full = multimodal.encode_mp4_header(2500, timescale=1000, version=0)
    with pytest.raises(ValueError):
        multimodal.parse_mp4_duration(full[:-6])


def test_image_dimensions_handles_png(spark):
    """PNG rows flow through the IHDR parse; a payload that sniffs as PNG
    but is malformed is marked corrupt, per the documented contract."""
    rows = [
        (1, multimodal.encode_png_header(320, 240)),
        (2, multimodal.encode_png_header(31, 7, color_type=2)),
        (3, multimodal.encode_png_header(16, 16)[:20]),  # truncated IHDR
        (4, _tiny_jpeg(64, 32)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.image_dimensions(media).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 320, 240)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("png", 31, 7)
    assert got[3]["format"] == "corrupt" and got[3]["width"] is None
    assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("jpeg", 64, 32)


def test_video_durations_and_frame_sampling(spark):
    """video_durations: real mvhd parse, corrupt marking, unknown-duration
    sentinel kept as valid-but-NULL; frame_sample_from_payload excludes
    both corrupt and unknown rows so F.sequence never sees NULL."""
    rows = [
        (1, multimodal.encode_mp4_header(2500, timescale=1000, version=0)),
        (2, multimodal.encode_mp4_header(180000, timescale=90000, version=1)),
        (3, multimodal.encode_mp4_header(2500)[:-6]),  # truncated mvhd
        (4, multimodal.encode_mp4_header(0xFFFFFFFF)),  # unknown duration
        (5, _tiny_jpeg(8, 8)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.video_durations(media).collect()}
    assert (got[1]["format"], got[1]["duration_ms"], got[1]["timescale"]) == ("mp4", 2500, 1000)
    assert (got[2]["format"], got[2]["duration_ms"], got[2]["timescale"]) == ("mp4", 2000, 90000)
    assert got[3]["format"] == "corrupt" and got[3]["duration_ms"] is None
    assert got[4]["format"] == "mp4" and got[4]["duration_ms"] is None
    assert got[5]["format"] == "jpeg" and got[5]["duration_ms"] is None

    frames = multimodal.frame_sample_from_payload(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id) == [1, 2]          # corrupt/unknown/non-video excluded
    assert sorted(by_id[1]) == [0, 1000, 2000]
    assert sorted(by_id[2]) == [0, 1000]


def test_streaming_exact_dedup_first_arrival_wins(spark, tmp_path):
    """Real readStream -> dropDuplicates -> memory sink: planted duplicate
    payloads collapse to one row per content hash, and every surviving
    hash matches the batch operator's canonical set."""
    from graphframes_rs_spark.pipeline import dedup as batch_dedup
    from graphframes_rs_spark.streaming import dedup as sdedup

    rows = [(i, f"doc body {i % 40}") for i in range(200)]  # 5x duplicated
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_micro")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = sdedup.streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_dedup").collect()
    assert len(got) == 40
    assert len({r["content_hash"] for r in got}) == 40
    batch_hashes = {
        r["content_hash"]
        for r in batch_dedup.exact_duplicates(docs).collect()
    }
    assert {r["content_hash"] for r in got} == batch_hashes


def test_streaming_exact_dedup_watermark_bounded(spark, tmp_path):
    """The watermark-bounded variant keeps the plan a streaming dedup with
    event-time state eviction (DeduplicateWithinWatermark), and still
    collapses in-window duplicates."""
    import datetime

    from graphframes_rs_spark.streaming import dedup as sdedup

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (i, f"body {i % 10}", base + datetime.timedelta(seconds=i))
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "docs_wm")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = sdedup.streaming_exact_dedup(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from stream_dedup_wm").collect()
    # all 50 rows land within the 10-minute window: exact collapse to 10
    assert len(got) == 10
    assert len({r["content_hash"] for r in got}) == 10


def test_neardup_first_arrival_batch_semantics(spark):
    """The batch twin on a planted corpus: exact duplicates collapse to
    the min-doc_id copy; a distinct-shingle doc survives; acceptance is
    the all-buckets conjunction (a doc beaten in ANY bucket drops)."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0 -> dropped
        (2, base + " extra"),           # near-dup of 0 -> shares buckets
        (3, "one two three four five six seven eight nine"),  # distinct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in sdedup.neardup_first_arrival(docs).collect()
    }
    assert 0 in kept and 3 in kept
    assert 1 not in kept                 # identical signature, later id
    # near-dup 2: dropped iff it shares >=1 band bucket with 0 — verify
    # the operator agrees with the LSH candidate generator on that
    from graphframes_rs_spark.pipeline import dedup as bdedup

    cands = {
        (r["doc_a"], r["doc_b"])
        for r in bdedup.minhash_lsh_candidates(
            bdedup.minhash_signatures(docs)
        ).collect()
    }
    assert ((0, 2) in cands) == (2 not in kept)


def test_streaming_neardup_equals_batch(spark, tmp_path):
    """streaming==batch equality gate (r12 verdict task 6): three
    microbatches (maxFilesPerTrigger=1, files in order) through the
    foreachBatch bucket-claim ingest produce exactly the batch twin's
    accepted set on the concatenated input — including a cross-batch
    near-dup (batch-2 re-crawl of a batch-0 doc) being dropped."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight nine ten",
        2: "red orange yellow green blue indigo violet ultra",
    }
    batches = [
        [(0, texts[0], 0.0), (1, texts[1], 1.0)],
        [(2, texts[2], 2.0)],
        [(3, texts[0], 3.0), (4, texts[1] + " eleven", 4.0)],  # re-crawls
    ]
    schema = "doc_id long, text string, ts double"
    src = str(tmp_path / "nd_src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    index_dir = str(tmp_path / "nd_index")
    out_dir = str(tmp_path / "nd_out")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = sdedup.streaming_neardup_dedup(
        stream,
        index_dir,
        out_dir,
        checkpoint_dir=str(tmp_path / "nd_ckpt"),
        order_col="ts",
    )
    q.processAllAvailable()
    q.stop()

    streamed = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    batch_kept = {
        r["doc_id"]
        for r in sdedup.neardup_first_arrival(
            all_docs, order_col="ts"
        ).collect()
    }
    assert streamed == batch_kept
    assert 0 in streamed and 3 not in streamed  # re-crawl dropped
    # the index holds bucket claims, not documents: schema + bounded rows
    idx = spark.read.parquet(index_dir)
    assert set(idx.columns) == {"band", "bucket", "ord", "doc_id"}


def test_neardup_ingest_horizon_evicts(spark, tmp_path):
    """The watermark analog: with horizon=1.0, a bucket claimed at ts=0
    is evicted once a batch at ts=10 lands, so a ts=11 re-crawl of the
    ts=0 doc re-emits (bounded state => re-emit trade, same as
    dropDuplicatesWithinWatermark)."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    schema = "doc_id long, text string, ts double"
    t0 = "alpha beta gamma delta epsilon zeta eta theta"
    index_dir = str(tmp_path / "h_index")
    b0 = spark.createDataFrame([(0, t0, 0.0)], schema)
    a0 = sdedup.neardup_ingest_batch(b0, index_dir, order_col="ts", horizon=1.0)
    assert [r["doc_id"] for r in a0.collect()] == [0]
    b1 = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine", 10.0)], schema
    )
    sdedup.neardup_ingest_batch(b1, index_dir, order_col="ts", horizon=1.0)
    # ts=0 claims are now past the horizon -> evicted -> re-crawl re-emits
    b2 = spark.createDataFrame([(2, t0, 11.0)], schema)
    a2 = sdedup.neardup_ingest_batch(b2, index_dir, order_col="ts", horizon=1.0)
    assert [r["doc_id"] for r in a2.collect()] == [2]


def test_neardup_null_text_accepted_not_dropped(spark, tmp_path):
    """A NULL-text doc has nothing to collide on: it must be ACCEPTED by
    both the batch twin and the ingest path — before the fix its NULL
    buckets fell out of the null-unsafe claim joins and absence read as
    rejection (silent row loss at the ingestion door)."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, None)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in sdedup.neardup_first_arrival(docs).collect()}
    assert kept == {0, 2}  # dup 1 dropped; null-text 2 accepted
    idx = str(tmp_path / "null_idx")
    a = sdedup.neardup_ingest_batch(docs, idx)
    assert {r["doc_id"] for r in a.select("doc_id").collect()} == {0, 2}
    # and the claim index never holds NULL buckets
    assert spark.read.parquet(idx).filter(
        F.col("bucket").isNull()
    ).count() == 0


def test_neardup_ingest_timestamp_horizon(spark, tmp_path):
    """horizon works with a TIMESTAMP order column (seconds semantics —
    the watermark analog), not just numeric orders."""
    import datetime as dt
    from graphframes_rs_spark.streaming import dedup as sdedup

    schema = "doc_id long, text string, ts timestamp"
    t0 = "alpha beta gamma delta epsilon zeta eta theta"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    idx = str(tmp_path / "ts_idx")
    a0 = sdedup.neardup_ingest_batch(
        spark.createDataFrame([(0, t0, base)], schema), idx,
        order_col="ts", horizon=60.0,
    )
    assert [r["doc_id"] for r in a0.collect()] == [0]
    # 10 minutes later: the ts=0 claim is past the 60s horizon -> evicted
    sdedup.neardup_ingest_batch(
        spark.createDataFrame(
            [(1, "one two three four five six seven eight nine",
              base + dt.timedelta(minutes=10))], schema),
        idx, order_col="ts", horizon=60.0,
    )
    a2 = sdedup.neardup_ingest_batch(
        spark.createDataFrame(
            [(2, t0, base + dt.timedelta(minutes=11))], schema),
        idx, order_col="ts", horizon=60.0,
    )
    assert [r["doc_id"] for r in a2.collect()] == [2]


def test_neardup_ingest_crash_recovery(spark, tmp_path):
    """The swap's crash window (index renamed aside, staged not yet
    promoted) self-heals: the next batch restores the '.old' index and
    re-arbitrates — dedup state is NOT silently reset to empty."""
    import os
    from graphframes_rs_spark.streaming import dedup as sdedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    idx = str(tmp_path / "crash_idx")
    b0 = spark.createDataFrame([(0, base)], "doc_id long, text string")
    sdedup.neardup_ingest_batch(b0, idx)
    # simulate the crash window: live index moved aside, promote not done
    os.rename(idx, idx + ".old")
    assert not os.path.isdir(idx)
    # replayed/next batch: a re-crawl of doc 0 must still be REJECTED
    b1 = spark.createDataFrame([(5, base)], "doc_id long, text string")
    a1 = sdedup.neardup_ingest_batch(b1, idx)
    assert a1.count() == 0
    assert not os.path.isdir(idx + ".old")  # recovery cleaned up


def test_neardup_ingest_nonlocal_uri_raises(spark, tmp_path):
    """The claim index's existence check + crash-safe swap are driver-
    local os/shutil ops: on HDFS/S3 they'd silently read 'no index' and
    reset dedup state, so non-local URIs must raise up front; file: URIs
    are local and must behave exactly like the plain path."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    b0 = spark.createDataFrame([(0, base)], "doc_id long, text string")
    for bad in ("hdfs://nn:8020/idx", "s3a://bucket/idx"):
        with pytest.raises(ValueError, match="LOCAL-FILESYSTEM"):
            sdedup.neardup_ingest_batch(b0, bad)
    # file: URI resolves to the same local dir as the plain path
    plain = str(tmp_path / "file_uri_idx")
    sdedup.neardup_ingest_batch(b0, "file://" + plain)
    import os

    assert os.path.isdir(plain)
    b1 = spark.createDataFrame([(7, base)], "doc_id long, text string")
    assert sdedup.neardup_ingest_batch(b1, plain).count() == 0  # re-crawl


def test_streaming_simhash_equals_batch(spark, tmp_path):
    """streaming==batch equality for the SIMHASH face (r13 verdict task
    4): three microbatches through the foreachBatch claim-index ingest
    produce exactly simhash_first_arrival's accepted set on the
    concatenated input — including a cross-batch re-crawl dropping."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight nine ten",
        2: "red orange yellow green blue indigo violet ultra",
    }
    batches = [
        [(0, texts[0], 0.0), (1, texts[1], 1.0)],
        [(2, texts[2], 2.0)],
        [(3, texts[0], 3.0), (4, texts[1] + " eleven", 4.0)],  # re-crawls
    ]
    schema = "doc_id long, text string, ts double"
    src = str(tmp_path / "sh_src")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out_dir = str(tmp_path / "sh_out")
    q = sdedup.streaming_simhash_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        str(tmp_path / "sh_index"),
        out_dir,
        checkpoint_dir=str(tmp_path / "sh_ckpt"),
        order_col="ts",
    )
    q.processAllAvailable()
    q.stop()
    streamed = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    batch_kept = {
        r["doc_id"]
        for r in sdedup.simhash_first_arrival(
            all_docs, order_col="ts"
        ).collect()
    }
    assert streamed == batch_kept
    assert 0 in streamed and 3 not in streamed  # exact re-crawl dropped


def test_simhash_first_arrival_semantics(spark):
    """Identical text -> identical signature -> later copy drops; a
    NULL-text doc is accepted unconditionally; banding agrees with the
    batch pipeline's pigeonhole candidates (drop iff >=1 shared band)."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, "one two three four five six"), (3, None)],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"] for r in sdedup.simhash_first_arrival(docs).collect()
    }
    assert 0 in kept and 1 not in kept and 3 in kept
    # doc 2: dropped iff it shares a band with an earlier doc under the
    # operator's own default banding (bits=32, max_hamming=1 -> two
    # 16-bit bands)
    bb = sdedup._simhash_buckets(docs, "text", None, 32, 1)
    shared = (
        bb.alias("a")
        .join(
            bb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .collect()
    )
    collides_with_earlier = {r[1] for r in shared}
    assert (2 not in kept) == (2 in collides_with_earlier)


def test_streaming_embedding_equals_batch(spark, tmp_path):
    """streaming==batch equality for the EMBEDDING face: three
    microbatches through the IVF-index foreachBatch ingest (full probe:
    nprobe >= nlist => exact) equal embedding_first_arrival on the
    concatenated input, including a cross-batch near-dup dropping and a
    NULL-vector row passing through."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    v = {
        0: [1.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0],
        2: [0.0, 0.0, 1.0],
        3: [0.999, 0.001, 0.0],   # near-dup of 0, arrives batch 3
        4: [0.0, 1.0, 0.05],      # near-dup of 1, arrives batch 3
        5: [0.7, 0.7, 0.0],       # distinct direction
    }
    batches = [
        [(0, v[0], 0.0), (1, v[1], 1.0)],
        [(2, v[2], 2.0), (6, None, 2.5)],
        [(3, v[3], 3.0), (4, v[4], 4.0), (5, v[5], 5.0)],
    ]
    schema = "vec_id long, embedding array<double>, ts double"
    src = str(tmp_path / "emb_src")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out_dir = str(tmp_path / "emb_out")
    q = sdedup.streaming_embedding_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        str(tmp_path / "emb_index"),
        out_dir,
        checkpoint_dir=str(tmp_path / "emb_ckpt"),
        threshold=0.98,
        order_col="ts",
        nlist=2,
        nprobe=4,
    )
    q.processAllAvailable()
    q.stop()
    streamed = {r["vec_id"] for r in spark.read.parquet(out_dir).collect()}
    all_vecs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    batch_kept = {
        r["vec_id"]
        for r in sdedup.embedding_first_arrival(
            all_vecs, threshold=0.98, order_col="ts"
        ).collect()
    }
    assert streamed == batch_kept
    assert {0, 1, 2, 5, 6} <= streamed       # null-vec 6 passes through
    assert 3 not in streamed and 4 not in streamed  # cross-batch dups


def test_embedding_ingest_replay_idempotent(spark, tmp_path):
    """A REPLAYED embedding microbatch (at-least-once foreachBatch)
    re-accepts exactly the same rows — its own indexed copies are not
    strictly earlier by (ord, id), so the batch is not annihilated; a
    true re-crawl at a LATER ord still drops."""
    from graphframes_rs_spark.streaming import dedup as sdedup

    schema = "vec_id long, embedding array<double>, ts double"
    idx = str(tmp_path / "replay_idx")
    b0 = spark.createDataFrame(
        [(0, [1.0, 0.0], 0.0), (1, [0.0, 1.0], 1.0)], schema
    )
    a0 = sdedup.embedding_ingest_batch(
        b0, idx, threshold=0.98, order_col="ts", nlist=2, nprobe=4
    )
    assert {r["vec_id"] for r in a0.collect()} == {0, 1}
    # replay: same ids, same ords -> same acceptance, not empty
    a0r = sdedup.embedding_ingest_batch(
        b0, idx, threshold=0.98, order_col="ts", nlist=2, nprobe=4
    )
    assert {r["vec_id"] for r in a0r.collect()} == {0, 1}
    # re-crawl of vec 0 at a later ord (even with the same id) drops
    b1 = spark.createDataFrame([(0, [1.0, 0.0], 9.0)], schema)
    assert sdedup.embedding_ingest_batch(
        b1, idx, threshold=0.98, order_col="ts", nlist=2, nprobe=4
    ).count() == 0


def test_event_transitions_hand_computed(spark):
    """Per-user time-ordered journeys: u1 a->b->a gives (a,b) and (b,a);
    u2 a->a gives (a,a); probabilities normalize per source type."""
    import datetime as dt

    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 0, 0, 0), "a"),
        (2, 10, dt.datetime(2024, 1, 1, 0, 1, 0), "b"),
        (3, 10, dt.datetime(2024, 1, 1, 0, 2, 0), "a"),
        (4, 20, dt.datetime(2024, 1, 1, 0, 0, 0), "a"),
        (5, 20, dt.datetime(2024, 1, 1, 0, 5, 0), "a"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in ev.event_transitions(events).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_streaming_heavy_hitters_exact_when_under_capacity(spark, tmp_path):
    """With capacity >= distinct items Misra-Gries never evicts, so the
    last emission per (shard, item) equals the exact count — across two
    micro-batches against the same state."""
    import os

    events = load_table(spark, SF_DIR, "events").limit(200).cache()
    src = str(tmp_path / "hh_src")
    os.makedirs(src, exist_ok=True)
    half = events.limit(100)
    half.coalesce(1).write.mode("overwrite").parquet(src)
    events.subtract(half).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = ev.streaming_heavy_hitters(stream, capacity=16, num_shards=2)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_exact")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by shard, item order by est_count desc) rn "
        "from hh_exact) where rn = 1"
    ).collect()
    got = {r["item"]: r["est_count"] for r in rows}
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    events.unpersist()


def test_streaming_heavy_hitters_eviction_keeps_heavy_item(spark, tmp_path):
    """Over capacity the merge subtracts the (capacity+1)-th largest
    count: 50x 'hot' + 20 singletons at capacity 4 leaves exactly
    {hot: 49} — the deterministic MG outcome — and state stays bounded."""
    rows = [("hot",)] * 50 + [(f"cold{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "event_type string")
    src = str(tmp_path / "hh_skew")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = ev.streaming_heavy_hitters(stream, capacity=4, num_shards=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_skew")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["item"]: r["est_count"]
        for r in spark.sql("select * from hh_skew").collect()
    }
    assert got == {"hot": 49}


def test_streaming_attribution_join_matches_batch(spark, tmp_path):
    """Real stream-stream interval join: readStream both sides (same
    parquet source filtered to the two event types), availableNow
    micro-batches, append sink — the joined pairs must equal the batch
    face exactly."""
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_attr")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = ev.streaming_attribution_join(
        stream, horizon_minutes=30, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stream_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["lag_seconds"])
        for r in spark.sql("select * from stream_attr").collect()
    }
    want = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["lag_seconds"])
        for r in ev.attribution_join(events, horizon_minutes=30).collect()
    }
    assert got == want
    assert len(want) > 0
    assert all(0 <= lag <= 1800 for _, _, _, lag in want)


def test_streaming_sliding_counts_matches_batch(spark, tmp_path):
    """readStream -> sliding windows -> memory sink (complete mode): the
    finalized window/key aggregates must equal the batch face."""
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_sliding")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = ev.streaming_sliding_counts(
        stream, "1 hour", "15 minutes", watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from stream_sliding").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.sliding_counts(events, "1 hour", "15 minutes").collect()
    }
    assert got == want
    # every event contributes to exactly duration/slide = 4 windows
    assert sum(n for n, _ in want.values()) == 4 * events.count()


def test_hypertable_rollup_levels_nest(spark):
    events = load_table(spark, SF_DIR, "events")
    out = ev.hypertable_rollup(events)
    rows = out.collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["resolution_s"], []).append(r)
    # every level's event total equals the raw count
    n = events.count()
    for res, rs in by_res.items():
        assert sum(r["n_events"] for r in rs) == n, res
    # bucket counts shrink as resolution coarsens
    assert len(by_res[900]) > len(by_res[3600]) > len(by_res[86400])
    # day-level min/max bound the 15-min-level ones in the same day
    day0 = min(r["window_start_epoch"] for r in by_res[86400])
    day_row = next(
        r for r in by_res[86400]
        if r["window_start_epoch"] == day0 and r["event_type"] == "click"
    )
    fine_in_day = [
        r for r in by_res[900]
        if day0 <= r["window_start_epoch"] < day0 + 86400
        and r["event_type"] == "click"
    ]
    assert day_row["min_value"] == min(r["min_value"] for r in fine_in_day)
    assert day_row["max_value"] == max(r["max_value"] for r in fine_in_day)
    import pytest as _pt

    with _pt.raises(ValueError):
        ev.hypertable_rollup(events, resolutions=(900, 1000))


def test_extract_features_strict_dispatches_on_media_type(spark, monkeypatch):
    """strict mode dispatches PER media_type: with an (emulated) Pillow
    decoder available, image rows decode through it while audio/video rows
    still raise the documented NotImplementedError — never an image-codec
    error from feeding it a non-image payload (ADVICE r10)."""
    import numpy as np

    def fake_pil(payload: bytes) -> np.ndarray:
        return np.full(multimodal.FEATURE_DIM, 7.0, dtype=np.float32)

    monkeypatch.setattr(multimodal, "real_decoder", lambda: fake_pil)
    media = spark.createDataFrame(
        [
            (1, "image/ppm", bytearray(b"P6\n1 1\n255\n\xff\x00\x00"), None),
            (2, "audio/wav", bytearray(b"RIFF....WAVE"), None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    img_only = multimodal.extract_features(
        media.filter("media_type like 'image%'"), strict=True
    ).collect()
    assert img_only[0]["feature"][0] == 7.0
    mixed = multimodal.extract_features(media, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        mixed.collect()


def _av_available():
    try:
        import av  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _av_available(), reason="PyAV not installed")
def test_av_decode_features_real_wav():
    """With PyAV importable, a PCM-WAV payload decodes for real: the
    feature layout leads with log1p(n_samples), log1p(sample_rate) and the
    stats reflect the synthetic signal (bounded, non-constant)."""
    import io
    import wave

    import numpy as np

    sig = (((np.arange(256) * 7) % 256 - 128) * 256).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    feat = multimodal.av_decode_features(buf.getvalue())
    assert len(feat) == multimodal.FEATURE_DIM
    assert abs(feat[1] - np.log1p(8000)) < 1e-3
    assert feat[3] > 0  # std of a varying signal


def test_extract_features_strict_av_dispatch(spark, monkeypatch):
    """strict mode routes video/audio rows through the (emulated) PyAV
    decoder while image rows without Pillow still raise — the av twin of
    the PIL dispatch test."""
    import numpy as np

    def fake_av(payload: bytes) -> np.ndarray:
        return np.full(multimodal.FEATURE_DIM, 9.0, dtype=np.float32)

    monkeypatch.setattr(multimodal, "real_av_decoder", lambda: fake_av)
    monkeypatch.setattr(multimodal, "real_decoder", lambda: None)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"\x00\x00\x00\x18ftypmp42"), None),
            (2, "audio/wav", bytearray(b"RIFF....WAVE"), None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.extract_features(media, strict=True).collect()
    assert all(r["feature"][0] == 9.0 for r in out)
