"""Multimodal plumbing: real payload bytes through mapInPandas — sha1
and sizes verified against hashlib; frame sampling batch shape."""

import hashlib

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import multimodal
from tests.conftest import SF_SMOKE


def test_decode_metadata_sha1_matches_hashlib(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = multimodal.attach_payload_from_text(docs)
    decoded = {r.media_id: r for r in multimodal.decode_metadata(media).collect()}
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        d = decoded[r.doc_id]
        assert d.n_bytes == len(payload)
        assert d.payload_sha1 == hashlib.sha1(payload).hexdigest()
        assert 64 <= d.width < 256 and 64 <= d.height < 256


def test_decode_backend_raises_on_unrecognized_bytes():
    try:
        multimodal.DecodeBackend.decode(b"not an image at all")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def _real_png(width: int, height: int) -> bytes:
    """A complete, valid PNG built with stdlib only (RGB, all-zero rows)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * (3 * width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_jpeg_header(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + DQT filler + SOF0 carrying the dimensions —
    the marker walk a header parser performs is fully exercised."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">H", height)
        + struct.pack(">H", width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def test_sniff_dimensions_real_media():
    png = _real_png(37, 21)
    assert multimodal.DecodeBackend.sniff_dimensions(png) == (37, 21)
    assert multimodal.DecodeBackend.decode(png) == (37, 21)

    jpg = _real_jpeg_header(640, 480)
    assert multimodal.DecodeBackend.sniff_dimensions(jpg) == (640, 480)

    gif = b"GIF89a" + (13).to_bytes(2, "little") + (7).to_bytes(2, "little") + b"\x00" * 6
    assert multimodal.DecodeBackend.sniff_dimensions(gif) == (13, 7)

    assert multimodal.DecodeBackend.sniff_dimensions(b"plain text") is None
    assert multimodal.DecodeBackend.sniff_dimensions(b"") is None


def test_decode_metadata_real_dimensions_through_spark(spark):
    """Real media bytes through the distributed decode pass: the parsed
    dimensions must surface in the DataFrame, alongside the stub path
    for unrecognized payloads."""
    rows = [
        (1, "image", bytearray(_real_png(37, 21)), "image/png"),
        (2, "image", bytearray(_real_jpeg_header(640, 480)), "image/jpeg"),
        (3, "image", bytearray(b"not media"), "application/octet-stream"),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.decode_metadata(media).collect()}
    assert (out[1].width, out[1].height) == (37, 21)
    assert (out[2].width, out[2].height) == (640, 480)
    fake = multimodal.DecodeBackend.fake_dimensions(b"not media")
    assert (out[3].width, out[3].height) == fake
    assert out[1].n_bytes == len(_real_png(37, 21))


def test_sample_frames_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = multimodal.attach_payload_from_text(docs)
    frames = multimodal.sample_frames(media, n_frames=4).collect()
    assert len(frames) == 40
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == [0, 1, 2, 3]


def test_multimodal_rows_join(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = multimodal.multimodal_rows(docs, emb)
    assert out.count() == min(docs.count(), emb.count())
    assert out.first().embedding_dim == 64


def test_sniff_audio_real_wav():
    """A genuine PCM WAV produced by the stdlib wave module must parse
    back to its exact parameters — the audio header path is real."""
    import io
    import wave

    from etl_zero_spark.operators.multimodal import sniff_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)  # 16-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02\x03" * 1600)  # 1600 stereo frames
    payload = buf.getvalue()
    assert sniff_audio(payload) == (8000, 2, 16, 1600)
    assert sniff_audio(b"not a wav at all, just text bytes") is None
    assert sniff_audio(None) is None
    assert sniff_audio(b"RIFF....WAVE") is None  # truncated header


def test_decode_audio_metadata_through_spark(spark):
    import io
    import wave

    from etl_zero_spark.operators import multimodal

    def make_wav(rate, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x01" * frames)
        return buf.getvalue()

    rows = [
        (1, "audio", bytearray(make_wav(16000, 16000)), "audio/wav"),  # 1000 ms
        (2, "audio", bytearray(make_wav(8000, 2000)), "audio/wav"),    # 250 ms
        (3, "audio", bytearray(b"junk bytes"), "application/octet-stream"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string"
    )
    got = {r.media_id: r for r in multimodal.decode_audio_metadata(media).collect()}
    assert got[1].sample_rate == 16000 and got[1].duration_ms == 1000.0
    assert got[2].n_frames == 2000 and got[2].duration_ms == 250.0
    assert got[3].sample_rate is None and got[3].duration_ms is None


def test_extract_byte_features_matches_numpy(spark):
    """L2-normalized folded byte histogram recomputed driver-side."""
    import numpy as np

    payloads = [b"abc" * 50, bytes(range(256)) * 3, b"", b"\xff" * 100]
    media = spark.createDataFrame(
        [(i, "image", bytearray(p), "x") for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, mime string",
    )
    got = {
        r.media_id: np.array(r.embedding)
        for r in multimodal.extract_byte_features(media, dim=64).collect()
    }
    for i, p in enumerate(payloads):
        h = np.bincount(np.frombuffer(p, dtype=np.uint8), minlength=256)
        h = h.reshape(64, 4).sum(axis=1).astype("float64")
        nrm = np.sqrt((h * h).sum())
        want = (h / nrm if nrm else h).astype("float32")
        assert np.allclose(got[i], want, atol=1e-6), i
        if nrm:
            assert abs(float((got[i] ** 2).sum()) - 1.0) < 1e-5  # unit norm

    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        multimodal.extract_byte_features(media, dim=48)


def test_byte_features_flow_into_neardup_tier(spark):
    """The multimodal near-dup pipeline end-to-end WITHOUT image libs:
    payloads -> byte features -> the embedding near-dup operator.
    Planted: media 10/11 share identical bytes, 12 is a light edit,
    13 is unrelated."""
    from pyspark.sql import functions as F

    from etl_zero_spark.operators import dedup

    base = (b"the quick brown fox jumps over the lazy dog " * 40)
    rows = [
        (10, base),
        (11, base),                                  # exact dup
        (12, base[:-40] + b"A DIFFERENT ENDING!!"),  # near dup
        (13, bytes(reversed(range(256))) * 7),       # unrelated
    ]
    media = spark.createDataFrame(
        [(i, "image", bytearray(p), "x") for i, p in rows],
        "media_id long, kind string, payload binary, mime string",
    )
    feats = multimodal.extract_byte_features(media).withColumnRenamed(
        "media_id", "vec_id"
    )
    pairs = dedup.embedding_neardup_pairs_blocked(feats, threshold=0.99)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (10, 11) in got and (10, 12) in got and (11, 12) in got
    assert not any(13 in p for p in got)


def test_resize_image_deterministic_fake(spark):
    import math

    import numpy as np

    payloads = [bytes(range(100)), b"xyz", b""]
    media = spark.createDataFrame(
        [(i, "image", bytearray(p), "x") for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, mime string",
    )
    got = {r.media_id: r for r in multimodal.resize_image(media, 8, 8).collect()}
    for i, p in enumerate(payloads):
        px = got[i].pixels
        assert len(px) == 64 and got[i].width == 8 and got[i].height == 8
        if p:
            buf = np.frombuffer(p, dtype=np.uint8)
            side = math.isqrt(len(buf) - 1) + 1
            grid = np.zeros(side * side, dtype=np.uint8)
            grid[: len(buf)] = buf
            grid = grid.reshape(side, side)
            ys = (np.arange(8) * side) // 8
            xs = (np.arange(8) * side) // 8
            assert bytes(px) == grid[np.ix_(ys, xs)].tobytes()
        else:
            assert bytes(px) == bytes(64)
    # upscale path: 2-byte payload still yields exactly w*h bytes
    tiny = spark.createDataFrame(
        [(0, "image", bytearray(b"ab"), "x")],
        "media_id long, kind string, payload binary, mime string",
    )
    up = multimodal.resize_image(tiny, 16, 4).first()
    assert len(up.pixels) == 64
