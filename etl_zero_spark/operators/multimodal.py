"""Multimodal column plumbing (north-star extension, SURVEY §2.11).

Treats image/audio/video as opaque ``binary`` payload columns with
typed metadata, exactly as a 100 TB training-data lake stores them.
The *decode* step is stubbed (image/audio libraries are not in this
container — see ``DecodeBackend``), but everything Spark-side is real
and tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partition-size control for fat binary rows.

Design points for scale:
* Binary rows are fat — ``rows_per_batch`` caps Arrow batch height so a
  128 MiB task doesn't balloon into GiB-scale pandas frames.
* Decode/feature-extract are ``mapInPandas`` (iterator form) so one
  Python worker streams batches instead of materializing a partition.
* Frame sampling is a row-expanding ``mapInPandas`` that emits
  (media_id, frame_idx, frame_payload) — the explode happens inside the
  Arrow stream, never on the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("payload_sha1", StringType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


class DecodeBackend:
    """Header-level decode is REAL (stdlib byte parsing of PNG IHDR,
    JPEG SOFn, GIF logical-screen descriptors — no PIL/ffmpeg needed);
    full pixel decode stays out of scope in this container.

    ``fake_dimensions`` remains the deterministic stand-in for payloads
    that are not actual media (e.g. the text-fabricated fixture), so the
    distributed plumbing is testable on any bytes.
    """

    @staticmethod
    def fake_dimensions(payload: bytes) -> tuple[int, int]:
        h = hashlib.sha1(payload).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192)

    @staticmethod
    def sniff_dimensions(payload: bytes) -> tuple[int, int] | None:
        """(width, height) parsed from the container header, or None if
        the bytes aren't recognizable PNG/JPEG/GIF.

        * PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
          width/height are big-endian u32 at offsets 16/20.
        * GIF: 'GIF87a'/'GIF89a', then little-endian u16 width/height.
        * JPEG: walk the marker segments from SOI until a frame header
          (SOF0-SOF15 except DHT/JPG/DAC); its payload is
          [precision u8][height u16][width u16] big-endian.
        """
        if payload is None or len(payload) < 10:
            return None
        if (
            payload[:8] == b"\x89PNG\r\n\x1a\n"
            and len(payload) >= 24
            and payload[12:16] == b"IHDR"
        ):
            return (
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return (
                int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"),
            )
        if payload[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            n = len(payload)
            while i + 9 <= n:
                if payload[i] != 0xFF:
                    return None  # lost marker sync
                marker = payload[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # no payload
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                if seg_len < 2:
                    return None
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 <= n:
                        return (
                            int.from_bytes(payload[i + 7 : i + 9], "big"),
                            int.from_bytes(payload[i + 5 : i + 7], "big"),
                        )
                    return None
                i += 2 + seg_len
        return None

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int]:
        dims = DecodeBackend.sniff_dimensions(payload)
        if dims is not None:
            return dims
        raise NotImplementedError(
            "payload is not PNG/JPEG/GIF; full pixel decode requires "
            "PIL/ffmpeg, absent in this container"
        )


def attach_payload_from_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fabricate a media table from the documents fixture (no binary
    fixture ships): payload = utf-8 bytes of the text. Lets every
    downstream operator run on real distributed binary columns."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_metadata(media: DataFrame, rows_per_batch: int = 256) -> DataFrame:
    """Decode pass over binary payloads via iterator ``mapInPandas``:
    streams Arrow batches, emits typed metadata. Size/sha1 are real;
    dimensions are REAL for recognizable media (PNG/JPEG/GIF header
    parse, stdlib-only) and fall back to the deterministic stub for
    other bytes (the text-fabricated fixture)."""

    def _dims(payload: bytes | None) -> tuple[int, int]:
        b = payload if payload is not None else b""
        sniffed = DecodeBackend.sniff_dimensions(b)
        return sniffed if sniffed is not None else DecodeBackend.fake_dimensions(b)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                dims = [_dims(p) for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "width": [d[0] for d in dims],
                        "height": [d[1] for d in dims],
                        "n_bytes": [
                            len(p) if p is not None else 0 for p in chunk["payload"]
                        ],
                        "payload_sha1": [
                            hashlib.sha1(p if p is not None else b"").hexdigest()
                            for p in chunk["payload"]
                        ],
                    }
                )

    return media.mapInPandas(gen, DECODED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, chunk: int = 32) -> DataFrame:
    """Frame sampling for 'video' payloads: row-expanding mapInPandas
    emitting ``n_frames`` evenly spaced payload slices per row (the stub
    slice stands in for ffmpeg frame extraction; batch shape is real)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payload = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                step = max(len(payload) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    out_ids.append(row["media_id"])
                    out_idx.append(i)
                    out_payload.append(payload[i * step : i * step + chunk])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_payload": out_payload}
            )

    return media.mapInPandas(gen, FRAME_SCHEMA)


def multimodal_rows(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """SURVEY §2.11's multimodal row: text + embedding + metadata joined
    on id. The embedding side is co-keyed (vec_id == doc_id) so at scale
    this is a bucket-friendly 1-1 join."""
    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"], "inner")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.col("label").alias("cluster_label"),
            F.size("embedding").alias("embedding_dim"),
        )
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("bits_per_sample", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_ms", DoubleType(), True),
    ]
)


def sniff_audio(payload: bytes | None) -> tuple[int, int, int, int] | None:
    """(sample_rate, n_channels, bits_per_sample, n_frames) parsed from
    a RIFF/WAVE container header, or None if the bytes aren't WAV.

    Stdlib-only like ``DecodeBackend.sniff_dimensions``: RIFF layout is
    'RIFF' u32le 'WAVE' then word-aligned (id, u32le size, data)
    chunks; 'fmt ' carries channels/rate/block-align/bits, 'data''s
    size / block_align is the frame count. Compressed codecs would
    need real audio libs (absent here) — but PCM WAV metadata is a
    pure header read, so this path is REAL, not a stub.
    """
    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            n_channels = int.from_bytes(payload[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            block_align = int.from_bytes(payload[i + 20 : i + 22], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
            fmt = (sample_rate, n_channels, bits, block_align)
        elif cid == b"data":
            data_size = size
        if fmt is not None and data_size is not None:
            break
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None:
        return None
    sample_rate, n_channels, bits, block_align = fmt
    if not sample_rate or not block_align:
        return None
    return (sample_rate, n_channels, bits, (data_size or 0) // block_align)


def decode_audio_metadata(media: DataFrame, rows_per_batch: int = 256) -> DataFrame:
    """Audio twin of ``decode_metadata``: iterator ``mapInPandas`` over
    binary payloads emitting typed WAV metadata (nulls for
    non-WAV payloads — the caller filters or inspects)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                metas = [sniff_audio(p) for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "sample_rate": [m[0] if m else None for m in metas],
                        "n_channels": [m[1] if m else None for m in metas],
                        "bits_per_sample": [m[2] if m else None for m in metas],
                        "n_frames": [m[3] if m else None for m in metas],
                        "duration_ms": [
                            (m[3] * 1000.0 / m[0]) if m and m[0] else None
                            for m in metas
                        ],
                    }
                )

    return media.mapInPandas(gen, AUDIO_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def extract_byte_features(media: DataFrame, dim: int = 64, rows_per_batch: int = 256) -> DataFrame:
    """Feature extraction over binary payloads — REAL, not a stub: an
    L2-normalized byte-value histogram folded to ``dim`` bins. Byte
    histograms are the classic cheap content signature (format/entropy
    sensitive, size invariant after normalization); the point here is
    the full pipeline contract: the output column is schema-compatible
    with the embeddings fixture (``embedding array<float>``), so
    payload features flow STRAIGHT into the similarity/dedup tier —
    media near-dup detection with zero image libraries:

        feats = extract_byte_features(media)          # id, array<float>
        pairs = similarity.lsh_neardup_pairs(
            feats.withColumnRenamed("media_id", "vec_id"), threshold=0.95)

    A learned visual encoder drops in by replacing this one function;
    every downstream operator is unchanged. Iterator mapInPandas,
    numpy-vectorized per batch, Arrow height capped like the decode
    pass."""
    import numpy as np

    if not 1 <= dim <= 256 or 256 % dim:
        raise ValueError(f"dim must divide 256, got {dim}")
    fold = 256 // dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                out = []
                for p in chunk["payload"]:
                    if p is None or len(p) == 0:
                        out.append(np.zeros(dim, dtype="float32"))
                        continue
                    h = np.bincount(
                        np.frombuffer(p, dtype=np.uint8), minlength=256
                    ).reshape(dim, fold).sum(axis=1).astype("float64")
                    nrm = float(np.sqrt((h * h).sum()))
                    out.append((h / nrm if nrm else h).astype("float32"))
                yield pd.DataFrame(
                    {"media_id": chunk["media_id"].values, "embedding": out}
                )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", BinaryType(), True),
    ]
)


def resize_image(media: DataFrame, width: int = 32, height: int = 32, rows_per_batch: int = 128) -> DataFrame:
    """Resize pass (the training-pipeline normalize-to-model-input
    step). Pixel decode of real formats needs PIL/ffmpeg (absent in
    this container — the documented stub boundary, see DecodeBackend);
    the DETERMINISTIC FAKE treats the payload as a square grayscale
    byte grid of side ceil(sqrt(n)) (zero-padded) and nearest-neighbor
    samples it to exactly ``width*height`` bytes — a pure function of
    the payload with the real operator's shape: fixed-size binary out,
    row-aligned, numpy-vectorized inside iterator mapInPandas. Swap
    the inner ``sample`` for a real decoder and nothing else moves.
    Output: (media_id, width, height, pixels binary[width*height])."""
    import math

    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("resize_image: width/height must be positive")

    def sample(p: bytes | None) -> bytes:
        if not p:
            return bytes(width * height)
        buf = np.frombuffer(p, dtype=np.uint8)
        side = math.isqrt(len(buf) - 1) + 1  # ceil(sqrt(n))
        grid = np.zeros(side * side, dtype=np.uint8)
        grid[: len(buf)] = buf
        grid = grid.reshape(side, side)
        ys = (np.arange(height) * side) // height
        xs = (np.arange(width) * side) // width
        return grid[np.ix_(ys, xs)].tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "width": width,
                        "height": height,
                        "pixels": [sample(p) for p in chunk["payload"]],
                    }
                )

    return media.mapInPandas(gen, RESIZED_SCHEMA)
