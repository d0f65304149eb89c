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
    BinaryType,
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
    """STUB — real decoding requires PIL/ffmpeg, absent here.

    ``fake_dimensions`` is a deterministic stand-in (derived from the
    payload hash) so the distributed plumbing is fully testable; swap in
    a real backend by overriding ``decode``.
    """

    @staticmethod
    def fake_dimensions(payload: bytes) -> tuple[int, int]:
        h = hashlib.sha1(payload).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192)

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int]:
        try:
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "real image decode unavailable in this container; "
                "use fake_dimensions for plumbing tests"
            )
        raise NotImplementedError("real decode backend not wired yet")


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
    """Decode-ish pass over binary payloads via iterator ``mapInPandas``:
    streams Arrow batches, emits typed metadata (fake dims + real size +
    sha1). The sha1/size are real; the dimensions come from the stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                dims = [
                    DecodeBackend.fake_dimensions(p if p is not None else b"")
                    for p in chunk["payload"]
                ]
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
