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


def test_decode_backend_stub_raises_without_pil():
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        try:
            multimodal.DecodeBackend.decode(b"xx")
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass


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
