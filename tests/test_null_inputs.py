"""Null-value sweep: rows with NULL text / embedding / payload flowing
through the custom operators. Dirty data is the 100 TB default; the
numpy kernels inside mapInPandas are the crash sites plan gates can't
see."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_with_nulls(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, None),
            (3, "the quick brown fox jumps over the lazy dog again and again"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def emb_with_nulls(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)], 0) for i in range(6)]
    rows.append((6, None, 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_text_exprs_null_text(spark, docs_with_nulls):
    from etl_zero_spark.operators import text

    out = docs_with_nulls.select(
        "doc_id",
        text.word_count_expr(F.col("text")).alias("n_words"),
        text.lang_id_expr(F.col("text")).alias("lang"),
        text.winnow_fingerprints_expr(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].n_words is None and by_id[2].fp is None  # null in, null out
    assert by_id[1].n_words == 12
    assert by_id[4].n_words == 0


def test_dedup_null_text(spark, docs_with_nulls):
    from etl_zero_spark.operators import dedup

    pairs = dedup.ngram_jaccard_pairs(docs_with_nulls, threshold=0.9).collect()
    # the duplicate pair found; null/empty rows never pair
    assert {(r.a_id, r.b_id) for r in pairs} == {(1, 3)}
    mh = dedup.minhash_lsh_pairs(docs_with_nulls, threshold=0.9).collect()
    assert {(r.a_id, r.b_id) for r in mh} <= {(1, 3)}


def test_similarity_null_embedding(spark, emb_with_nulls):
    """Null vectors must not reach the numpy GEMM kernels: the exact
    pair path and distributed top-k must drop them (documented) rather
    than crash in np.stack."""
    from etl_zero_spark.operators import dedup, similarity

    pairs = dedup.embedding_neardup_pairs_blocked(emb_with_nulls, threshold=0.0)
    ids = {i for r in pairs.collect() for i in (r.a_id, r.b_id)}
    assert 6 not in ids
    queries = emb_with_nulls.where(F.col("vec_id") < 2)
    topk = similarity.brute_force_topk_distributed(queries, emb_with_nulls, k=3)
    assert 6 not in {r.neighbor_id for r in topk.collect()}


def test_contamination_null_text(spark, docs_with_nulls):
    from etl_zero_spark.operators import corpus

    out = corpus.cross_corpus_contamination(
        docs_with_nulls, docs_with_nulls.select("doc_id", "text"), n=5
    )
    got = {(r.test_id, r.train_id) for r in out.collect()}
    assert (1, 1) in got and (3, 1) in got  # real overlaps survive
    assert not any(2 in p for p in got)  # null doc pairs with nothing


def test_multimodal_null_payload(spark):
    from etl_zero_spark.operators import multimodal

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"some real bytes here"), "x"),
            (2, "image", None, "x"),
        ],
        "media_id long, kind string, payload binary, mime string",
    )
    meta = {r.media_id: r for r in multimodal.decode_metadata(media).collect()}
    assert meta[2].n_bytes == 0  # documented null -> empty-payload stub
    feats = {
        r.media_id: r.embedding
        for r in multimodal.extract_byte_features(media).collect()
    }
    assert all(v == 0.0 for v in feats[2])  # zero vector, unit-norm skipped
    px = {r.media_id: r.pixels for r in multimodal.resize_image(media, 4, 4).collect()}
    assert bytes(px[2]) == bytes(16)
    frames = multimodal.sample_frames(media, n_frames=2)
    assert frames.where("media_id = 2").count() == 2  # empty slices, not a crash


def test_pack_sequences_null_text(spark, docs_with_nulls):
    from etl_zero_spark.operators import corpus

    packed = corpus.pack_sequences(docs_with_nulls, budget=20)
    rows = {r.doc_id: r for r in packed.collect()}
    assert len(rows) == 4  # null-text doc still assigned (0 tokens)
    assert rows[2].n_tokens in (0, None)


def test_analytics_ops_with_null_users_and_timestamps(spark):
    """Funnel/cohorts/drift on rows carrying NULL user ids, timestamps
    and values: nulls must neither crash nor silently inflate counts."""
    import datetime as dt

    from etl_zero_spark.operators.cohorts import cohort_retention
    from etl_zero_spark.operators.drift import drift_report
    from etl_zero_spark.operators.funnel import funnel_users

    t0 = dt.datetime(2022, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, "view"),
            (1, t0 + dt.timedelta(hours=1), "click"),
            (None, t0, "view"),                 # null user
            (2, None, "view"),                  # null ts
            (3, t0, None),                      # null event type
        ],
        "user_id long, ts timestamp, event_type string",
    )
    f = {r.user_id: r.steps_completed for r in funnel_users(ev, ["view", "click"]).collect()}
    assert f[1] == 2
    assert f.get(None, 0) <= 1  # null user groups alone, never merges
    # null ts sorts first in its user's sequence; step can still match
    assert 2 in f

    tri = cohort_retention(ev.where("ts IS NOT NULL"), "1 week")
    assert tri.where(F.col("cohort").isNull()).count() == 0

    rep = drift_report(ev, ev, columns=["event_type"])
    assert rep[0]["verdict"] == "stable"


def test_scd2_null_keys_pass_through(spark):
    """A NULL key row in the dim groups with other NULL keys (Spark
    window partitioning) — document-by-test rather than surprise."""
    import datetime as dt

    from etl_zero_spark.sources.scd import scd2_init, scd2_merge

    t0 = dt.datetime(2020, 1, 1)
    dim = scd2_init(
        spark.createDataFrame([(None, "x"), (1, "y")], "k long, a string"), t0
    )
    ups = spark.createDataFrame(
        [(1, "z", t0 + dt.timedelta(days=1))], "k long, a string, ts timestamp"
    )
    out = scd2_merge(dim, ups, key="k", tracked=["a"])
    assert out.count() == 3
    nulls = out.where(F.col("k").isNull()).collect()
    assert len(nulls) == 1 and nulls[0].is_current


def test_span_dedup_null_and_empty_text(spark, docs_with_nulls):
    """Span dedup over null/empty text rows: they open no grams, are
    never marked, and pass through unchanged (null stays null, empty
    stays empty) on both the hash and verify_exact paths."""
    from etl_zero_spark.operators import dedup

    for ve in (False, True):
        out = {r.doc_id: r.text for r in dedup.remove_duplicate_spans(
            docs_with_nulls, k=4, verify_exact=ve).collect()}
        assert out[2] is None and out[4] == ""
        assert out[1] == out[3] or out[3] == ""  # dup doc 3 fully cut
        # doc 1 (global first) keeps its text verbatim
        assert out[1].startswith("the quick brown fox")
