"""Empty-input sweep: every major operator family must return an
empty (or well-defined) result on 0-row inputs, never crash — the
edge every real pipeline hits on its first day (an empty partition, a
filter that matched nothing, a new tenant with no data)."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_docs(spark):
    return load_table(spark, SF_SMOKE, "documents").where(F.lit(False))


@pytest.fixture(scope="module")
def empty_emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").where(F.lit(False))


@pytest.fixture(scope="module")
def empty_li(spark):
    return load_table(spark, SF_SMOKE, "lineitem").where(F.lit(False))


def test_dedup_family_empty(spark, empty_docs):
    from etl_zero_spark.operators import dedup

    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, threshold=0.3).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs, threshold=0.3).count() == 0
    assert dedup.simhash_pairs(empty_docs, max_hamming=3).count() == 0
    pairs = dedup.ngram_jaccard_pairs(empty_docs, threshold=0.3)
    assert dedup.dedup_keep_min(empty_docs.select("doc_id"), pairs).count() == 0
    assert dedup.dedup_transitive(empty_docs.select("doc_id"), pairs).count() == 0


def test_similarity_family_empty(spark, empty_emb):
    from etl_zero_spark.operators import similarity

    assert similarity.lsh_neardup_pairs(empty_emb, threshold=0.9).count() == 0
    assert (
        similarity.brute_force_topk_distributed(empty_emb, empty_emb, k=5).count()
        == 0
    )
    assert similarity.lsh_partitioned_topk(empty_emb, empty_emb, k=5).count() == 0


def test_text_and_corpus_empty(spark, empty_docs):
    from etl_zero_spark.operators import corpus, text

    assert empty_docs.select(
        text.lang_id_expr(F.col("text"))
    ).count() == 0
    assert empty_docs.select(
        text.winnow_fingerprints_expr(F.col("text"))
    ).count() == 0
    assert (
        corpus.cross_corpus_contamination(empty_docs, empty_docs).count() == 0
    )
    assert corpus.pack_sequences(empty_docs, budget=100).count() == 0
    assert (
        corpus.stratified_sample(empty_docs, "lang", 0.5, "doc_id").count() == 0
    )
    assert corpus.stratified_take(empty_docs, "lang", 5, "doc_id").count() == 0


def test_charts_empty(spark, empty_li):
    from etl_zero_spark.plans import charts

    assert charts.bar_data(empty_li, "l_returnflag", "l_quantity").count() == 0
    assert charts.pie_data(empty_li, "l_returnflag", "l_quantity").count() == 0
    assert charts.scatter_data(empty_li, "l_quantity", "l_extendedprice").count() == 0
    assert charts.line_data(empty_li, "l_shipdate", "l_quantity").count() == 0
    # histogram on an empty column: stats row exists (nulls), bins
    # degrade to an empty or all-zero spine — must not crash
    rows = charts.histogram_data(empty_li, "l_quantity", bins=5).collect()
    assert sum(r["count"] for r in rows) == 0


def test_joins_and_cdc_empty(spark, empty_li):
    from etl_zero_spark.operators.joins import asof_join, range_join, salted_join
    from etl_zero_spark.sources.incremental import merge_latest

    ev = load_table(spark, SF_SMOKE, "events")
    empty_ev = ev.where(F.lit(False))
    left = empty_ev.select("event_id", "user_id", "ts")
    right = empty_ev.select("user_id", "ts", "value")
    assert asof_join(left, right, on="ts", by="user_id").count() == 0
    iv = empty_ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    assert range_join(left, iv, "ts", "s", "e", by="user_id").count() == 0
    assert salted_join(empty_li, empty_li.select("l_orderkey").distinct(), "l_orderkey").count() == 0
    base = empty_li.select("l_orderkey").withColumn("v", F.lit(0))
    assert merge_latest(base, base, key="l_orderkey", version_col="v").count() == 0


def test_validate_and_aggregate_empty(spark, empty_li):
    from etl_zero_spark.operators import validate as V
    from etl_zero_spark.operators.aggregate import key_skew_report, quantiles

    rep = V.validate(
        empty_li,
        [V.not_null("l_orderkey"), V.in_range("l_quantity", lo=0), V.unique("l_orderkey")],
    )
    assert rep.n_rows == 0 and rep.passed
    q = quantiles(empty_li, "l_quantity", [0.5]).first()
    assert q["l_quantity_p50"] is None  # empty -> null quantile, not crash
    skew = key_skew_report(empty_li, "l_orderkey").first()
    assert skew.n_keys == 0 and skew.top_keys == []


def test_multimodal_empty(spark, empty_docs):
    from etl_zero_spark.operators import multimodal

    media = multimodal.attach_payload_from_text(empty_docs)
    assert multimodal.decode_metadata(media).count() == 0
    assert multimodal.sample_frames(media).count() == 0
    assert multimodal.extract_byte_features(media).count() == 0
    assert multimodal.resize_image(media, 8, 8).count() == 0


def test_ivf_empty_raises_clear_error(spark, empty_emb):
    from etl_zero_spark.operators import ivf

    with pytest.raises(ValueError, match="empty corpus"):
        ivf.train_ivf_centroids(empty_emb, 4, max_iter=2)


def test_scd2_and_timeseries_empty(spark):
    import datetime as dt

    from etl_zero_spark.operators.timeseries import fill_gaps, resample
    from etl_zero_spark.sources.scd import scd2_init, scd2_merge

    empty_src = spark.createDataFrame([], "k long, a string")
    dim = scd2_init(empty_src, dt.datetime(2020, 1, 1))
    assert dim.count() == 0
    ups = spark.createDataFrame([], "k long, a string, ts timestamp")
    # empty dim + empty updates; and a real dim + empty updates
    assert scd2_merge(dim, ups, key="k", tracked=["a"]).count() == 0
    live = scd2_init(
        spark.createDataFrame([(1, "x")], "k long, a string"), dt.datetime(2020, 1, 1)
    )
    out = scd2_merge(live, ups, key="k", tracked=["a"])
    assert out.count() == 1 and out.collect()[0].is_current

    empty_ts = spark.createDataFrame([], "k string, ts timestamp, v double")
    assert resample(empty_ts, "ts", "k", "1 hour", {"v": "sum"}).count() == 0
    assert (
        fill_gaps(empty_ts, "ts", "k", "1 hour", {"v": "sum"}, fill="ffill").count()
        == 0
    )


def test_reshape_empty(spark):
    from etl_zero_spark.operators.reshape import pivot_table, pivot_values, unpivot

    empty = spark.createDataFrame([], "k string, p string, v double")
    assert pivot_values(empty, "p") == []
    wide = pivot_table(empty, "k", "p", ["x", "y"], {"v": "sum"})
    assert wide.count() == 0
    assert set(wide.columns) == {"k", "x_v_sum", "y_v_sum"}
    assert unpivot(empty, "k", ["v"]).count() == 0


def test_snapshot_and_matview_empty(spark, tmp_path):
    from etl_zero_spark.operators.matview import MaterializedAgg
    from etl_zero_spark.sources.snapshots import SnapshotTable

    empty = spark.createDataFrame([], "k string, v double")
    tbl = SnapshotTable(str(tmp_path / "t"))
    v = tbl.commit(empty)
    assert tbl.read(spark).count() == 0
    assert tbl.manifest(v)["rows"] == 0
    # matview over an empty base: full build yields an empty view
    state = SnapshotTable(str(tmp_path / "s"))
    mv = MaterializedAgg(tbl, state, keys=["k"], aggs={"v": ["sum"]})
    r = mv.refresh(spark)
    assert r["mode"] == "full"
    assert mv.read(spark).count() == 0
    # appending 0 rows is still a version; refresh handles the empty delta
    tbl.commit(empty, mode="append")
    r = mv.refresh(spark)
    assert r["mode"] == "incremental"
    assert mv.read(spark).count() == 0


def test_r6_operators_empty(spark, empty_docs, empty_emb):
    """R6 tier on 0-row inputs: chunking, LM train/score/buckets, DSIR,
    semantic dedup — empty in, well-defined (usually empty) out."""
    import numpy as np

    from etl_zero_spark.operators import corpus as corp
    from etl_zero_spark.operators import lm, similarity
    from etl_zero_spark.operators.text import chunk_documents

    assert chunk_documents(empty_docs, 64).count() == 0

    # empty reference corpus: degenerate-but-usable model (UNK-only)
    model = lm.train_ngram_lm(empty_docs)
    assert model.unigrams[lm.UNK] >= 1 and model.total >= 1
    probe = spark.createDataFrame([(1, "some words here")], ["i", "text"])
    ppl = lm.score_perplexity(probe, model).collect()[0].perplexity
    assert ppl is not None and ppl > 0
    assert lm.score_perplexity(empty_docs, model).count() == 0
    assert lm.ccnet_buckets(
        lm.score_perplexity(
            empty_docs.withColumn("lang", F.lit("en")), model
        )
    ).count() == 0

    # DSIR with an empty raw and/or target: B-row smoothed table,
    # empty scores/resample
    docs = load_table(spark, SF_SMOKE, "documents")
    lr = corp.dsir_bucket_logratio(empty_docs, docs.limit(5), n_buckets=32)
    assert lr.count() == 32
    assert corp.dsir_scores(empty_docs, lr, n_buckets=32).count() == 0
    assert corp.dsir_resample(
        corp.dsir_scores(empty_docs, lr, n_buckets=32), 10
    ).count() == 0
    lr2 = corp.dsir_bucket_logratio(docs.limit(5), empty_docs, n_buckets=32)
    assert lr2.count() == 32  # add-1 smoothing: no log(0)

    cents = np.random.RandomState(0).randn(4, 8)
    assert similarity.semantic_dedup_pairs(empty_emb, cents).count() == 0
    assert similarity.semantic_dedup(empty_emb, cents).count() == 0


def test_r7_operators_empty(spark, empty_docs):
    """R7 tier on 0-row inputs: span dedup (both hash and verify_exact
    paths), classifier scoring, streaming keep-set before any commit."""
    from etl_zero_spark.operators import classifier, dedup
    from etl_zero_spark.streaming.dedup import (
        StreamingNeardupState,
        resolved_keep_set,
    )

    assert dedup.duplicate_spans(empty_docs, k=4).count() == 0
    assert dedup.remove_duplicate_spans(empty_docs, k=4).count() == 0
    assert dedup.remove_duplicate_spans(
        empty_docs, k=4, verify_exact=True
    ).count() == 0

    # a model trained on tiny corpora still scores an empty frame
    tiny = spark.createDataFrame(
        [(1, "good solid prose here"), (2, "more useful words")],
        "doc_id long, text string",
    )
    junk = spark.createDataFrame(
        [(3, "spam spam spam"), (4, "junk junk junk")],
        "doc_id long, text string",
    )
    model = classifier.train_quality_classifier(tiny, junk, n_features=1 << 10)
    assert classifier.score_quality(empty_docs, model).count() == 0
    assert classifier.classifier_filter(empty_docs, model).count() == 0

    # keep-set before the first pairs commit: identity
    import tempfile

    state = StreamingNeardupState(tempfile.mkdtemp(prefix="etlzero_ks_"))
    assert resolved_keep_set(spark, state, tiny).count() == 2


def test_line_dedup_and_mix_empty(spark, empty_docs):
    from etl_zero_spark.operators import corpus, dedup

    assert dedup.duplicate_lines(empty_docs).count() == 0
    assert dedup.remove_duplicate_lines(empty_docs).count() == 0
    res = corpus.mix_corpus(empty_docs, {"webtext": 1.0}, total_docs=10)
    assert res.df.count() == 0
    assert res.allocation["webtext"]["available"] == 0
    assert res.allocation["webtext"]["allocated"] == 0
    res = corpus.mix_corpus(
        empty_docs, {"webtext": 1.0}, total_tokens=10, exact=True
    )
    assert res.df.count() == 0
