"""DSIR importance resampling (operators/corpus.py — Xie et al. 2023):
bucket log-ratio math vs an independent recomputation, planted
target-vs-raw separation, deterministic Gumbel top-k resampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import corpus

_TARGET = [
    "spark structured streaming exactly once sinks",
    "spark catalyst optimizer plans streaming queries",
    "structured streaming watermarks bound state",
]
_RAW = [
    (0, "spark structured streaming state stores"),       # target-like
    (1, "catalyst optimizer plans spark queries"),        # target-like
    (2, "chocolate cake recipes with extra frosting"),    # off-target
    (3, "gardening tips for tomato plants in summer"),    # off-target
]


def _dfs(spark):
    t = spark.createDataFrame(
        [(100 + i, x) for i, x in enumerate(_TARGET)], ["doc_id", "text"]
    )
    r = spark.createDataFrame(_RAW, ["doc_id", "text"])
    return r, t


def test_bucket_logratio_math(spark):
    """The B-row table must equal log((p_n+1)/p_tot) - log((q_n+1)/q_tot)
    recomputed independently from the same bucket counts."""
    raw, target = _dfs(spark)
    B = 64
    lr = {r.bucket: r.logratio for r in
          corpus.dsir_bucket_logratio(raw, target, n_buckets=B).collect()}
    assert len(lr) == B

    def counts(df):
        rows = df.select(
            F.explode(
                corpus._hashed_gram_buckets(F.col("text"), B)
            ).alias("b")
        ).collect()
        out = {}
        for r in rows:
            out[r.b] = out.get(r.b, 0) + 1
        return out

    p, q = counts(target), counts(raw)
    p_tot = sum(p.values()) + B
    q_tot = sum(q.values()) + B
    for b in range(B):
        want = math.log((p.get(b, 0) + 1) / p_tot) - math.log(
            (q.get(b, 0) + 1) / q_tot
        )
        assert lr[b] == pytest.approx(want, rel=1e-9)


def test_scores_separate_target_like_docs(spark):
    raw, target = _dfs(spark)
    lr = corpus.dsir_bucket_logratio(raw, target, n_buckets=256)
    scored = corpus.dsir_scores(raw, lr, n_buckets=256)
    w = {r.doc_id: r.log_importance for r in scored.collect()}
    # both target-like docs outscore both off-target docs
    assert min(w[0], w[1]) > max(w[2], w[3])


def test_resample_prefers_high_importance_and_is_deterministic(spark):
    raw, target = _dfs(spark)
    lr = corpus.dsir_bucket_logratio(raw, target, n_buckets=256)
    scored = corpus.dsir_scores(raw, lr, n_buckets=256).persist()
    picks = {
        s: {r.doc_id for r in corpus.dsir_resample(scored, 2, seed=s).collect()}
        for s in range(5)
    }
    # deterministic per seed, across repartitionings
    again = {
        r.doc_id
        for r in corpus.dsir_resample(scored.repartition(7), 2, seed=0).collect()
    }
    assert again == picks[0]
    # the target-like docs dominate the draws (weights differ by many
    # nats, so Gumbel noise flips only with vanishing probability)
    from collections import Counter

    c = Counter(d for s in picks.values() for d in s)
    assert c[0] + c[1] > c[2] + c[3]
    scored.unpersist()


def test_resample_overwhelming_weight_always_selected(spark):
    rows = [(i, float(0)) for i in range(20)] + [(99, 50.0)]
    df = spark.createDataFrame(rows, "doc_id long, log_importance double")
    for s in range(5):
        got = {r.doc_id for r in corpus.dsir_resample(df, 3, seed=s).collect()}
        assert 99 in got


def test_null_and_empty_text_score_neutral(spark):
    raw, target = _dfs(spark)
    aug = raw.unionByName(
        raw.sparkSession.createDataFrame(
            [(50, None), (51, "")], "doc_id long, text string"
        )
    )
    lr = corpus.dsir_bucket_logratio(aug, target, n_buckets=64)
    w = {r.doc_id: r.log_importance for r in
         corpus.dsir_scores(aug, lr, n_buckets=64).collect()}
    assert w[50] == 0.0 and w[51] == 0.0


def test_cached_logratio_builds_once_then_loads(spark, tmp_path, monkeypatch):
    """VERDICT r6 #3: the logratio table persists via
    functions/artifacts — a second 'process' (fresh call, no in-memory
    state) loads the persisted B-row table instead of re-paying the
    two corpus-wide count aggregations. Builder-call counter: one
    dsir_bucket_logratio call total across both invocations, and the
    loaded table is row-identical to the built one."""
    monkeypatch.setenv("ETL_ZERO_ARTIFACTS", str(tmp_path))
    raw, target = _dfs(spark)
    calls = []
    real = corpus.dsir_bucket_logratio

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(corpus, "dsir_bucket_logratio", counting)
    key = {"corpus": "fixture", "target": "planted"}
    first = corpus.cached_dsir_logratio(raw, target, key, n_buckets=64)
    rows1 = sorted(map(tuple, first.collect()))
    assert calls == [1] and len(rows1) == 64
    second = corpus.cached_dsir_logratio(raw, target, key, n_buckets=64)
    assert calls == [1]  # loaded, not rebuilt
    assert sorted(map(tuple, second.collect())) == rows1
    # changed geometry is a different artifact -> rebuild
    corpus.cached_dsir_logratio(raw, target, key, n_buckets=32)
    assert calls == [1, 1]
