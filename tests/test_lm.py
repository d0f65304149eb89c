"""N-gram LM perplexity scoring (operators/lm.py — the CCNet quality
signal): distributed training vs a pure-Python trainer/scorer oracle,
planted natural-vs-gibberish separation, UNK pooling under a tight
vocab cap, and the per-language head/middle/tail bucketing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import lm

_REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat chased the dog",
    "a dog chased a cat around the mat",
    "the mat was on the floor",
]


def _py_train(texts, max_vocab=10_000, max_bigrams=10_000, alpha=0.4):
    """Independent oracle: same pruning and backoff rules, written
    sequentially."""
    from collections import Counter

    uni = Counter()
    docs = []
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        docs.append(ws)
        uni.update(ws)
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vocab = {w for w, _ in top}
    unigrams = dict(top)
    unigrams[lm.UNK] = max(sum(uni.values()) - sum(unigrams.values()), 1)
    bi = Counter()
    for ws in docs:
        prev = lm.BOS
        for w in ws:
            bi[(prev, w)] += 1
            prev = w
    pruned = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:max_bigrams]
    bigrams = {}
    for (w1, w2), c in pruned:
        k = (
            w1 if (w1 in vocab or w1 == lm.BOS) else lm.UNK,
            w2 if w2 in vocab else lm.UNK,
        )
        bigrams[k] = bigrams.get(k, 0) + c
    unigrams[lm.BOS] = sum(c for (w1, _), c in bigrams.items() if w1 == lm.BOS) or 1
    total = sum(c for w, c in unigrams.items() if w != lm.BOS)
    return lm.NGramLM(unigrams, bigrams, total, alpha)


def _py_ppl(model, text):
    words = [w for w in text.lower().split() if w]
    prev, s = lm.BOS, 0.0
    for w in words:
        s += model.logprob(prev, w)
        prev = w if w in model.unigrams else lm.UNK
    return math.exp(-s / len(words))


def _ref_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(_REF)], ["doc_id", "text"])


def test_train_matches_python_oracle(spark):
    got = lm.train_ngram_lm(_ref_df(spark))
    want = _py_train(_REF)
    assert got.unigrams == want.unigrams
    assert got.bigrams == want.bigrams
    assert got.total == want.total


def test_score_matches_python_oracle(spark):
    model = lm.train_ngram_lm(_ref_df(spark))
    probes = [
        "the cat sat on the rug",
        "rug dog the a floor",
        "completely novel words here",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(probes)], ["i", "text"])
    got = {r.i: r.perplexity for r in lm.score_perplexity(df, model).collect()}
    for i, t in enumerate(probes):
        assert got[i] == pytest.approx(_py_ppl(model, t), rel=1e-9)
    # empty text scores NULL
    e = spark.createDataFrame([(0, ""), (1, None)], "i long, text string")
    assert all(
        r.perplexity is None for r in lm.score_perplexity(e, model).collect()
    )


def test_natural_text_beats_gibberish(spark):
    """The operating property CCNet relies on: in-distribution text
    scores lower perplexity than shuffled-vocab gibberish."""
    model = lm.train_ngram_lm(_ref_df(spark))
    natural = "the cat sat on the mat"
    gibberish = "mat the on sat floor chased rug around cat a"
    df = spark.createDataFrame(
        [(0, natural), (1, gibberish)], ["i", "text"]
    )
    got = {r.i: r.perplexity for r in lm.score_perplexity(df, model).collect()}
    assert got[0] < got[1]


def test_vocab_cap_pools_unk(spark):
    model = lm.train_ngram_lm(_ref_df(spark), max_vocab=3)
    assert len([w for w in model.unigrams if w not in (lm.UNK, lm.BOS)]) == 3
    assert model.unigrams[lm.UNK] > 1  # real pooled mass
    # scoring never crashes on full-OOV text and stays finite
    df = spark.createDataFrame([(0, "zz qq ww")], ["i", "text"])
    ppl = lm.score_perplexity(df, model).collect()[0].perplexity
    assert ppl is not None and math.isfinite(ppl)


def test_ccnet_buckets_per_language(spark):
    """Terciles per language: planted gibberish lands in the tail of
    its language; bucket sizes are roughly equal per language."""
    model = lm.train_ngram_lm(_ref_df(spark))
    rows = []
    for i in range(30):
        rows.append((i, _REF[i % len(_REF)], "en"))
    rows.append((100, "floor rug around chased zz qq glorp blat", "en"))
    for i in range(200, 215):
        rows.append((i, _REF[i % len(_REF)] + " extra", "de"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = lm.ccnet_buckets(lm.score_perplexity(df, model)).collect()
    by_id = {r.doc_id: r.ppl_bucket for r in out}
    assert by_id[100] == "tail"
    en = [r for r in out if r.lang == "en"]
    n_head = sum(1 for r in en if r.ppl_bucket == "head")
    assert 0 < n_head < len(en)
    assert {r.ppl_bucket for r in out} <= {"head", "middle", "tail"}


def test_cached_lm_trains_once_then_loads(spark, tmp_path, monkeypatch):
    """The IVF/BPE amortization pattern for the LM: one training pass
    per corpus identity; a fresh process (fresh artifact read) loads
    the identical model without retraining."""
    monkeypatch.setenv("ETL_ZERO_ARTIFACTS", str(tmp_path))
    calls = []
    real = lm.train_ngram_lm

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(lm, "train_ngram_lm", counting)
    key = {"corpus": "fixture", "v": 1}
    a = lm.cached_ngram_lm(_ref_df(spark), key)
    b = lm.cached_ngram_lm(_ref_df(spark), key)
    assert calls == [1]
    assert (a.unigrams, a.bigrams, a.total) == (b.unigrams, b.bigrams, b.total)
    # scoring through the round-tripped model matches the direct one
    direct = real(_ref_df(spark))
    probe = "the cat sat on the rug"
    assert _py_ppl(b, probe) == pytest.approx(_py_ppl(direct, probe), rel=1e-12)
    # changed corpus identity retrains
    lm.cached_ngram_lm(_ref_df(spark), {"corpus": "fixture", "v": 2})
    assert calls == [1, 1]


def test_ccnet_buckets_null_language(spark):
    """Code-review r6: NULL-language docs must tercile among
    THEMSELVES (a plain equi-join never matches NULL and silently
    'tail'ed every unknown-language doc regardless of perplexity)."""
    model = lm.train_ngram_lm(_ref_df(spark))
    rows = [(i, _REF[i % len(_REF)], None) for i in range(12)]
    rows.append((100, "glorp zz blat qq vonk wibble snee", None))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = lm.ccnet_buckets(lm.score_perplexity(df, model)).collect()
    by_id = {r.doc_id: r.ppl_bucket for r in out}
    assert by_id[100] == "tail"
    assert sum(1 for r in out if r.ppl_bucket == "head") > 0
    assert all(r.lang is None for r in out)  # lang column untouched


def test_score_tokenization_matches_training_on_unicode_whitespace(spark):
    """Code-review r6: score-side tokenization must mirror
    tokens_expr's Java \\s+ (ASCII-only) — Python str.split() would
    split a no-break space that training kept inside one token."""
    text = "foo bar baz"
    ref = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    model = lm.train_ngram_lm(ref)
    assert "foo bar" in model.unigrams  # trained as ONE token
    scored = lm.score_perplexity(
        spark.createDataFrame([(1, text)], ["i", "text"]), model
    ).collect()[0].perplexity
    # in-distribution text must score as seen at train time: both
    # bigrams known -> perplexity well under the backoff regime
    import math as _m

    want = _m.exp(
        -(model.logprob(lm.BOS, "foo bar") + model.logprob("foo bar", "baz"))
        / 2
    )
    assert scored == pytest.approx(want, rel=1e-9)


def test_scored_model_stays_picklable_and_cache_reused(spark):
    """R8 review: the broadcast cache must not mutate the model —
    pickling a model AFTER scoring has to work, and repeated scoring
    on one context reuses a single broadcast."""
    import pickle

    from etl_zero_spark.operators import lm as lmod

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a a a b")], "doc_id long, text string"
    )
    model = lmod.train_ngram_lm(docs)
    lmod.score_perplexity(docs, model).collect()
    blob = pickle.dumps(model)  # raised before the module-level cache
    assert pickle.loads(blob).alpha == model.alpha
    key = id(model)
    assert key in lmod._BC_CACHE
    bc1 = lmod._BC_CACHE[key][2]
    lmod.score_perplexity(docs, model).collect()
    assert lmod._BC_CACHE[key][2] is bc1  # one broadcast, reused
