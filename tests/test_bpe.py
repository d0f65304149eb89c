"""BPE tokenizer (operators/bpe.py): pure-Python trainer oracle on the
collected corpus + round-trip/determinism/count contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.bpe import (
    EOW,
    bpe_tokenize,
    encode_word,
    train_bpe,
    word_frequencies,
)


def _oracle_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent single-process BPE (dict-of-lists formulation)."""
    vocab: dict[tuple, int] = {}
    for t in texts:
        for w in t.lower().split():
            k = tuple(w) + (EOW,)
            vocab[k] = vocab.get(k, 0) + 1
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        out: dict = {}
        for sym, n in vocab.items():
            ns, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + n
        vocab = out
    return merges


def test_trainer_matches_python_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    texts = [r.text for r in docs.select("text").collect()]
    got = train_bpe(docs, n_merges=60)
    want = _oracle_train(texts, 60)
    assert got == want


def test_trainer_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = train_bpe(docs.repartition(17), n_merges=40)
    b = train_bpe(docs.coalesce(1), n_merges=40)
    assert a == b


def test_tokenize_roundtrip_and_counts(spark, sf_dir):
    """Concatenating a word's tokens (minus EOW) recovers the word;
    the count column equals the token array length."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, n_merges=80)
    out = bpe_tokenize(docs, merges).select("doc_id", "text", "bpe_tokens", "bpe_tokens_n")
    for r in out.collect():
        assert r.bpe_tokens_n == len(r.bpe_tokens)
        rebuilt = "".join(t for t in r.bpe_tokens).replace(EOW, " ").split()
        assert rebuilt == r.text.lower().split()


def test_tokenize_matches_encode_word(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    merges = train_bpe(docs, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    row = bpe_tokenize(docs, merges).select("text", "bpe_tokens").first()
    want = []
    for w in row.text.lower().split():
        want.extend(encode_word(w, ranks))
    assert row.bpe_tokens == want


def test_merges_compress(spark, sf_dir):
    """More merges -> fewer tokens (monotone compression on the corpus
    it trained on); zero merges = chars + EOW."""
    docs = load_table(spark, sf_dir, "documents").limit(80)
    n0 = bpe_tokenize(docs, []).agg(F.sum("bpe_tokens_n")).collect()[0][0]
    m = train_bpe(docs, n_merges=100)
    n100 = bpe_tokenize(docs, m).agg(F.sum("bpe_tokens_n")).collect()[0][0]
    assert n100 < n0
    chars = docs.select(
        F.sum(
            F.length(F.regexp_replace(F.lower(F.trim("text")), r"\s+", ""))
            + F.size(F.split(F.lower(F.trim("text")), r"\s+"))
        )
    ).collect()[0][0]
    assert n0 == chars  # chars + one EOW per word


def test_word_frequencies_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    top = word_frequencies(docs, max_words=10)
    assert len(top) == 10
    assert top == sorted(top, key=lambda t: (-t[1], t[0]))


def test_nulls_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "ab ab")], "id long, text string")
    merges = train_bpe(df, n_merges=5)
    out = {r.id: r.bpe_tokens_n for r in bpe_tokenize(df, merges).collect()}
    assert out[1] == 0 and out[2] == 0 and out[3] > 0
