"""N-gram language-model perplexity scoring — the CCNet quality signal
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document's perplexity
under a language model trained on trusted text, then bucket the corpus
into head / middle / tail thirds per language. CCNet uses a KenLM
5-gram; no model ships in this environment, so the model here is a
pruned bigram LM with stupid backoff (Brants et al. 2007, "Large
Language Models in Machine Translation" — the web-scale smoothing
precisely because it needs no discount fitting) trained DISTRIBUTED
from any reference DataFrame. The reference repo has no quality
scoring at all; this is the standard signal a 100 TB corpus pipeline
gates on alongside the Gopher rules (operators/quality.py).

Scale shape:

* ``train_ngram_lm`` — two aggregation passes (unigram counts, then
  bigram counts over the vocab-mapped stream), both plain groupBy
  count with map-side combine. The MODEL is capped (``max_vocab``
  unigrams, ``max_bigrams`` bigram entries kept by count — standard
  count-pruning) so it is bounded regardless of corpus size, like a
  pruned KenLM binary. Honest sizing (ADVICE r6 #4): a bigram dict
  entry costs ~100 bytes in a Python dict, so the 250k-bigram / 64k-
  vocab defaults bound the model near ~30 MB in memory (~10 MB
  serialized) — broadcast-sized, but not "a few MB"; the previous 1M
  default reached the >100 MB regime. Raise ``max_bigrams`` only with
  executor/driver headroom to match.
* ``score_perplexity`` — one Arrow-vectorized UDF pass; the model
  ships via ``sc.broadcast`` (one torrent transfer per executor,
  reused across tasks), not closure capture (re-serialized per task
  dispatch). No shuffle.
* ``ccnet_buckets`` — per-language tercile cuts from ONE
  ``percentile_approx`` aggregation (mergeable sketch, no sort),
  broadcast-joined back; head = lowest-perplexity third, the CCNet
  partition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.dedup import tokens_expr

#: score_perplexity's per-(model, SparkContext) broadcast cache:
#: id(model) -> (weakref(model), sc, Broadcast). Module-level on
#: purpose (R8 review) — stashing the Broadcast on the model object
#: made the model unpicklable after its first scoring call.
_BC_CACHE: dict = {}

#: Out-of-vocabulary token. Every token outside the capped vocabulary
#: maps here in BOTH training and scoring, so the probability mass is
#: consistent (an OOV at score time is not a zero, it is the trained
#: <unk> rate — CCNet/KenLM do the same).
UNK = "<unk>"
#: Begin-of-document context for the first token's bigram.
BOS = "<s>"


@dataclass
class NGramLM:
    """Pruned bigram stupid-backoff model. ``unigrams`` maps token ->
    count (incl. UNK's pooled count), ``bigrams`` maps (w1, w2) ->
    count; ``total`` is the unigram mass. Score of w2 after w1:
    bigram/unigram[w1] when the bigram survived pruning, else
    ``alpha * unigram[w2]/total`` (stupid backoff — scores are not a
    normalized distribution, which is fine for RANKING documents, the
    only use CCNet makes of them)."""

    unigrams: dict
    bigrams: dict
    total: int
    alpha: float = 0.4

    def logprob(self, w1: str, w2: str) -> float:
        u2 = self.unigrams.get(w2)
        if u2 is None:
            w2, u2 = UNK, self.unigrams.get(UNK, 1)
        b = self.bigrams.get((w1, w2))
        if b is not None:
            u1 = self.unigrams.get(w1)
            if u1:
                return math.log(b / u1)
        return math.log(self.alpha * u2 / self.total)


def train_ngram_lm(
    reference: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65_536,
    max_bigrams: int = 250_000,
    alpha: float = 0.4,
) -> NGramLM:
    """Train the pruned bigram LM from a reference corpus. Tokens
    outside the top-``max_vocab`` by count pool into UNK; bigrams are
    computed over the UNK-mapped stream (with a BOS context per
    document) and pruned to the top ``max_bigrams`` by count. Both
    caps bound the DRIVER-side model, not the distributed work — the
    aggregations stream the full corpus either way."""
    toks = reference.select(tokens_expr(F.col(text_col)).alias("toks")).where(
        F.size("toks") > 0
    )
    # the aggregated unigram table is vocabulary-sized (not corpus-
    # sized) and feeds two consumers (top-k and total mass): persist it
    # so the corpus-wide tokenize+count pass runs once
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    top = uni.orderBy(F.col("c").desc(), F.col("w")).limit(max_vocab).collect()
    vocab = {r.w for r in top}
    unigrams = {r.w: r.c for r in top}
    # pooled OOV mass = total token mass minus the kept vocabulary's
    # (one scalar agg — no giant isin filter)
    all_mass = uni.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("c")).collect()[0].c
    uni.unpersist()
    unigrams[UNK] = max(int(all_mass) - sum(unigrams.values()), 1)

    # Raw bigram counts (BOS-prefixed zip of each token array with its
    # shift — entirely inside codegen), pruned to the top max_bigrams,
    # then UNK-collapsed on the DRIVER over the pruned survivors. The
    # collapse-after-prune order means a bigram whose raw forms are
    # individually below the cap but would aggregate above it via UNK
    # pooling is dropped — an acceptable pruning nuance that keeps the
    # distributed side free of any vocab-sized expression.
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.concat(F.array(F.lit(BOS)), F.col("toks")),
                    F.concat(F.col("toks"), F.array(F.lit(None))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .where(F.col("p.w2").isNotNull())
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w1"), F.col("w2"))
        .limit(max_bigrams)
        .collect()
    )
    bigrams: dict = {}
    for r in bi:
        k = (
            r.w1 if (r.w1 in vocab or r.w1 == BOS) else UNK,
            r.w2 if r.w2 in vocab else UNK,
        )
        bigrams[k] = bigrams.get(k, 0) + r.c
    # BOS participates in bigram contexts but carries no unigram mass
    # of its own: its context count is the (pruned) document count so
    # P(w|BOS) normalizes over the surviving entries
    unigrams[BOS] = sum(c for (w1, _), c in bigrams.items() if w1 == BOS) or 1
    total = sum(c for w, c in unigrams.items() if w != BOS)
    return NGramLM(unigrams, bigrams, total, alpha)


def score_perplexity(
    df: DataFrame,
    lm: NGramLM,
    text_col: str = "text",
    out_col: str = "perplexity",
) -> DataFrame:
    """Per-document perplexity exp(-mean log P(w_i | w_{i-1})) under
    ``lm`` — one vectorized UDF pass. The model ships as an
    ``sc.broadcast`` variable: the capped model is tens of MB at the
    default pruning caps, and a closure-captured copy would
    re-serialize into every task's dispatch payload, while a broadcast
    transfers once per executor and is shared by its tasks (ADVICE r6
    #4). The broadcast is cached in a module-level WeakKeyDictionary
    per (model, SparkContext) — ADVICE r7 #3: a long-lived process
    scoring many batches reuses one broadcast instead of accumulating
    ~10 MB blocks per call on the driver and executors; a restarted
    context re-broadcasts, and the weak keying means the cache never
    pins the model alive NOR mutates it (R8 review: stashing the
    Broadcast on the model object made it unpicklable afterwards).
    Empty documents score NULL (no tokens to judge)."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    import weakref

    sc = df.sparkSession.sparkContext
    # keyed by id() (dataclasses with eq are unhashable); the weakref
    # both guards against id reuse after GC and evicts the entry when
    # the model is collected
    cached = _BC_CACHE.get(id(lm))
    if cached is not None and cached[0]() is lm and cached[1] is sc:
        bc_model = cached[2]
    else:
        bc_model = sc.broadcast(lm)
        _BC_CACHE[id(lm)] = (
            weakref.ref(lm, lambda _r, k=id(lm): _BC_CACHE.pop(k, None)),
            sc,
            bc_model,
        )
    # EXACTLY tokens_expr's rule: Java-regex \s+ is ASCII whitespace
    # only, while Python str.split() splits all Unicode whitespace — a
    # divergence would tokenize 'foo\xa0bar' as one token at train
    # time and two at score time, inflating OOV/backoff hits.
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("double")
    def ppl(texts: pd.Series) -> pd.Series:
        model = bc_model.value
        out = []
        for t in texts:
            words = [w for w in ws.split((t or "").lower()) if w]
            if not words:
                out.append(None)
                continue
            prev, s = BOS, 0.0
            for w in words:
                s += model.logprob(prev, w)
                prev = w if w in model.unigrams else UNK
            out.append(float(math.exp(-s / len(words))))
        return pd.Series(out, dtype="float64")

    return df.withColumn(out_col, ppl(F.col(text_col)))


def ccnet_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "perplexity",
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail partition: per language, tercile cuts
    of the perplexity distribution (head = lowest third — the text the
    reference model finds most natural). Cuts come from one
    ``percentile_approx`` sketch aggregation and broadcast-join back;
    NULL perplexity (empty docs) buckets NULL. NULL language is a
    language of its own (sentinel key for the group/join — a plain
    equi-join never matches NULL and would silently 'tail' every
    unknown-language doc regardless of perplexity): those docs tercile
    among themselves, and the output ``lang_col`` stays NULL."""
    key = F.coalesce(F.col(lang_col), F.lit("\x00<null-lang>"))
    cuts = (
        scored.withColumn("__lk", key)
        .groupBy("__lk")
        .agg(F.percentile_approx(ppl_col, [1.0 / 3.0, 2.0 / 3.0]).alias("cuts"))
    )
    p = F.col(ppl_col)
    return (
        scored.withColumn("__lk", key)
        .join(F.broadcast(cuts), "__lk", "left")
        .withColumn(
            out_col,
            F.when(p.isNull(), F.lit(None).cast("string"))
            .when(p <= F.col("cuts")[0], "head")
            .when(p <= F.col("cuts")[1], "middle")
            .otherwise("tail"),
        )
        .drop("cuts", "__lk")
    )


def _lm_to_payload(model: NGramLM) -> dict:
    """JSON-serializable form: bigram keys joined with one space —
    unambiguous because tokens are whitespace-split (no token contains
    whitespace by construction)."""
    return {
        "unigrams": model.unigrams,
        "bigrams": {f"{w1} {w2}": c for (w1, w2), c in model.bigrams.items()},
        "total": model.total,
        "alpha": model.alpha,
    }


def _lm_from_payload(payload: dict) -> NGramLM:
    return NGramLM(
        dict(payload["unigrams"]),
        {tuple(k.split(" ", 1)): c for k, c in payload["bigrams"].items()},
        int(payload["total"]),
        float(payload["alpha"]),
    )


def cached_ngram_lm(
    reference: DataFrame,
    corpus_key: dict,
    text_col: str = "text",
    max_vocab: int = 65_536,
    max_bigrams: int = 250_000,
    alpha: float = 0.4,
) -> NGramLM:
    """Load-or-train through ``functions/artifacts`` — the IVF/PQ/BPE
    amortization pattern: the reference-corpus training pass is paid
    once per corpus identity, then every later process digest-verifies
    and loads. ``corpus_key`` is the caller's corpus identity (path +
    file size/mtime, or a snapshot table version) and joins the
    geometry knobs in the artifact key."""
    from etl_zero_spark.functions.artifacts import cached_artifact

    params = {
        **corpus_key,
        "max_vocab": max_vocab,
        "max_bigrams": max_bigrams,
        "alpha": alpha,
        "text_col": text_col,
    }
    payload = cached_artifact(
        "ngram_lm",
        params,
        lambda: _lm_to_payload(
            train_ngram_lm(reference, text_col, max_vocab, max_bigrams, alpha)
        ),
    )
    return _lm_from_payload(payload)
