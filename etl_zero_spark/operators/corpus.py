"""Corpus-preparation operators for LLM training-data pipelines
(SURVEY §2.11 extension tier): decontamination, sequence packing,
deterministic stratified sampling.

These cover the pipeline steps between "deduped documents" (dedup.py)
and "training batches": checking the training corpus against an
evaluation set, packing variable-length documents into fixed token
budgets, and drawing reproducible mixture samples. No declared-query
slots remain (the driver records 50), so each op carries a strong
pytest self-oracle instead (tests/test_corpus.py) — planted
contamination, exact budget accounting, binomial-bound sampling.

Scale notes are inline per op; none collects to the driver, none
cross-joins, and the one inverted-index join reuses the stop-token
bounding strategy proven in dedup.ngram_jaccard_pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tokenization shared with operators/text.py: lowercased \s+ split,
#: empties dropped (the reference's split regime).
def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def _token_count(col: Column) -> Column:
    """Whitespace-token count with null text counting 0 — size(null)
    is NULL under ANSI and -1 under legacy semantics, and either
    poisons budget arithmetic. Shared by every token-budget op here."""
    return F.greatest(
        F.coalesce(F.size(_tokens(col)).cast("long"), F.lit(0)), F.lit(0)
    )


def _ngram_hashes(col: Column, n: int) -> Column:
    """Distinct xxhash64 values of word n-grams (whole-text fallback
    for docs shorter than n tokens, mirroring the shingle fallback in
    dedup.py). Hashing keeps the exploded index narrow: 8 bytes per
    gram instead of the gram text."""
    toks = _tokens(col)
    # null text -> NO grams (size(null) = -1 would otherwise fall into
    # the short-doc branch and hash null to a CONSTANT, pairing every
    # null doc with every other null doc)
    grams = (
        F.when(col.isNull(), F.array().cast("array<bigint>"))
        .when(F.size(toks) < n, F.array(F.xxhash64(F.array_join(toks, " "))))
        .otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(toks, i + 1, n), " ")
                    ),
                )
            )
        )
    )
    return grams


def cross_corpus_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = 10_000,
    prefilter_test_grams: bool | None = None,
) -> DataFrame:
    """Train/test contamination pairs: every (test, train) document
    pair sharing >= ``min_shared`` distinct word ``n``-grams — the
    decontamination check run before any evaluation is trusted (the
    GPT-3 appendix's 13-gram overlap scan is exactly this shape with
    n=13).

    Spark shape: both corpora explode to (gram_hash, id) inverted
    indexes and meet in ONE shuffled equi-join on the 8-byte hash,
    then count distinct shared grams per pair — never a document
    cross-join. ``max_gram_df``: grams whose TRAIN document frequency
    exceeds the cap are dropped from the index (the stop-token bound
    from dedup.ngram_jaccard_pairs): a boilerplate gram appearing in k
    train docs emits k rows per test doc carrying it, so the cap
    bounds worst-case join fan-out at |test_grams| * cap instead of
    quadratic; with n >= 8 a gram that common is template noise, not
    contamination signal. Pass None to disable (exact at any cost).

    ``prefilter_test_grams`` (R15, guide §3.2): the join keeps only
    train gram rows whose hash also occurs in the eval set, and the
    eval set is tiny by construction (benchmarks, not a corpus) — so a
    broadcast semi-join of the train index against the eval set's
    DISTINCT gram hashes drops almost every train row BEFORE the
    exchange, cutting the shuffle from O(train grams) to O(matching
    grams). Exact by construction: per-gram train document frequencies
    are per-gram aggregates, so dropping non-eval grams changes
    neither the hot-gram set (for retained grams) nor any surviving
    pair. Default ``None`` gates on Catalyst's size estimate for
    ``test`` (<= 64 MiB — the broadcast is 8 bytes per distinct eval
    gram); True/False override.

    Output: (test_id, train_id, shared_ngrams bigint), one row per
    contaminated pair.
    """
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram"),
    )
    if prefilter_test_grams is None:
        est = _plan_size_estimate(test)
        prefilter_test_grams = (
            est is not None and est <= _LEAKAGE_BROADCAST_MAX_BYTES
        )
    if prefilter_test_grams:
        te_grams = test.select(
            F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram")
        ).dropDuplicates()
        tr = tr.join(F.broadcast(te_grams), "gram", "left_semi")
    if max_gram_df is not None:
        hot = (
            tr.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_gram_df)
            .select("gram")
        )
        tr = tr.join(F.broadcast(hot), "gram", "left_anti")
    te = test.select(
        F.col(id_col).alias("test_id"),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram"),
    )
    return (
        te.join(tr, "gram")
        .groupBy("test_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .where(F.col("shared_ngrams") >= min_shared)
    )


def cross_corpus_contamination_tiered(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    capped_gram_df: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_test_grams: bool | None = None,
) -> DataFrame:
    """Exact AND hot-gram-capped contamination counts in ONE inverted-
    index join — the fused audit path (R14 optimization round).

    :func:`cross_corpus_contamination` called once per tier explodes
    both corpora and runs the gram join once PER TIER; an audit that
    wants both tiers (ct1) pays the n-gram explode of each corpus
    twice and the join twice. Since the exact tier already joins on
    EVERY gram (hot included), the capped count is recoverable from
    the same joined rows by flagging each train-gram row hot/cold and
    counting conditionally — one explode per corpus, one join, one
    pair aggregation, tier-identical results by construction:
    ``shared_ngrams`` counts all shared distinct grams (== the exact
    tier), ``shared_ngrams_capped`` counts only grams whose TRAIN
    document frequency is <= ``capped_gram_df`` (== the capped tier; a
    pair row with ``shared_ngrams_capped = 0`` does not appear in the
    capped tier's output).

    This path inherits the EXACT tier's unbounded worst case (that is
    what the audit demands); production capped-only callers should
    keep using :func:`cross_corpus_contamination`, whose join never
    sees hot grams at all.

    Output: (test_id, train_id, shared_ngrams, shared_ngrams_capped).
    """
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram"),
    )
    if prefilter_test_grams is None:
        est = _plan_size_estimate(test)
        prefilter_test_grams = (
            est is not None and est <= _LEAKAGE_BROADCAST_MAX_BYTES
        )
    if prefilter_test_grams:
        # guide §3.2 semi-join prefilter (see cross_corpus_contamination):
        # exact because per-gram train df is a per-gram aggregate —
        # dropping never-matching grams changes no retained gram's
        # __hot flag and no output pair.
        te_grams = test.select(
            F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram")
        ).dropDuplicates()
        tr = tr.join(F.broadcast(te_grams), "gram", "left_semi")
    hot = (
        tr.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > capped_gram_df)
        .select("gram", F.lit(True).alias("__hot"))
    )
    tr_flagged = tr.join(F.broadcast(hot), "gram", "left")
    te = test.select(
        F.col(id_col).alias("test_id"),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram"),
    )
    return (
        te.join(tr_flagged, "gram")
        .groupBy("test_id", "train_id")
        .agg(
            F.count(F.lit(1)).alias("shared_ngrams"),
            F.count(F.when(F.col("__hot").isNull(), F.lit(1))).alias(
                "shared_ngrams_capped"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = 10_000,
) -> DataFrame:
    """Training corpus minus every document contaminated against the
    evaluation set: one anti-join off the pair table. ``max_gram_df``
    passes through to the contamination scan — callers needing the
    EXACT rule at any cost (pipe1's oracle replay) pass None."""
    pairs = cross_corpus_contamination(
        train, test, n=n, min_shared=min_shared, id_col=id_col,
        text_col=text_col, max_gram_df=max_gram_df,
    ).select(F.col("train_id").alias(id_col)).distinct()
    return train.join(pairs, id_col, "left_anti")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    n_streams: int = 256,
) -> DataFrame:
    """Assign each document to a training pack of ~``budget`` tokens.

    Pretraining batch assembly: documents are concatenated into
    fixed-size sequences; the assignment (doc -> pack) is what the
    engine must produce. Exact bin packing is NP-hard and inherently
    sequential — the distributed formulation is contiguous fill over
    ``n_streams`` independent streams: each doc hashes to a stream
    (pure function of its id — deterministic under any partitioning),
    and within a stream a running token cumsum (window, ordered by id)
    assigns ``pack_id = floor((cumsum - tokens) / budget)``. A pack
    never exceeds ``budget`` by more than one document's overhang —
    the same guarantee the standard concat-then-chunk loader gives.
    When every document fits the budget, stream-local pack ids are
    dense and only each stream's last pack is underfull; a document
    LARGER than the whole budget occupies its own pack and may skip an
    index (pack_id stays monotonic — property-tested).

    Scale: ONE hash shuffle on stream id + one window per stream; a
    stream's window is |docs| / n_streams rows, so parallelism is
    n_streams regardless of corpus size (size n_streams to the
    cluster, default 256). No global window, no driver state.

    ``token_count_col``: existing per-doc token counts, else the
    whitespace token count is computed from ``text_col``.

    Output: original columns + (n_tokens, stream, pack_id,
    pack_key) — pack_key = stream * 2^32 + pack_id is the globally
    unique pack handle downstream writers group by.
    """
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    from pyspark.sql import Window

    # null text or null count packs as 0 tokens: the doc still gets a
    # pack assignment, it just takes no budget (_token_count's guard)
    n_tok = (
        F.greatest(F.coalesce(F.col(token_count_col).cast("long"), F.lit(0)), F.lit(0))
        if token_count_col
        else _token_count(F.col(text_col))
    )
    d = docs.withColumn("n_tokens", n_tok).withColumn(
        "stream", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_streams)).cast("int")
    )
    w = Window.partitionBy("stream").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = d.withColumn("__cum", F.sum("n_tokens").over(w))
    pack = F.floor((F.col("__cum") - F.col("n_tokens")) / budget).cast("long")
    return (
        d.withColumn("pack_id", pack)
        .withColumn(
            "pack_key",
            (F.col("stream").cast("long") * F.lit(2**32) + F.col("pack_id")),
        )
        .drop("__cum")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | float,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling that is a PURE FUNCTION of the data: a row
    is kept iff ``xxhash64(id, seed)`` falls under its stratum's
    fraction of the hash space. Unlike ``df.sampleBy`` (rand() per
    task — the sample changes with partitioning and retries), this is
    reproducible across runs, clusters, AND incremental loads: a row's
    keep/drop never changes when other rows arrive, which is what a
    training-data mixture needs for resumable pipelines.

    ``fractions``: one float for every stratum, or {stratum: frac}
    (missing strata default to 0.0 — an explicit mixture spec).
    """
    h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    if isinstance(fractions, dict):
        for k, v in fractions.items():
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"stratified_sample: fraction {k}={v} not in [0,1]")
        thresh = F.coalesce(
            *[
                F.when(F.col(strata_col) == k, F.lit(int(v * 1_000_000)))
                for k, v in fractions.items()
            ],
            F.lit(0),
        )
    else:
        if not 0.0 <= fractions <= 1.0:
            raise ValueError(f"stratified_sample: fraction {fractions} not in [0,1]")
        thresh = F.lit(int(fractions * 1_000_000))
    return df.where(h < thresh)


def stratified_take(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int | dict[str, int],
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exact-count companion to ``stratified_sample``: keep EXACTLY
    ``n_per_stratum`` rows per stratum (fewer when the stratum is
    smaller), chosen as the stratum's lowest ``xxhash64(id, seed)``
    values — deterministic under any partitioning, and NESTED across
    sizes: the n=100 take is a superset of the n=50 take with the same
    seed (hash order is fixed), which is what curriculum/ablation
    sampling needs. One window per stratum (partitioned — no global
    ordering task). ``n_per_stratum`` as a dict is an explicit per-
    stratum quota; missing strata get 0."""
    from pyspark.sql import Window

    if isinstance(n_per_stratum, dict):
        if any(v < 0 for v in n_per_stratum.values()):
            raise ValueError("stratified_take: negative quota")
        quota = F.coalesce(
            *[
                F.when(F.col(strata_col) == k, F.lit(v))
                for k, v in n_per_stratum.items()
            ],
            F.lit(0),
        )
    else:
        if n_per_stratum < 0:
            raise ValueError("stratified_take: negative quota")
        quota = F.lit(n_per_stratum)
    w = Window.partitionBy(strata_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), id_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def shuffle_corpus(
    df: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global pseudo-random ordering of a corpus — the
    training-order shuffle.

    ``orderBy(rand())`` gives a DIFFERENT order every run (and every
    retry of a lost task); this keys the order on
    ``xxhash64(id, seed)``, a pure function of the row, so the order
    is reproducible across runs, clusters, partitionings and task
    retries, and changing ``seed`` gives an independent permutation —
    the property an ablation ("same data, different order") needs.

    Layout: one range shuffle on the hash key + in-partition sort, so
    reading the output files in partition order replays the
    permutation; no global single-partition sort ever happens.
    Collisions tie-break on the id, keeping the total order strict.
    """
    n = n_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    return (
        df.withColumn("__shuffle_key", key)
        .repartitionByRange(n, F.col("__shuffle_key"), F.col(id_col))
        .sortWithinPartitions("__shuffle_key", id_col)
        .drop("__shuffle_key")
    )


def blocklist_filter(
    df: DataFrame,
    col: str,
    blocked: list[str] | DataFrame,
    invert: bool = False,
) -> DataFrame:
    """Drop rows whose ``col`` value is on a blocklist (C4-style source
    filtering: bad domains, opted-out sources, license classes).

    A literal list compiles to a broadcast ``isin`` (pure filter,
    pushes to the scan); a DataFrame blocklist becomes a broadcast
    LEFT ANTI join — either way the big side never shuffles.
    ``invert=True`` turns the blocklist into an allowlist.
    """
    if isinstance(blocked, DataFrame):
        bl = F.broadcast(blocked.select(F.col(blocked.columns[0]).alias(col)).distinct())
        how = "left_semi" if invert else "left_anti"
        return df.join(bl, col, how)
    cond = F.col(col).isin(blocked)
    return df.where(cond if invert else ~F.coalesce(cond, F.lit(False)))


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling
# ---------------------------------------------------------------------------


def _hashed_gram_buckets(col: Column, n_buckets: int, ns=(1, 2)) -> Column:
    """NON-distinct hashed word n-gram buckets (DSIR counts feature
    OCCURRENCES, so repeats matter — unlike the contamination index's
    distinct grams). Unigrams + bigrams by default, each bucketed by
    pmod(xxhash64(gram), B)."""
    toks = _tokens(col)
    parts = []
    for n in ns:
        if n == 1:
            grams = toks
        else:
            grams = F.when(
                F.size(toks) < n, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                )
            )
        parts.append(grams)
    grams = F.concat(*parts) if len(parts) > 1 else parts[0]
    grams = F.when(col.isNull(), F.array().cast("array<string>")).otherwise(grams)
    return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)))


def dsir_bucket_logratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns=(1, 2),
) -> DataFrame:
    """The DSIR importance model (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-n-gram bucket
    distributions p (target) and q (raw), add-1 smoothed, as a
    ``(bucket, logratio)`` table of exactly ``n_buckets`` rows —
    broadcast-sized BY CONSTRUCTION regardless of corpus size (the
    whole point of the hashing trick). Two count aggregations, one
    outer join over B rows."""

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    _hashed_gram_buckets(F.col(text_col), n_buckets, ns)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    import math

    p, q = counts(target, "p_n"), counts(raw, "q_n")
    spark = raw.sparkSession
    all_b = spark.range(n_buckets).select(F.col("id").cast("bigint").alias("bucket"))
    rows = (
        all_b.join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("p_n", F.lit(0)).alias("p_n"),
            F.coalesce("q_n", F.lit(0)).alias("q_n"),
        )
        .collect()
    )
    # The table is B rows BY CONSTRUCTION (broadcast-sized — that is
    # the hashing trick's point), so materialize it once: the two
    # corpus-wide count aggregations run exactly one time, the add-1
    # smoothed log-ratios compute on the driver, and the returned
    # local relation broadcasts into dsir_scores with no lineage back
    # to the corpora (a lazy return was recomputing both corpus scans
    # per consumer).
    p_tot = float(sum(r.p_n for r in rows) + n_buckets)
    q_tot = float(sum(r.q_n for r in rows) + n_buckets)
    return spark.createDataFrame(
        [
            (r.bucket, math.log((r.p_n + 1) / p_tot) - math.log((r.q_n + 1) / q_tot))
            for r in rows
        ],
        "bucket bigint, logratio double",
    )


def cached_dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    corpus_key: dict,
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns=(1, 2),
) -> DataFrame:
    """Load-or-build the DSIR logratio table through
    ``functions/artifacts`` — the IVF/BPE/ngram-LM amortization pattern
    (VERDICT r6 "What's wrong #1"): the two corpus-wide count
    aggregations behind ``dsir_bucket_logratio`` are once-per-
    (raw, target, geometry) work, and at 100 TB a per-process re-pay is
    two full corpus scans. ``corpus_key`` is the caller's identity for
    BOTH corpora (e.g. ``source_identity`` of the raw path + a
    descriptor of how the target was derived, or snapshot versions);
    geometry knobs join it in the artifact key. The table is exactly
    ``n_buckets`` rows by construction, so the persisted payload is a
    small JSON array and the load rebuilds the same broadcastable
    local relation."""
    from etl_zero_spark.functions.artifacts import cached_artifact

    params = {
        **corpus_key,
        "n_buckets": n_buckets,
        "ns": list(ns),
        "text_col": text_col,
    }
    payload = cached_artifact(
        "dsir_logratio",
        params,
        lambda: [
            [r.bucket, r.logratio]
            for r in dsir_bucket_logratio(
                raw, target, text_col, n_buckets, ns
            ).collect()
        ],
    )
    return raw.sparkSession.createDataFrame(
        [(int(b), float(lr)) for b, lr in payload],
        "bucket bigint, logratio double",
    )


def dsir_scores(
    raw: DataFrame,
    logratio: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns=(1, 2),
) -> DataFrame:
    """Per-document log importance weight log(p(x)/q(x)) = sum over the
    doc's hashed-n-gram occurrences of the bucket logratio. Shape:
    explode -> broadcast join (B rows) -> per-doc sum -> join back.
    Docs with no grams (null/empty text) weight 0 (= ratio 1, neutral).
    """
    per_doc = (
        raw.select(
            F.col(id_col),
            F.explode_outer(
                _hashed_gram_buckets(F.col(text_col), n_buckets, ns)
            ).alias("bucket"),
        )
        .join(F.broadcast(logratio), "bucket", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("logratio"), F.lit(0.0)).alias("log_importance"))
    )
    return raw.join(per_doc, id_col, "left")


def dsir_resample(
    scored: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
    weight_col: str = "log_importance",
) -> DataFrame:
    """Importance resampling without replacement via the Gumbel top-k
    trick: rank by ``log_w + Gumbel(0,1)`` where the Gumbel noise is
    derived from xxhash64(id, seed) — sampling probabilities are
    proportional to the importance weights, and the draw is
    DETERMINISTIC across runs/partitionings/retries (the same
    reproducibility contract as stratified_sample/shuffle_corpus,
    which rand()-based sampling cannot give). One
    TakeOrderedAndProject, no full sort."""
    u = (
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 53)) + 0.5)
        / F.lit(float(1 << 53))
    )
    gumbel = -F.log(-F.log(u))
    return (
        scored.withColumn("__key", F.col(weight_col) + gumbel)
        .orderBy(F.col("__key").desc())
        .limit(k)
        .drop("__key")
    )


# ---------------------------------------------------------------------------
# mixture allocation (domain reweighting)
# ---------------------------------------------------------------------------


@dataclass
class MixResult:
    """``mix_corpus`` output: the sampled corpus plus the per-source
    allocation ledger — {source: {"weight", "available", "target",
    "allocated"}} in the budget unit (docs or tokens). ``allocated``
    is the waterfilled quota actually applied; compare to ``target``
    (the pure-weight share) to see which sources ran dry."""

    df: DataFrame
    allocation: dict
    unit: str


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    *,
    total_docs: int | None = None,
    total_tokens: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    exact: bool = False,
) -> MixResult:
    """Compose a training mixture: sample the corpus so its
    composition across ``weights``' sources matches the given relative
    weights under a total budget of documents (``total_docs``) or
    whitespace tokens (``total_tokens``) — the Pile/Dolma-style
    mixture spec ("webtext 0.6, code 0.3, papers 0.1, 100B tokens").
    Sources absent from ``weights`` contribute nothing (an explicit
    mixture spec, like ``stratified_sample``).

    Allocation is waterfilled: each source's target is its weight
    share of the budget; a source with less data than its target is
    capped at availability and the shortfall redistributes across the
    remaining sources in weight proportion (iterated to fixpoint —
    at most one pass per source). No upsampling: repeating documents
    to fill a quota is an epoch/packing decision, not a sampling one;
    the ledger shows the shortfall instead.

    Selection within a source is ``xxhash64(id, seed)``-based and
    therefore deterministic across runs, partitionings, and retries,
    and NESTED across budgets (a bigger budget's sample is a superset
    of a smaller one's — hash order is fixed):

    * ``exact=False`` (default, the 100 TB path): keep rows whose hash
      falls under ``allocated/available`` of the hash space — ZERO
      shuffles, one filter; realized counts are binomial around the
      quota (±~sqrt(n)).
    * ``exact=True``: exactly the quota, chosen as the source's lowest
      hash values — one window per source partition (``row_number``
      for docs, a running token sum for tokens, cutting at the last
      document that still fits). A giant source funnels through its
      partition's sort; use it when budgets are small or exactness is
      contractual.

    One bounded ``groupBy(source)`` computes availability (rows
    collected = number of sources); nothing else reaches the driver.
    """
    if (total_docs is None) == (total_tokens is None):
        raise ValueError("mix_corpus: pass exactly one of total_docs / total_tokens")
    if (total_docs if total_docs is not None else total_tokens) <= 0:
        raise ValueError("mix_corpus: budget must be positive")
    if not weights:
        raise ValueError("mix_corpus: empty weights")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("mix_corpus: weights must be >=0 with a positive sum")
    unit = "docs" if total_docs is not None else "tokens"
    budget = float(total_docs if total_docs is not None else total_tokens)

    in_mix = df.where(F.col(source_col).isin(list(weights)))
    doc_tokens = _token_count(F.col(text_col))
    size = (
        F.count(F.lit(1))
        if unit == "docs"
        else F.coalesce(F.sum(doc_tokens), F.lit(0))
    )
    avail = {
        r["k"]: float(r["n"])
        for r in in_mix.groupBy(F.col(source_col).alias("k"))
        .agg(size.alias("n"))
        .collect()
    }
    for s in weights:
        avail.setdefault(s, 0.0)

    # waterfill: cap saturated sources, redistribute in weight
    # proportion among the rest; terminates in <= len(weights) passes
    alloc = {s: 0.0 for s in weights}
    active = {s for s in weights if weights[s] > 0}
    remaining = budget
    targets = {
        s: budget * weights[s] / sum(weights.values()) for s in weights
    }
    while remaining > 1e-9 and active:
        wsum = sum(weights[s] for s in active)
        share = {s: remaining * weights[s] / wsum for s in active}
        saturated = {
            s for s in active if alloc[s] + share[s] >= avail[s] - 1e-9
        }
        if not saturated:
            for s in active:
                alloc[s] += share[s]
            break
        for s in saturated:
            remaining -= avail[s] - alloc[s]
            alloc[s] = avail[s]
            active.discard(s)
    quotas = {s: int(round(a)) for s, a in alloc.items()}

    if exact:
        if unit == "docs":
            sampled = stratified_take(in_mix, source_col, quotas, id_col, seed)
        else:
            from pyspark.sql import Window

            w = Window.partitionBy(source_col).orderBy(
                F.xxhash64(F.col(id_col), F.lit(seed)), id_col
            )
            quota_col = F.coalesce(
                *[
                    F.when(F.col(source_col) == s, F.lit(q))
                    for s, q in quotas.items()
                ],
                F.lit(0),
            )
            # quota_col > 0 is load-bearing: a zero-token document's
            # running sum never exceeds a 0 quota, so without it a
            # zero-weight (or token-empty) source leaks its null/empty
            # docs into the sample while the ledger says 0 (review r7)
            sampled = (
                in_mix.withColumn("__cum", F.sum(doc_tokens).over(w))
                .where((quota_col > 0) & (F.col("__cum") <= quota_col))
                .drop("__cum")
            )
    else:
        fractions = {
            s: (quotas[s] / avail[s] if avail[s] > 0 else 0.0)
            for s in quotas
        }
        sampled = stratified_sample(in_mix, source_col, fractions, id_col, seed)

    ledger = {
        s: {
            "weight": weights[s],
            "available": int(avail[s]),
            "target": int(round(targets[s])),
            "allocated": quotas[s],
        }
        for s in weights
    }
    return MixResult(df=sampled, allocation=ledger, unit=unit)


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    size_expr=None,
) -> dict[str, float]:
    """Temperature-based mixture weights — the multilingual
    rebalancing rule (XLM-R / mT5: sample language l with probability
    ∝ p_l^alpha): per-source mass p_s from the data, raised to
    ``alpha`` and renormalized. ``alpha=1`` reproduces the natural
    distribution, ``alpha=0`` is uniform, the published 0.3 (XLM-R)
    / 0.7 (mBERT) settings sit between — boosting tail sources
    without letting the head dominate.

    One bounded ``groupBy(source)`` (rows collected = number of
    sources, the mix_corpus shape); ``size_expr`` overrides the mass
    measure (default row count — pass a token-count Column for
    token-mass temperatures). Feed the result straight into
    :func:`mix_corpus` as its ``weights``; null sources carry no
    weight (mix_corpus excludes them from an explicit spec anyway)."""
    if alpha < 0:
        raise ValueError("temperature_weights: alpha must be >= 0")
    size = (
        F.count(F.lit(1)) if size_expr is None
        else F.coalesce(F.sum(size_expr), F.lit(0))
    )
    rows = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("k"))
        .agg(size.alias("n"))
        .collect()
    )
    mass = {r["k"]: float(r["n"]) for r in rows if r["n"] and r["n"] > 0}
    if not mass:
        return {}
    total = sum(mass.values())
    raised = {s: (m / total) ** alpha for s, m in mass.items()}
    z = sum(raised.values())
    return {s: v / z for s, v in sorted(raised.items())}


# ---------------------------------------------------------------------------
# train/val/test splitting + leakage hardening (R9)
# ---------------------------------------------------------------------------


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by deterministic hash
    interval — the pretraining holdout carve ('train 0.98, val 0.01,
    test 0.01'). ``xxhash64(id, seed)`` maps each row to a point in
    [0, 1e6); consecutive fractions own consecutive intervals, so the
    assignment is a PURE FUNCTION of (id, seed): reproducible across
    runs, clusters, partitionings and task retries, and STABLE under
    corpus growth — a document's split never flips when other
    documents arrive (the property a resumable 100 TB ingest needs;
    ``randomSplit`` gives none of these). Different seeds give
    independent carves for ablations. Fractions must sum to 1 (the
    split is a partition, not a sample — compose
    :func:`stratified_sample` first to subsample); the last-named
    split absorbs integer-rounding remainder so every row lands
    somewhere. No shuffle: one codegen'd CASE projection.

    The hash is domain-separated from the sampling ops (an op tag is
    mixed in): stratified_sample keeps exactly the LOW hash interval,
    so reusing its hash point here would map a <=98% sample entirely
    onto the first split and leave the holdouts EMPTY (R9 review)."""
    if not fractions:
        raise ValueError("split_corpus: fractions must be non-empty")
    for name, frac in fractions.items():
        if not name:
            raise ValueError("split_corpus: empty split name")
        if not 0.0 < frac <= 1.0:
            raise ValueError(
                f"split_corpus: fraction {name}={frac} not in (0, 1]"
            )
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split_corpus: fractions sum to {total}, need exactly 1 "
            "(a split is a partition — subsample with stratified_sample "
            "first)"
        )
    h = F.pmod(
        F.xxhash64(F.lit("split_corpus"), F.col(id_col), F.lit(seed)),
        F.lit(1_000_000),
    )
    names = list(fractions)
    expr = F.lit(names[-1])  # last split absorbs rounding remainder
    assign, cum = None, 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(int(round(cum * 1_000_000)))
        assign = (
            F.when(cond, F.lit(name))
            if assign is None
            else assign.when(cond, F.lit(name))
        )
    out = expr if assign is None else assign.otherwise(expr)
    return df.withColumn(split_col, out)


#: leakage_pairs broadcasts the heldout band index only when the
#: heldout's PLANNED input size estimate is under this bound: the band
#: table is ~32 short rows per document (~2.5x the text bytes), so a
#: 64 MiB heldout stays far below Spark's 8 GB broadcast cap with
#: driver headroom to spare.
_LEAKAGE_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def _plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for a frame (no job). Without
    CBO stats filters pass their child's size through unchanged, so
    this OVERESTIMATES filtered frames — conservative in the direction
    the broadcast gate needs (an overestimate only skips a broadcast
    AQE can still apply at runtime; it never forces one)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimate probe must never fail the op
        return None


def leakage_pairs(
    train: DataFrame,
    heldout: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_index: bool | None = None,
    train_shingles_df: DataFrame | None = None,
    heldout_shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs CROSSING the train/heldout boundary — the
    eval-leakage scan decontamination's exact-n-gram tier misses
    (paraphrased or lightly-edited twins): index the heldout side
    (the small side by construction — holdouts are percents), probe
    it with train via the O(train x bands) incremental path, and keep
    only pairs with exactly one member in the heldout (train-vs-train
    pairs are dedup's business, not leakage — ``delta_vs_index_only``
    drops that block BEFORE candidate rescoring; without it the probe
    would pay a train-vs-train LSH self-join plus Jaccard rescore at
    ~whole-corpus scale just to discard the pairs, R10 advice). Ids
    must be disjoint across the two frames (a split partition
    guarantees it).

    ``broadcast_index`` (R15, ADVICE r14): broadcasting the heldout
    band index keeps the train-sized band table from ever shuffling
    (the R14 structural win), but 'percents of the corpus' at 100 TB
    is far beyond Spark's ~8 GB broadcast cap and would OOM the
    driver. Default ``None`` gates on Catalyst's size estimate for the
    heldout (<= 64 MiB broadcasts; unknown or larger shuffles and lets
    AQE pick broadcast at runtime when the actual bytes turn out
    small); pass True/False to override when the caller knows better.

    ``train_shingles_df`` / ``heldout_shingles_df`` (R15): precomputed
    ``(id, shingles)`` frames (MUST equal ``shingles_expr(text, 3)``
    over the respective side's rows — the MinHash-index geometry). The
    probe's plan references each side's shingle subtree several times
    (band index + both rescore arms); a caller that MATERIALIZES the
    frames first (harden_split does) makes those re-references read
    the materialized blocks instead of re-tokenizing the corpus."""
    from etl_zero_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    if broadcast_index is None:
        est = _plan_size_estimate(heldout)
        broadcast_index = est is not None and est <= _LEAKAGE_BROADCAST_MAX_BYTES
    idx = build_minhash_index(
        heldout, text_col=text_col, id_col=id_col,
        shingles_df=heldout_shingles_df,
    )
    d_idx = (
        build_minhash_index(
            train, text_col=text_col, id_col=id_col,
            shingles_df=train_shingles_df,
        )
        if train_shingles_df is not None
        else None
    )
    pairs = incremental_minhash_pairs(
        train, idx, threshold=threshold, text_col=text_col, id_col=id_col,
        delta_vs_index_only=True,
        broadcast_index=broadcast_index,
        delta_index=d_idx,
    )
    hid = heldout.select(F.col(id_col)).dropDuplicates()
    flagged = pairs.join(
        hid.select(F.col(id_col).alias("a_id"), F.lit(True).alias("__ah")),
        "a_id",
        "left",
    ).join(
        hid.select(F.col(id_col).alias("b_id"), F.lit(True).alias("__bh")),
        "b_id",
        "left",
    )
    return flagged.where(
        F.coalesce(F.col("__ah"), F.lit(False))
        != F.coalesce(F.col("__bh"), F.lit(False))
    ).drop("__ah", "__bh")


def harden_split(
    df: DataFrame,
    heldout_splits: tuple[str, ...] = ("val", "test"),
    threshold: float = 0.5,
    split_col: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Drop every train document that is a near-duplicate of a
    heldout document — the leakage guard a split must pass before any
    eval number is trusted (a val twin left in train scores the
    memorization, not the model). The heldout rows are NEVER touched
    (evals stay comparable across hardenings); the condemned train
    twin is dropped, mirroring decontaminate()'s direction. Returns
    ``(hardened_df, ledger)``. With ``collect_stats`` the leaked-id
    frame (ids only — tiny) is PERSISTED before its count so the
    corpus-scale MinHash join runs once, not once for the ledger and
    again on the consumer's first action (R9 review); the persisted
    handle stays cached for the consumer — skip stats at full scale
    and let zone writes count."""
    is_held = F.col(split_col).isin(*heldout_splits)
    train = df.where(~is_held)
    held = df.where(is_held)
    # NO shingle materialization here (R15 A/B, the sim4 lesson): the
    # probe's plan does reference each side's shingle subtree 2-3x
    # (band index + both rescore arms), but those references execute
    # as PARALLEL branches of one DAG — eagerly localCheckpointing the
    # shingle frames first serialized that work and measured SLOWER
    # (interleaved at sf0.1: plain 3.18s vs materialized 3.55s warm
    # min). Callers that already hold a materialized shingle frame can
    # still pass it through leakage_pairs' *_shingles_df params.
    pairs = leakage_pairs(
        train, held, threshold=threshold, text_col=text_col, id_col=id_col
    )
    hid = held.select(F.col(id_col)).dropDuplicates()
    # R15 (VERDICT r14 #7): select each pair's TRAIN member with one
    # CASE over ONE reference to the pair table. The previous
    # union-both-columns + anti-join-heldout shape referenced ``pairs``
    # twice, and with stats off (nothing persisted) Spark executed the
    # entire MinHash leakage probe once per union arm — the executed
    # x_split_harden plan showed the whole probe subtree duplicated.
    # Equivalent by leakage_pairs' postcondition: every pair has
    # exactly one heldout member, so "the member not in heldout" IS
    # "b_id if a_id is heldout else a_id".
    leaked = (
        pairs.join(
            hid.select(F.col(id_col).alias("a_id"), F.lit(True).alias("__ah")),
            "a_id",
            "left",
        )
        .select(
            F.when(F.col("__ah").isNotNull(), F.col("b_id"))
            .otherwise(F.col("a_id"))
            .alias(id_col)
        )
        .dropDuplicates()
    )
    out = df.join(
        leaked.withColumn("__leak", F.lit(True)), id_col, "left"
    ).where(
        is_held | F.col("__leak").isNull()
    ).drop("__leak")
    ledger: dict = {}
    if collect_stats:
        leaked = leaked.persist()
        leaked_n = leaked.count()
        ledger = {
            "train_before": train.count(),
            "leaked_dropped": leaked_n,
            "train_after": None,  # filled below without a third scan
        }
        ledger["train_after"] = ledger["train_before"] - leaked_n
    return out, ledger
