"""Deduplication family (north-star extension, SURVEY §2.11).

The reference's only dedup is pandas ``drop_duplicates``
(ETL_Pipeline_Entire/transformations_code.py:78-79); its only
similarity machinery is driver-side difflib/Word2Vec over column
*names* (transformations_code.py:11-35, mapping.py:67-103). This module
is the data-scale generalization a training-data pipeline needs, built
so every stage is a DataFrame op that survives 100 TB:

* exact dedup        — hash-groupBy keep-min-id (one shuffle on a hash,
                       not on full rows)
* n-gram Jaccard     — exact shingle-overlap pairs (the verify oracle)
* MinHash + LSH      — shingle -> 64 seeded min-hashes -> banded
                       bucket-join -> exact-Jaccard rescore; the
                       approximate-then-rescore physical pattern of
                       SURVEY §4.3.3
* SimHash            — 64-bit token-weight fingerprint, banded
                       candidate join, Hamming verify
* embedding cosine   — near-dup pairs over ``array<float>`` vectors

Everything is native Column expressions (higher-order functions,
xxhash64) — no Python UDFs, no driver materialization. Candidate
generation is always a bucket equi-join (shuffle on bucket key), never
an all-pairs cross join; the O(n^2) work only happens *within* buckets,
which is the entire point of LSH at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared text -> token/shingle expressions
# ---------------------------------------------------------------------------


def tokens_expr(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda x: x != F.lit("")
    )


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles; documents shorter than k words collapse
    to their whole token string (so they still have one shingle).

    Implementation note (the 40x pitfall): building k-grams with
    ``transform(sequence(...), i -> element_at(toks, i+j))`` captures
    the *outer* token expression inside the lambda, and Spark's
    interpreted HOF evaluator re-computes the full regex tokenization
    for every element access — O(words^2) per document. Instead we take
    k shifted ``slice``s of the token array and ``zip_with`` them; every
    lambda references only its own arguments, so tokenization runs a
    constant number of times per row.
    """
    toks = tokens_expr(text)
    n = F.size(toks)
    length = F.greatest(n - F.lit(k - 1), F.lit(0))
    slices = [F.slice(toks, F.lit(i + 1), length) for i in range(k)]
    zipped = slices[0]
    for s in slices[1:]:
        zipped = F.zip_with(zipped, s, lambda a, b: F.concat(a, F.lit(" "), b))
    whole = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(n < F.lit(k), whole).otherwise(zipped))


def jaccard_expr(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / F.nullif(union, F.lit(0.0))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keeping the smallest-id ROW per text group — every
    column of the kept row survives (``source``/``lang``/metadata ride
    through a pipeline; silently narrowing to (id, text) broke the
    mixer handoff, review r7). Column order is preserved.

    Scale shape: groupBy on the text (Spark hashes it for the shuffle) —
    equivalent to hash-groupBy on md5(text) but without risking hash
    collisions silently merging distinct docs. One shuffle, map-side
    partial min / min_by, no join back. If ids are not unique, ties on
    the minimum id resolve arbitrarily per non-key column — give rows
    distinct ids if that matters.
    """
    others = [c for c in df.columns if c not in (text_col, id_col)]
    return (
        df.groupBy(text_col)
        .agg(
            F.min(id_col).alias(id_col),
            *[F.min_by(c, F.col(id_col)).alias(c) for c in others],
        )
        .select(*df.columns)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (also the rescore verifier for MinHash)
# ---------------------------------------------------------------------------


def compute_stop_shingles(
    df: DataFrame,
    k: int = 3,
    df_cap: int | None = 10_000,
    max_stop_broadcast: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[str] | None:
    """Resolve the stop-shingle set for ``df_cap`` with ONE corpus
    aggregation: the shingles whose document frequency exceeds the cap
    (see ``ngram_jaccard_pairs``). Returns ``[]`` when none exist (a
    corpus of <= df_cap documents provably has none — only a count is
    paid), the collected list when it fits ``max_stop_broadcast``, or
    ``None`` when it doesn't (callers then let the pairs op use its
    distributed stop path).

    This is the cacheable half of the dd2 plan: a recurring pipeline
    should pay corpus-wide discovery ONCE — persist the returned list
    (functions/artifacts.save_artifact travels well) keyed on
    (corpus version, k, df_cap) and feed it back through
    ``ngram_jaccard_pairs(stop_shingles=...)`` on every later run
    instead of re-probing per invocation (the r4 bench regression)."""
    if df_cap is None or df.count() <= df_cap:
        return []
    flat = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_expr(F.col(text_col), k)).alias("shingle"),
    )
    stop_df = (
        flat.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > F.lit(int(df_cap)))
        .select("shingle")
    )
    probe = stop_df.limit(max_stop_broadcast + 1).collect()
    return [r.shingle for r in probe] if len(probe) <= max_stop_broadcast else None


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool | None = None,
    df_cap: int | None = 10_000,
    max_stop_broadcast: int = 10_000,
    stop_shingles: list[str] | None = None,
    max_exact_docs: int | None = 2_000_000,
    b_id_filter=None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """All pairs with word-k-shingle Jaccard >= threshold, computed by
    exploding shingles and joining on the shingle (an inverted index —
    the shuffle key is the shingle, so only documents *sharing* a
    shingle ever meet; no cross join).

    ``prefix_filter`` adds the AllPairs/PPJoin prefix bound (Bayardo et
    al., "Scaling Up All Pairs Similarity Search"): order every
    document's shingles by a global total order (xxhash64) and index
    only the first ``|d| - ceil(t*|d|) + 1`` of them — any pair at
    Jaccard >= t must collide inside both prefixes, so the inverted
    index shrinks to a (1-t) fraction of the corpus; candidates then
    rescore exactly against the full arrays. The win grows with the
    threshold (t=0.9 indexes ~10% of shingles), so the default (None)
    auto-enables it at t >= 0.5 and keeps the single-pass counting join
    below, where the prefix would barely prune but the rescore join
    would re-shuffle the arrays.

    ``df_cap`` is the stop-shingle cap — the guard against the inverted
    index's quadratic hot head. A shingle appearing in m documents
    emits ~m^2/2 candidate rows at the join; boilerplate shingles
    ("all rights reserved") make m corpus-sized, which no amount of
    partitioning survives at 100 TB. Shingles whose document frequency
    exceeds the cap are excluded from the *index* (discovery) side —
    the standard AllPairs/stop-word trade — which bounds any single
    shingle's candidate output at df_cap^2/2 rows. Reported Jaccard
    stays EXACT (the counting path repairs the count with the shared
    stop shingles; the prefix path rescores full arrays); the recall
    contract is: a qualifying pair is missed only if EVERY shingle it
    shares occurs in more than ``df_cap`` documents, i.e. the pair's
    entire overlap is corpus-wide boilerplate. ``None`` disables the
    cap (pure single-pass plan, fully exact, unbounded worst case).

    The stop set is resolved with one build-time aggregation job and
    collected to the driver when it has at most ``max_stop_broadcast``
    entries — by construction it holds at most
    total_shingle_occurrences / df_cap shingles, and on clean corpora
    it is EMPTY, in which case the plan is byte-identical to the
    uncapped one (a collected set becomes a codegen'd InSet filter; no
    extra joins, no duplicated scans). Only when the corpus is so
    boilerplate-ridden that the stop set itself outgrows the driver
    does the plan fall back to distributed anti/inner joins against the
    stop-set DataFrame. This build-time corpus probe is the same
    data-dependent planning pattern as similarity.auto_geometry.

    ``stop_shingles`` short-circuits the probe with a PRECOMPUTED set
    (``compute_stop_shingles`` — cache it per corpus version): pass
    ``[]`` to assert the corpus has none (plan is then byte-identical
    to the uncapped one, zero probe jobs), or the actual list. The
    default ``None`` probes inline per call — correct but re-pays
    corpus-wide discovery every invocation.

    ``max_exact_docs`` (R6, VERDICT r5 #7) is the scale guardrail: the
    exact tier is the EXPENSIVE verify path — even with every cap
    active its candidate/rescore work grows super-linearly with the
    corpus (25s at a 100k-doc probe on local[32]) — so a corpus larger
    than this refuses with a pointer to ``minhash_lsh_pairs``, the
    banded tier built for that regime, mirroring how reshape.pivot
    refuses an unbounded pivot. ``None`` disables the guard (an
    explicit "I know, run it anyway"), and so does passing a
    precomputed ``stop_shingles`` set — that caller already ran
    corpus-scale discovery knowingly, and the guard must not re-add a
    per-call corpus count to the cached recurring-pipeline path. On
    the probe path the count is reused by the stop-shingle doc-count
    short-circuit (no extra job vs pre-guard behavior).

    ``b_id_filter`` (R14 optimization round): a ``Column -> Column``
    predicate over the id restricting the RIGHT side of the candidate
    join. Because every output pair satisfies a_id < b_id, this equals
    filtering the result on ``b_id`` afterward — but the b-side index
    shrinks BEFORE the join and is broadcast, so the corpus-sized
    a-side index is never shuffled at all (guide §3.1: broadcast the
    small side). The probe/delta regime: pass it only when the
    filtered side is broadcast-sized (a 100-doc daily delta, not a
    re-pairing); larger deltas belong on minhash_lsh_pairs'
    incremental path. Counting path only (raises with the prefix
    filter, whose rescore shape differs).

    ``shingles_df`` (R15, VERDICT r14 #6): a precomputed ``(id,
    shingles)`` frame — MUST equal ``shingles_expr(text, k)`` over
    exactly the rows of ``df``. Compositions that already shingled the
    corpus for a sibling pipeline (dd9 builds a MinHash index AND this
    exact twin over the same documents) pass their materialized
    shingle frame so the tokenize+shingle scan runs once per
    invocation instead of once per pipeline. ``df`` may then be None
    (it is only consulted for the corpus-count guards, which fall back
    to counting ``shingles_df``).

    Columns: a_id, b_id (a_id < b_id), jaccard.
    """
    if prefix_filter is None:
        prefix_filter = threshold >= 0.5
    if b_id_filter is not None and prefix_filter:
        raise ValueError(
            "ngram_jaccard_pairs: b_id_filter is implemented for the "
            "counting path only — pass prefix_filter=False explicitly"
        )
    # The guard count runs only on the probe path (stop_shingles is
    # None) — exactly the calls that already paid a corpus count for
    # the stop-shingle short-circuit pre-R6. A caller passing a
    # precomputed stop set has run corpus-scale discovery knowingly
    # (the cached recurring-pipeline path, e.g. dd2's artifact); adding
    # an unconditional per-call count there would re-create the very
    # per-invocation corpus job the r4/r5 rounds removed.
    count_src = df if df is not None else shingles_df
    n_docs: int | None = None
    if max_exact_docs is not None and stop_shingles is None:
        n_docs = count_src.count()
        if n_docs > max_exact_docs:
            raise ValueError(
                f"ngram_jaccard_pairs: corpus has {n_docs:,} documents, over "
                f"max_exact_docs={max_exact_docs:,} — the exact all-pairs "
                "tier does not scale to this corpus; use minhash_lsh_pairs "
                "(banded LSH + exact rescore) or raise/disable the guard "
                "(max_exact_docs=None) deliberately"
            )
    if shingles_df is not None:
        sh = shingles_df.select("id", "shingles").withColumn(
            "n_shingles", F.size("shingles")
        )
    else:
        sh = df.select(
            F.col(id_col).alias("id"),
            shingles_expr(F.col(text_col), k).alias("shingles"),
        ).withColumn("n_shingles", F.size("shingles"))
    flat = sh.select("id", "n_shingles", F.explode("shingles").alias("shingle"))

    stop_list: list[str] | None = []  # [] = no stop shingles; None = too many to collect
    stop_df: DataFrame | None = None
    # A shingle's DF can't exceed the doc count, so a corpus of <= df_cap
    # docs provably has no stop shingles — one cheap count() skips the
    # probe aggregation entirely (the common case below web scale).
    if stop_shingles is not None:
        stop_list = list(stop_shingles)
    elif df_cap is not None and (
        n_docs if n_docs is not None else count_src.count()
    ) > df_cap:
        stop_df = (
            flat.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > F.lit(int(df_cap)))
            .select("shingle")
        )
        probe = stop_df.limit(max_stop_broadcast + 1).collect()
        stop_list = (
            [r.shingle for r in probe] if len(probe) <= max_stop_broadcast else None
        )

    def drop_stop_shingles(ix: DataFrame) -> DataFrame:
        """Exclude stop shingles from a discovery index: an InSet filter
        when the stop set fit the driver (stays inside the index's
        codegen stage — zero plan growth), else a distributed anti-join
        against the stop-set DataFrame."""
        if not stop_list and stop_list is not None:
            return ix
        if stop_list is not None:
            return ix.where(~F.col("shingle").isin(stop_list))
        return ix.join(stop_df, "shingle", "left_anti")

    def rescore(cand: DataFrame) -> DataFrame:
        """Exact-Jaccard rescore of (a_id, b_id) candidates against the
        full shingle arrays."""
        sh_a = sh.select(F.col("id").alias("a_id"), F.col("shingles").alias("sh_a"))
        sh_b = sh.select(F.col("id").alias("b_id"), F.col("shingles").alias("sh_b"))
        return (
            cand.join(sh_a, "a_id")
            .join(sh_b, "b_id")
            .withColumn("jaccard", jaccard_expr(F.col("sh_a"), F.col("sh_b")))
            .where(F.col("jaccard") >= F.lit(threshold))
            .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
        )

    if prefix_filter:
        # Canonical global order via sortable (hash, shingle) structs —
        # the struct sort keeps everything inside codegen (a comparator
        # lambda would fall back to interpreted evaluation).
        hashed = F.transform(
            F.col("shingles"),
            lambda s: F.struct(F.xxhash64(s).alias("h"), s.alias("s")),
        )
        ordered = F.transform(F.array_sort(hashed), lambda st: st["s"])
        # p = n - ceil(t*n) + 1; the epsilon guards float noise in t*n
        # from rounding the prefix DOWN (which would lose recall).
        p = (
            F.col("n_shingles")
            - F.ceil(F.lit(threshold) * F.col("n_shingles") - F.lit(1e-9))
            + F.lit(1)
        ).cast("int")
        prefix_ix = drop_stop_shingles(
            sh.select("id", F.explode(F.slice(ordered, 1, p)).alias("shingle"))
        )
        a, b = (
            prefix_ix.hint("shuffle_hash").alias("a"),
            prefix_ix.hint("shuffle_hash").alias("b"),
        )
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .dropDuplicates()
        )
        return rescore(cand)

    # shuffle_hash, not broadcast: the inverted index is O(corpus) rows —
    # near the broadcast threshold it makes planning flaky (single-thread
    # relation builds), and at real scale broadcasting it is impossible.
    # Identical shuffles on both sides also let AQE reuse the exchange,
    # so the shingle expression is computed once.
    # AllPairs length filter, evaluated at join probe time (no extra
    # shuffle): J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so a pair whose
    # sizes differ by more than the threshold ratio can never qualify
    # and is dropped before it ever reaches the counting aggregation.
    t = F.lit(float(threshold))
    size_ok = (F.col("a.n_shingles") >= t * F.col("b.n_shingles")) & (
        F.col("b.n_shingles") >= t * F.col("a.n_shingles")
    )
    rare = drop_stop_shingles(flat)
    if b_id_filter is not None:
        # asymmetric probe: tiny filtered index broadcast, corpus index
        # streamed — no exchange carries the corpus-sized side
        a = rare.alias("a")
        b = F.broadcast(rare.where(b_id_filter(F.col("id"))).alias("b"))
    else:
        a, b = (
            rare.hint("shuffle_hash").alias("a"),
            rare.hint("shuffle_hash").alias("b"),
        )
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & size_ok,
        )
        .groupBy(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )

    # Gate on the stop set actually being APPLIED (drop_stop_shingles
    # drops whenever stop_list is non-empty or overflowed-to-DF),
    # independent of df_cap: an explicit stop_shingles=[...] with
    # df_cap=None still removed those shingles from the counting join,
    # and skipping the repair there would understate Jaccard / silently
    # lose pairs (ADVICE r5).
    if stop_list is None or stop_list:
        # Exact-hybrid count repair: the counting join above saw only
        # sub-cap shingles (bounded at df_cap^2/2 rows per shingle), so
        # a pair's count misses the stop shingles both docs contain.
        # Rescoring every candidate against full arrays would
        # re-shuffle the arrays once per CANDIDATE PAIR — ruinous at
        # low thresholds where most same-shingle pairs are candidates.
        # Instead repair the count with |stop_a ∩ stop_b| from per-doc
        # stop-shingle arrays: the doc_stop table holds ONLY docs
        # containing a stop shingle, and each doc's array is bounded by
        # its own shingle count. Reported Jaccard is exact; pairs whose
        # entire overlap is stop shingles are missed (the documented
        # recall contract). No broadcast hint on the repair joins:
        # doc_stop is usually tiny (AQE converts to broadcast at
        # runtime) but is corpus-sized on boilerplate-heavy data, where
        # a forced broadcast would OOM the driver.
        doc_stop = (
            flat.where(F.col("shingle").isin(stop_list))
            if stop_list is not None
            else flat.join(stop_df, "shingle")
        ).groupBy("id").agg(F.collect_list("shingle").alias("stop_sh"))
        empty = F.array().cast("array<string>")
        stop_a = doc_stop.select(
            F.col("id").alias("a_id"), F.col("stop_sh").alias("stop_a")
        )
        stop_b = doc_stop.select(
            F.col("id").alias("b_id"), F.col("stop_sh").alias("stop_b")
        )
        common = (
            common.withColumnRenamed("n_common", "n_common_rare")
            .join(stop_a, "a_id", "left")
            .join(stop_b, "b_id", "left")
            .withColumn(
                "n_common",
                F.col("n_common_rare")
                + F.size(
                    F.array_intersect(
                        F.coalesce(F.col("stop_a"), empty),
                        F.coalesce(F.col("stop_b"), empty),
                    )
                ),
            )
        )

    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: 64 hash functions, 32 bands x 2 rows -> s-curve midpoint ~(1/32)^(1/2)=0.18,
#: comfortably below the 0.3 verify threshold (high recall).
MINHASH_HASHES = 64
MINHASH_BANDS = 32


def minhash_signature(shingles: Column, num_hashes: int = MINHASH_HASHES) -> Column:
    """array<long> signature: per seed i, min over shingles of
    xxhash64(shingle, i). Seeding by passing the seed as an extra hashed
    column — deterministic across runs/executors (SURVEY §7 hard-part 2).
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding with exact-Jaccard rescore.

    Pipeline: shingle -> signature -> per-band hash -> explode bands ->
    self-join on (band, band_hash) -> distinct candidate pairs ->
    rescore with exact Jaccard on the shingle sets -> threshold filter.

    Scale: the only shuffles are the band-bucket join (key = band hash,
    uniformly distributed by construction) and the rescore join; the
    signature itself is embarrassingly parallel. Candidate count is
    governed by the band geometry, not n^2.

    ``shingles_df`` (R15, VERDICT r14 #6): a precomputed ``(id,
    shingles)`` frame that MUST equal ``shingles_expr(text, k)`` over
    ``df``'s rows — compositions running this banded tier next to an
    exact twin over the same corpus (dd3) pass their shared shingle
    frame so tokenization runs once per invocation, not per pipeline.
    """
    rows = num_hashes // bands
    sh = (
        shingles_df.select("id", "shingles")
        if shingles_df is not None
        else df.select(
            F.col(id_col).alias("id"),
            shingles_expr(F.col(text_col), k).alias("shingles"),
        )
    )
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    band_arr = F.array(
        *[
            F.xxhash64(F.slice("sig", i * rows + 1, rows), F.lit(i))
            for i in range(bands)
        ]
    )
    banded = sig.select(
        "id", F.posexplode(band_arr).alias("band", "band_hash")
    ).hint("shuffle_hash")  # O(corpus x bands) rows — never broadcast
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates()
    )
    sh_a = sh.select(F.col("id").alias("a_id"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("b_id"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a, "a_id")
        .join(sh_b, "b_id")
        .withColumn("jaccard", jaccard_expr(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_keep_min(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Resolve near-dup pairs into a keep-set: drop every id that appears
    as the greater member of a pair (keep-min-id policy, one anti-join).
    Not full connected components — the standard single-pass policy used
    by web-scale dedup pipelines; see ``dedup_transitive`` when chains
    (A~B~C with A!~C) must collapse to one survivor per component."""
    drop = pairs.select(F.col("b_id").alias(id_col)).dropDuplicates()
    return df.join(drop, id_col, "left_anti")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    transitive: bool = False,
) -> DataFrame:
    """Quality-aware pair resolution — the Dolma/RefinedWeb keep rule:
    a duplicate group keeps its highest-``score_col`` member (ties ->
    smallest id) instead of blindly the smallest id. Dedup should
    discard the boilerplate-laden or truncated copy, not whichever
    crawl happened to be ingested first; feed it a quality-classifier
    probability, a Gopher score, or ``-perplexity``.

    ``transitive=False`` (default, one shuffle + one anti-join — the
    keep-min cost shape): the LOSER of every pair is dropped, i.e. a
    document survives iff it wins (or ties into) every comparison it
    appears in. On a chain A~B~C with B best, both A and C drop —
    same policy class as ``dedup_keep_min``, score-aware.
    ``transitive=True``: pairs collapse to connected components first
    (min-label fixpoint) and each COMPONENT keeps exactly one
    survivor — use when chains must not over-drop (A~B~C with A,C
    both beating B keeps A only under pairwise, but A per component).

    Scale: everything is joins/aggregations on the pair table (bounded
    by the dedup tier's output, far smaller than the corpus); the
    corpus-sized side is touched only by the final anti-join."""
    scores = df.select(
        F.col(id_col).alias("__kid"),
        F.col(score_col).alias("__ksc"),
        F.lit(True).alias("__kp"),
    )
    if transitive:
        comp = connected_components(pairs)
        # INNER join (R8 review): the keeper is elected among members
        # PRESENT in df only — a pair feed computed upstream of a gate
        # may reference ids the gate already removed, and electing an
        # absent keeper would drop every real member of the component
        # (the pairwise path below handles the same case with explicit
        # presence flags).
        labeled = comp.join(
            scores, comp["id"] == scores["__kid"], "inner"
        ).select("id", "label", "__ksc")  # __kp redundant after inner
        # min_by over (-score, id): highest score wins, ties -> min id
        keep = labeled.groupBy("label").agg(
            F.expr(
                "min_by(id, struct(-coalesce(__ksc, double('-inf')), id))"
            ).alias("keep_id")
        )
        drop = labeled.join(
            keep, labeled["id"] == keep["keep_id"], "left_anti"
        ).select(F.col("id").alias(id_col)).dropDuplicates()
        return df.join(drop, id_col, "left_anti")
    a = pairs.join(
        scores.withColumnRenamed("__kid", "a_id")
        .withColumnRenamed("__ksc", "a_sc")
        .withColumnRenamed("__kp", "a_p"),
        "a_id",
        "left",
    ).join(
        scores.withColumnRenamed("__kid", "b_id")
        .withColumnRenamed("__ksc", "b_sc")
        .withColumnRenamed("__kp", "b_p"),
        "b_id",
        "left",
    )
    # PRESENCE first (2nd R8 review): an id absent from df (gated
    # upstream) must never condemn its present partner — a present
    # null-score doc previously tied a ghost at -inf and the tie rule
    # dropped it. An absent side is declared the loser (a no-op drop);
    # then null scores lose to any non-null (coalesce to -inf); equal
    # scores -> the greater id loses (the keep-min tie rule).
    a_p = F.coalesce(F.col("a_p"), F.lit(False))
    b_p = F.coalesce(F.col("b_p"), F.lit(False))
    a_sc = F.coalesce(F.col("a_sc"), F.lit(float("-inf")))
    b_sc = F.coalesce(F.col("b_sc"), F.lit(float("-inf")))
    loser = (
        F.when(~a_p, F.col("a_id"))
        .when(~b_p, F.col("b_id"))
        .when(a_sc < b_sc, F.col("a_id"))
        .when(a_sc > b_sc, F.col("b_id"))
        .otherwise(F.greatest("a_id", "b_id"))
    )
    drop = a.select(loser.alias(id_col)).dropDuplicates()
    return df.join(drop, id_col, "left_anti")


def _cc_checkpointer(spark, use_reliable_checkpoint: bool, checkpoint_dir: str | None):
    """Per-round lineage truncation: executor-local by default, routed
    through the reliable checkpoint store for cluster fault tolerance."""
    if use_reliable_checkpoint:
        sc = spark.sparkContext
        if checkpoint_dir is None:
            import tempfile

            checkpoint_dir = tempfile.mkdtemp(prefix="etlzero_cc_ckpt_")
        sc.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    return ckpt


def connected_components_star(
    pairs: DataFrame,
    max_iter: int = 30,
    shuffle_partitions: int | None = 32,
    use_reliable_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
    allow_partial: bool = False,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    rounds grow with log of component size, NOT graph diameter — the
    scale path for adversarial long-chain graphs where min-label
    propagation (``connected_components``) needs diameter rounds.

    Each round rewires the edge set toward stars centered on component
    minima: large-star links every neighbor larger than u to
    m = min(neighborhood(u) ∪ {u}); small-star (on edges directed to
    the smaller endpoint) links u and its smaller neighbors to their
    minimum. The fixpoint is a forest of depth-1 stars whose centers
    are the component minima; labels read straight off the edges.

    Same output contract and kwargs as ``connected_components``.
    """
    spark = pairs.sparkSession
    ckpt = _cc_checkpointer(spark, use_reliable_checkpoint, checkpoint_dir)
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    converged = False
    try:
        if shuffle_partitions is not None and int(prev) > shuffle_partitions:
            spark.conf.set(conf_key, str(shuffle_partitions))
        # Canonical edges directed to the smaller endpoint (u > v).
        e = (
            pairs.select(F.col("a_id").alias("x"), F.col("b_id").alias("y"))
            .where(F.col("x") != F.col("y"))
            .select(
                F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
            )
            .dropDuplicates()
        )
        e = ckpt(e)
        n_edges = e.count()
        # Same loop-width tightening as connected_components: shuffle
        # width follows the materialized edge count, not the session.
        if shuffle_partitions is not None:
            loop_parts = max(1, min(shuffle_partitions, -(-n_edges // 10_000)))
            spark.conf.set(conf_key, str(loop_parts))
        for _ in range(max_iter):
            # large-star over the symmetric neighborhood view
            sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            mins = sym.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            large = (
                sym.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                .dropDuplicates()
            )
            # small-star on the (u > v)-directed edges
            mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
            small = (
                large.join(mins2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(mins2.select(F.col("u"), F.col("m").alias("v")))
                .where(F.col("u") != F.col("v"))
                .dropDuplicates()
            )
            small = ckpt(small)
            new_count = small.count()
            stable = new_count == n_edges and small.subtract(e).count() == 0
            e, n_edges = small, new_count
            if stable:
                converged = True
                break
    finally:
        spark.conf.set(conf_key, prev)
    if not converged:
        msg = (
            f"connected_components_star did not stabilize within "
            f"max_iter={max_iter} rounds; labels may be wrong — raise "
            "max_iter (rounds ~ log(component size)) or pass "
            "allow_partial=True to accept a pre-clustering."
        )
        if allow_partial:
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    # Fixpoint edges are (node, component-min) stars; centers label
    # themselves. min() guards the (converged-guaranteed) uniqueness.
    members = e.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("id"), "label"
    )
    roots = (
        e.select(F.col("v").alias("id"))
        .subtract(e.select(F.col("u").alias("id")))
        .withColumn("label", F.col("id"))
    )
    return members.union(roots)


def connected_components(
    pairs: DataFrame,
    max_iter: int = 50,
    shuffle_partitions: int | None = 32,
    use_reliable_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
    allow_partial: bool = False,
    algorithm: str = "label",
) -> DataFrame:
    """Label each node in the similarity graph with the min id of its
    connected component: min-label propagation to a fixpoint
    (``algorithm="label"``), or the O(log n)-round alternating star
    algorithm (``algorithm="star"`` — ``connected_components_star``)
    for graphs whose diameter is not small.

    Each round: every node takes min(own label, neighbors' labels); the
    min id floods outward one hop per round, so rounds = graph diameter
    (near-dup components are short chains in practice; `max_iter` is a
    safety rail, and convergence is detected with a count — the only
    scalar the driver sees). Checkpointing truncates the lineage so
    plan size stays O(1) per round instead of O(rounds). For adversarial
    long-chain graphs the O(log n) alternating small-star/large-star
    algorithm (Kiveris et al., "Connected Components in MapReduce") drops
    in behind the same signature.

    Checkpoint tier: the default `localCheckpoint` stores blocks on
    executor-local storage — fast, but NOT fault-tolerant: losing one
    executor mid-loop kills the job unrecoverably. On a real cluster
    pass ``use_reliable_checkpoint=True`` to write checkpoints through
    the reliable store instead (``checkpoint_dir`` or a fresh local
    tempdir when unset — point it at HDFS/S3 in production; the
    SparkContext checkpoint dir is set on first use).

    If the loop exhausts ``max_iter`` before the fixpoint, the labels
    are WRONG for any component wider than the rounds run, so the
    default raises; ``allow_partial=True`` downgrades that to a warning
    for callers that only need a pre-clustering.

    ``shuffle_partitions`` temporarily caps the loop's shuffles (restored
    afterward): the working set is the PAIR GRAPH, orders of magnitude
    smaller than the corpus that produced it, and the checkpointed
    iterations otherwise inherit a corpus-sized partition count and
    drown in per-stage overhead (200-partition vanilla session: 4.5x
    slower on the fixture). Size it to the expected pair count — or pass
    None at cluster scale to inherit the session setting.

    Output: (id, label) for every node that appears in ``pairs``.
    """
    if algorithm == "star":
        return connected_components_star(
            pairs,
            max_iter=max_iter,
            shuffle_partitions=shuffle_partitions,
            use_reliable_checkpoint=use_reliable_checkpoint,
            checkpoint_dir=checkpoint_dir,
            allow_partial=allow_partial,
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'label' or 'star'")
    spark = pairs.sparkSession
    ckpt = _cc_checkpointer(spark, use_reliable_checkpoint, checkpoint_dir)
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    converged = False
    changed: int | None = None  # max_iter=0 never enters the loop
    try:
        if shuffle_partitions is not None and int(prev) > shuffle_partitions:
            spark.conf.set(conf_key, str(shuffle_partitions))
        sym = pairs.select(
            F.col("a_id").alias("id"), F.col("b_id").alias("nbr")
        ).unionAll(
            pairs.select(F.col("b_id").alias("id"), F.col("a_id").alias("nbr"))
        )
        edges = ckpt(sym.dropDuplicates(["id", "nbr"]))
        # Tighten the loop's width to the MATERIALIZED edge count (the
        # count is free — edges are already checkpointed): a few hundred
        # near-dup pairs need 1 partition, not 32, and the loop pays
        # per-task overhead twice per round per shuffle.
        if shuffle_partitions is not None:
            n_e = edges.count()
            loop_parts = max(1, min(shuffle_partitions, -(-n_e // 10_000)))
            spark.conf.set(conf_key, str(loop_parts))
        # R14: the first propagation round is folded into the label
        # initialization — with every label equal to its id, round 1's
        # "min(own, neighbors' labels)" is just min(id, min(nbr)), one
        # aggregation with NO join — so the loop starts one hop closer
        # to the fixpoint (same fixpoint, one fewer join+checkpoint+
        # count cycle at any scale). Every node appears as `id` in the
        # symmetric edge view, so the groupBy covers all nodes.
        labels = edges.groupBy("id").agg(
            F.least(F.col("id"), F.min("nbr")).alias("label")
        )
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels.withColumnRenamed("id", "nbr"), "nbr")
                .groupBy("id")
                .agg(F.min("label").alias("nbr_label"))
            )
            # change detection rides the checkpointed frame as a flag
            # column (R14) — the old label is already present in this
            # join, so the previous per-round new-vs-old join + count
            # collapses to one filter-count over materialized blocks
            new_labels = ckpt(
                labels.join(nbr_min, "id", "left").select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", "label")
                    ).alias("label"),
                    (
                        F.coalesce("nbr_label", "label") < F.col("label")
                    ).alias("__chg"),
                )
            )
            changed = new_labels.where(F.col("__chg")).count()
            labels = new_labels.drop("__chg")
            if changed == 0:
                converged = True
                break
    finally:
        spark.conf.set(conf_key, prev)
    if not converged:
        msg = (
            f"connected_components did not reach a fixpoint within "
            f"max_iter={max_iter} rounds ({changed} labels still changing); "
            "labels are wrong for components wider than the rounds run — "
            "raise max_iter (rounds needed = component diameter) or pass "
            "allow_partial=True to accept a pre-clustering."
        )
        if allow_partial:
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    return labels


def dedup_transitive(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", **cc_kwargs
) -> DataFrame:
    """Transitive-closure dedup: one survivor (the min id) per connected
    component of the pair graph. Documents in no pair pass through.

    Where this differs from single-pass ``dedup_keep_min``: pairs
    {(2,3), (1,3)} — the single pass drops only b-sides {3} and keeps
    {1, 2}, but 1~3~2 makes them one transitive group whose sole
    survivor is 1.

    ``cc_kwargs`` forward to :func:`connected_components` so cluster
    callers can set max_iter / shuffle_partitions /
    use_reliable_checkpoint without bypassing this wrapper.
    """
    comp = connected_components(pairs, **cc_kwargs)
    drop = comp.where(F.col("label") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 x 16-bit bands -> candidates within Hamming<=3 guaranteed


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: explode tokens, hash each, and for
    every bit position accumulate +1/-1 by token frequency; bit b of the
    fingerprint is the sign of sum_b.

    Shape: explode (id, token-hash) by bit position and run two narrow
    hash aggregations — (id, bit) -> signed sum, then (id) -> OR the
    winning bits together. The obvious alternative (one groupBy(id) with
    64 conditional-sum aggregate columns) generates pathological
    whole-stage code (~35s compile/exec for 27k rows vs ~2s for this
    shape). Map-side partial aggregation collapses the 64x explode
    before the shuffle, so shuffled rows are 64/document regardless of
    document length.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_expr(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bits = toks.select(
        "id", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit")
    ).withColumn(
        "c", F.when(F.expr("(h >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
    )
    bitsum = bits.groupBy("id", "bit").agg(F.sum("c").alias("s"))
    return bitsum.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs within Hamming distance ``max_hamming``.

    Banding: split the 64-bit fingerprint into 4 16-bit bands; any pair
    within Hamming<=3 shares at least one exact band (pigeonhole), so
    the join on (band, value) has guaranteed recall. Verify step
    computes the true Hamming distance with bit_count(xor).
    Columns: a_id, b_id, hamming."""
    fps = simhash_fingerprints(df, text_col, id_col)
    band_arr = F.array(
        *[
            F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(SIMHASH_BANDS)
        ]
    )
    banded = fps.select(
        "id", "simhash", F.posexplode(band_arr).alias("band", "band_val")
    ).hint("shuffle_hash")  # O(corpus x bands) rows — never broadcast
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .dropDuplicates()
        .where(F.col("hamming") <= F.lit(max_hamming))
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold.

    Exact baseline, GEMM-shaped: the corpus ships once as a broadcast
    numpy matrix; rows stream through ``mapInPandas`` and each Arrow
    batch scores against the matrix with one BLAS matmul, emitting only
    the a<b pairs at/above threshold. A pair-join formulation would move
    ``dim x n_pairs`` floats through Arrow — orders of magnitude more
    bytes than the inputs. For corpora beyond broadcast size, shard with
    similarity.lsh_bucketed_topk's buckets first and rescore per shard.
    Columns: a_id, b_id, cosine (round 6).
    """
    import numpy as np
    import pandas as pd

    from etl_zero_spark.operators.similarity import collect_normalized_matrix

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(collect_normalized_matrix(emb, id_col, vec_col))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf["a_id"].to_numpy()
            a_mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            norms = np.linalg.norm(a_mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (a_mat / norms) @ c_mat.T  # (batch, corpus)
            ii, jj = np.nonzero((sims >= threshold) & (a_ids[:, None] < c_ids[None, :]))
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ii],
                    "b_id": c_ids[jj],
                    "cosine": np.round(sims[ii, jj], 6),
                }
            )

    rows = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("va")
    ).repartition(n_parts)
    return rows.mapInPandas(gen, "a_id long, b_id long, cosine double")


def embedding_neardup_pairs_blocked(
    emb: DataFrame,
    threshold: float = 0.95,
    rows_per_block: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs with NO driver materialization: the
    distributed replacement for ``embedding_neardup_pairs``' broadcast
    kernel (which stays as the small-scale verify oracle).

    Shape: vectors hash into B = ceil(n / rows_per_block) blocks; every
    unordered block pair (bi <= bj) becomes one cogroup key, so each
    vector is shuffled ~B times and each (block x block) GEMM runs in
    one task with bounded memory. Exact all-pairs is inherently O(n^2)
    compute — this shape distributes it without a driver bottleneck;
    when the n^2 budget itself is the problem, prefilter with
    ``similarity.lsh_neardup_pairs`` and keep this as the rescorer.
    Output (a_id, b_id with a_id < b_id, cosine round 6) is bit-identical
    to the broadcast kernel.
    """
    import numpy as np
    import pandas as pd

    from etl_zero_spark.operators.similarity import BLOCK_ROWS, _n_blocks, _stack_normalized

    # null vectors have no cosine to anything and would crash the numpy
    # stack inside the kernel — dropped at the boundary, like every
    # similarity entry point
    emb = emb.where(F.col(vec_col).isNotNull())
    nb = _n_blocks(emb, rows_per_block or BLOCK_ROWS)
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(nb)))
    # Left side owns keys (blk, j >= blk); right side keys (i <= blk, blk):
    # an unordered pair {x, y} meets at exactly one key (min, max of their
    # blocks), twice when co-blocked — the diagonal a<b filter dedups.
    # Right-side columns are renamed: when both cogroup children derive
    # from the same source DataFrame with identical column names, Spark's
    # attribute dedup mis-prunes the right child down to its grouping
    # columns (observed on 4.1.2).
    left = base.select(
        "id", "v", F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(nb - 1))).alias("bj"),
    )
    right = base.select(
        F.col("id").alias("rid"), F.col("v").alias("rv"),
        F.col("blk").alias("bj"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
    )

    def kernel(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []})
        l_ids = lpdf["id"].to_numpy()
        r_ids = rpdf["rid"].to_numpy()
        sims = _stack_normalized(lpdf["v"]) @ _stack_normalized(rpdf["rv"]).T
        keep = sims >= threshold
        if key[0] == key[1]:
            keep &= l_ids[:, None] < r_ids[None, :]
        ii, jj = np.nonzero(keep)
        a, b = l_ids[ii], r_ids[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a_id": lo, "b_id": hi, "cosine": sims[ii, jj]})

    pairs = (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(kernel, "a_id long, b_id long, cosine double")
    )
    return pairs.select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# incremental near-dedup: delta batch vs an indexed corpus
# ---------------------------------------------------------------------------


@dataclass
class MinHashIndex:
    """The persistable corpus-side state for incremental near-dedup:
    banded MinHash buckets + shingle sets, pinned to their geometry
    (pairs are only meaningful between identically-hashed sides).
    ``bands``/``shingles`` are plain DataFrames — persist them as zone
    tables or snapshot tables and reload; the signature functions are
    seeded and deterministic, so an index built yesterday matches a
    delta hashed today."""

    bands: DataFrame
    shingles: DataFrame
    k: int
    num_hashes: int
    n_bands: int


def build_minhash_index(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles_df: DataFrame | None = None,
) -> MinHashIndex:
    """Index a corpus for incremental near-dedup: one pass computing
    shingle sets, signatures and per-band bucket hashes. O(corpus x
    bands) band rows, embarrassingly parallel — the cost the full
    self-pairing pays EVERY run is paid once here.

    ``shingles_df`` (R15): a precomputed ``(id, shingles)`` frame that
    MUST equal ``shingles_expr(text, k)`` over ``df``'s rows —
    compositions that shingle the same corpus for a sibling pipeline
    (dd9's exact twin) pass it so tokenization runs once."""
    rows = num_hashes // bands
    sh = (
        shingles_df.select("id", "shingles")
        if shingles_df is not None
        else df.select(
            F.col(id_col).alias("id"),
            shingles_expr(F.col(text_col), k).alias("shingles"),
        )
    )
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    band_arr = F.array(
        *[
            F.xxhash64(F.slice("sig", i * rows + 1, rows), F.lit(i))
            for i in range(bands)
        ]
    )
    banded = sig.select("id", F.posexplode(band_arr).alias("band", "band_hash"))
    return MinHashIndex(banded, sh, k, num_hashes, bands)


def incremental_minhash_pairs(
    delta: DataFrame,
    index: MinHashIndex,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    check_disjoint_ids: bool = False,
    delta_vs_index_only: bool = False,
    broadcast_index: bool = False,
    delta_index: MinHashIndex | None = None,
) -> DataFrame:
    """Near-dup pairs INVOLVING the delta batch: delta-vs-corpus plus
    delta-vs-delta, never corpus-vs-corpus — the daily-ingest shape
    (dedupe today's crawl against the lake without re-pairing the
    lake). Output matches minhash_lsh_pairs' schema/threshold
    semantics; with yesterday's pair set it composes to exactly the
    full re-run's pairs (pinned by the equivalence test).

    Scale: the join probes the index's band buckets with ONLY the
    delta's band rows — cost O(delta x bands + matched buckets), not
    O(corpus x bands); rescore joins fetch shingles for candidate ids
    only. Delta ids must be DISJOINT from corpus ids (reuse would
    alias pairs): ``check_disjoint_ids`` enforces it with one
    semi-join probe of the index's shingle table against the delta's
    ids (limit(3) — stops after a small collision sample for the error
    message, never a full count) — opt-in because a well-formed ingest
    already guarantees it and the probe is a per-call job.

    ``delta_vs_index_only`` drops the delta-vs-delta block before any
    rescore work: callers that only want pairs CROSSING the boundary
    (leakage_pairs probes the heldout index with the ~whole-corpus
    train side, where the within-block would be a train-vs-train LSH
    self-join whose candidates are Jaccard-rescored just to be thrown
    away) must set it — the default keeps the daily-ingest composition
    contract (delta+delta pairs included).

    ``broadcast_index`` (R14): the daily-ingest regime indexes the
    LAKE and probes with a small delta, so the band join shuffles both
    sides by default. leakage_pairs inverts that — the index is the
    heldout (percents of the corpus) and the delta is ~the whole train
    split — and there the small INDEX side should broadcast so the
    train-sized band table is never shuffled (guide §3.1). Set it only
    when the index side is broadcast-sized.

    ``delta_index`` (R15): the delta's own MinHashIndex, when the
    caller already built one (dd9 derives the delta's shingles from
    the corpus shingle frame it shares with its exact twin) — MUST be
    ``build_minhash_index(delta)`` under this index's geometry; the
    default builds it here."""
    if check_disjoint_ids:
        clash = (
            index.shingles.select("id")
            .join(
                delta.select(F.col(id_col).alias("id")).dropDuplicates(),
                "id",
                "left_semi",
            )
            .limit(3)
            .collect()
        )
        if clash:
            sample = ", ".join(str(r.id) for r in clash)
            raise ValueError(
                f"incremental_minhash_pairs: delta reuses indexed ids "
                f"(e.g. {sample}) — pairs would alias; re-key the delta "
                "or rebuild the index"
            )
    d_idx = delta_index if delta_index is not None else build_minhash_index(
        delta, index.k, index.num_hashes, index.n_bands, text_col, id_col
    )
    db = d_idx.bands.alias("d")
    cb = index.bands.alias("c")
    if broadcast_index:
        cb = F.broadcast(cb)
    cross = (
        db.join(
            cb,
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.band_hash") == F.col("c.band_hash")),
        )
        .select(
            F.least(F.col("d.id"), F.col("c.id")).alias("a_id"),
            F.greatest(F.col("d.id"), F.col("c.id")).alias("b_id"),
        )
        .dropDuplicates()
    )
    if delta_vs_index_only:
        candidates = cross
    else:
        a, b = d_idx.bands.alias("a"), d_idx.bands.alias("b")
        within = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .dropDuplicates()
        )
        candidates = cross.unionByName(within).dropDuplicates()
    all_sh = index.shingles.unionByName(d_idx.shingles)
    sh_a = all_sh.select(F.col("id").alias("a_id"), F.col("shingles").alias("sh_a"))
    sh_b = all_sh.select(F.col("id").alias("b_id"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a, "a_id")
        .join(sh_b, "b_id")
        .withColumn("jaccard", jaccard_expr(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def extend_minhash_index(index: MinHashIndex, delta: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id") -> MinHashIndex:
    """The index after absorbing the delta — union of band and shingle
    tables (persist both and the next day's delta probes this)."""
    d_idx = build_minhash_index(
        delta, index.k, index.num_hashes, index.n_bands, text_col, id_col
    )
    return MinHashIndex(
        index.bands.unionByName(d_idx.bands),
        index.shingles.unionByName(d_idx.shingles),
        index.k,
        index.num_hashes,
        index.n_bands,
    )


# ---------------------------------------------------------------------------
# span-level exact substring dedup (Lee et al. 2021)
# ---------------------------------------------------------------------------


def duplicate_gram_positions(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_df_cap: int | None = 10_000,
    verify_exact: bool = False,
) -> DataFrame:
    """Positions of duplicated token k-grams, keep-first-occurrence
    semantics — the building block of span-level exact substring dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better": repeated >=50-token passages are removed from all
    but one occurrence; their exact tool is a suffix array, which has
    no distributed analogue — the k-gram inverted index finds exactly
    the duplicated substrings of length >= k, the published operating
    regime, at one explode + one window).

    Every token position opens one k-gram (xxhash64 over the k-token
    window); occurrences of each gram rank globally by (doc, position)
    and every occurrence RANKED >= 2 is a duplicate position — the
    global first stays. Grams spanning more than ``gram_df_cap``
    occurrences are dropped from the index (the stop-shingle bound:
    boilerplate k-grams otherwise explode the window partition), which
    UNDER-marks — boilerplate survives rather than risking an
    unbounded partition; lower the cap deliberately for
    boilerplate-heavy corpora.

    COLLISION CONTRACT (ADVICE r6 #2): by default grams are identified
    by their 64-bit xxhash64 alone, so two DIFFERENT k-grams colliding
    marks a false duplicate position and the downstream span removal
    silently cuts unique text. Expected false positions ~ P^2 / 2^65
    for P total gram positions: negligible below ~10^9 positions
    (<0.03 expected), but at web scale (P ~ 10^11, the 100 TB corpus
    this module targets) a few hundred false cuts are EXPECTED — and
    unlike the cap's under-marking, the failure is silent data
    mutation. Callers that cannot tolerate any false cut set
    ``verify_exact=True``: the gram TEXT rides with the hash and the
    occurrence window keys on (hash, text), making marks exact at the
    cost of shuffling ~k tokens per position instead of 8 bytes
    (roughly a (6*k)x shuffle-payload factor). Measured end-to-end
    (R8 scale probe, 100k salad docs, k=25, local[32], median-of-3):
    5.6s vs 3.5s hash-only — ~1.6x wall time, far below the payload
    factor because the explode/window CPU dominates the wider
    shuffle. Pay it when rewriting documents you cannot regenerate.

    Columns: <id_col>, pos (0-based token index of the gram start).
    Documents shorter than ``k`` tokens open no grams (a doc cannot
    contain a >= k-token repeat of itself).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    toks = tokens_expr(F.col(text_col))

    def gram_struct(i):
        s = F.array_join(F.slice(toks, i + 1, k), " ")
        return F.struct(
            F.xxhash64(s).alias("gh"),
            (s if verify_exact else F.lit(None).cast("string")).alias("gt"),
        )

    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(toks) >= k,
                F.transform(F.sequence(F.lit(0), F.size(toks) - k), gram_struct),
            ).otherwise(F.array().cast("array<struct<gh:bigint,gt:string>>"))
        ).alias("pos", "g"),
    ).select(id_col, "pos", F.col("g.gh").alias("gh"), F.col("g.gt").alias("gt"))
    if gram_df_cap is not None:
        hot = (
            grams.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > gram_df_cap)
            .select("gh")
        )
        # No forced broadcast: on boilerplate-heavy corpora the hot
        # set itself can be huge (the corpora the cap exists FOR) and
        # a forced broadcast would OOM the driver — AQE converts to
        # broadcast at runtime when the set is actually small, exactly
        # like ngram_jaccard_pairs' distributed stop-shingle path.
        grams = grams.join(hot, "gh", "left_anti")
    # verify_exact: occurrences key on (hash, gram text) — a 64-bit
    # collision then lands in different partitions and never marks.
    # (The hot-gram cap above still keys on gh alone: a collision can
    # only make the cap MORE conservative — more under-marking, never
    # a false cut.)
    part_keys = ["gh", "gt"] if verify_exact else ["gh"]
    w = Window.partitionBy(*part_keys).orderBy(F.col(id_col), F.col("pos"))
    return (
        grams.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") >= 2)
        .select(id_col, "pos")
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_df_cap: int | None = 10_000,
    verify_exact: bool = False,
) -> DataFrame:
    """Merged token spans [span_start, span_end) covering every
    duplicated k-gram occurrence (keep-first semantics) — a run of
    overlapping/adjacent duplicated gram starts collapses to one span
    via gap-and-islands (two windows over per-doc positions; a new
    island opens when the previous duplicated gram cannot overlap this
    one, i.e. the position gap exceeds k)."""
    from pyspark.sql import Window

    dup = duplicate_gram_positions(df, k, text_col, id_col, gram_df_cap,
                                   verify_exact)
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | (F.col("pos") - F.col("__prev") > k))
            .cast("int"),
        )
        .withColumn("__isl", F.sum("__new").over(w))
    )
    return islands.groupBy(id_col, "__isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k)).alias("span_end"),
    ).select(id_col, "span_start", "span_end")


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_df_cap: int | None = 10_000,
    out_col: str | None = None,
    verify_exact: bool = False,
) -> DataFrame:
    """Exact substring dedup applied: every duplicated >= k-token span
    (beyond its global first occurrence) is cut from the document's
    token stream, and the text re-joins with single spaces (the
    token-stream view, like chunk_documents). Documents losing every
    token keep an EMPTY string (row survives — dropping rows is
    doc-level dedup's job). One broadcast-less join of the span table
    back to the corpus + a codegen filter over indexed tokens; no UDF.
    """
    out_col = out_col or text_col
    spans = duplicate_spans(df, k, text_col, id_col, gram_df_cap, verify_exact)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    # Reconstruction uses ORIGINAL-CASE tokens: the same \s+ split as
    # tokens_expr (indices line up with the gram positions) but
    # WITHOUT the lowercasing grams hash through — rewriting a doc
    # must not silently destroy its capitalization (review r6).
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            F.col("__spans"),
            lambda s: (x["i"] >= s["span_start"]) & (x["i"] < s["span_end"]),
        ),
    )
    joined = df.join(per_doc, id_col, "left")
    cleaned = F.when(
        F.col("__spans").isNull(), F.col(text_col)
    ).otherwise(F.array_join(F.transform(kept, lambda x: x["t"]), " "))
    return joined.withColumn(out_col, cleaned).drop("__spans")


# ---------------------------------------------------------------------------
# line-level boilerplate dedup (C4 / FineWeb-style)
# ---------------------------------------------------------------------------


def duplicate_lines(
    df: DataFrame,
    min_docs: int = 2,
    min_chars: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide boilerplate lines: every line whose NORMALIZED form
    (trimmed, lowercased, whitespace-collapsed) appears in at least
    ``min_docs`` DISTINCT documents. This is the web-corpus cleaning
    rule C4 applied at three-sentence granularity and the common-crawl
    pipelines apply per line (nav bars, cookie banners, footers repeat
    VERBATIM across a site's pages — near-dup machinery is overkill
    for them and doc-level dedup never fires because the prose around
    them differs).

    Distinct-DOC counting on purpose: a line repeated 50x inside one
    document is within-doc repetition (span dedup's job,
    ``remove_duplicate_spans``); boilerplate is defined by spread
    across documents. Lines shorter than ``min_chars`` normalized
    characters are never counted — "1.", "-", and bare punctuation
    rows would otherwise dominate the dup table while carrying no
    boilerplate signal.

    Returns one row per boilerplate line: ``(line_key, n_docs)`` where
    ``line_key`` is the normalized line text (kept as the join key —
    grams-as-strings, so an oracle can replay the rule without
    replicating any hash function).

    Scale shape: one ``posexplode`` over split lines, one groupBy on
    the normalized line with a distinct-doc count (two shuffle passes
    on the line key — the standard distinct-agg expansion), and the
    ``>= min_docs`` filter. Output cardinality is bounded by the
    number of distinct repeated lines, not corpus size; nothing is
    collected.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\n")).alias("__line"),
    )
    key = F.regexp_replace(F.trim(F.lower(F.col("__line"))), r"\s+", " ")
    return (
        lines.select(F.col(id_col), key.alias("line_key"))
        .where(F.length("line_key") >= min_chars)
        .groupBy("line_key")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_lines(
    df: DataFrame,
    min_docs: int = 2,
    min_chars: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
    keep_first: bool = False,
) -> DataFrame:
    """Line-level boilerplate removal applied: every occurrence of a
    ``duplicate_lines`` line is dropped from every document (C4's
    rule — boilerplate carries no training signal anywhere, so unlike
    span dedup there is no first occurrence worth preserving; pass
    ``keep_first=True`` to keep the occurrence in the lowest
    ``(doc_id, position)`` instead, the archival variant). Remaining
    lines re-join with ``\\n`` in their original order and original
    text (matching is on the normalized form; surviving lines keep
    their exact bytes, trailing spaces and all). Null text passes
    through; a document losing every line keeps an EMPTY string (row
    survival is doc-level dedup's decision, not line dedup's).

    Scale shape: re-explode with position, equi-join the bounded
    boilerplate table on the normalized line key (no broadcast forced
    — AQE decides; the dup table is usually small but a pathological
    corpus can make it wide), filter, then groupBy doc +
    ``array_sort(collect_list(struct(pos, line)))`` to reassemble.
    The reassembly groupBy shuffles each document's surviving lines
    to one task — the same per-doc locality every rewrite op here has.
    """
    out_col = out_col or text_col
    dups = duplicate_lines(df, min_docs, min_chars, text_col, id_col)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("__pos", "__line"),
    )
    key = F.regexp_replace(F.trim(F.lower(F.col("__line"))), r"\s+", " ")
    tagged = lines.join(
        dups.withColumn("__dup", F.lit(True)),
        key == dups.line_key,
        "left",
    )
    if keep_first:
        # archival variant: the globally-first occurrence (min
        # (doc_id, pos) struct per line key) survives. Computed as an
        # aggregation, not a window — partial aggregation combines
        # map-side, so a boilerplate line present in millions of
        # documents never funnels through one sorted partition.
        firsts = (
            tagged.where(F.col("__dup").isNotNull())
            .groupBy("line_key")
            .agg(
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"), F.col("__pos").alias("p")
                    )
                ).alias("__first")
            )
        )
        tagged = tagged.join(firsts, "line_key", "left").withColumn(
            "__drop",
            F.col("__dup").isNotNull()
            & ~(
                (F.col("__first.i") == F.col(id_col))
                & (F.col("__first.p") == F.col("__pos"))
            ),
        )
    else:
        tagged = tagged.withColumn("__drop", F.col("__dup").isNotNull())
    survivors = tagged.where(~F.col("__drop")).groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line"))
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("__rebuilt")
    )
    rebuilt = df.join(survivors, id_col, "left")
    cleaned = F.when(
        F.col(text_col).isNull(), F.col(text_col)
    ).otherwise(F.coalesce(F.col("__rebuilt"), F.lit("")))
    return rebuilt.withColumn(out_col, cleaned).drop("__rebuilt")
