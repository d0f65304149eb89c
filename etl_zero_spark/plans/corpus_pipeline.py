"""End-to-end training-corpus preparation: the composition a user of
this engine actually runs over raw documents.

The reference's pipeline notion is extract -> map -> transform over
MySQL zones (scheduler.py:185-209); the LLM-data analog is the chain
below, each stage an operator that already exists and is individually
oracle/property-tested — this module contributes the COMPOSITION, its
stage accounting, and the single place the stage order is documented:

    blocklist -> HTML strip -> Unicode normalize -> PII scrub ->
    Gopher quality gate -> learned classifier gate (GPT-3 Pareto
    rule, R7) -> LM perplexity gate -> exact dedup -> MinHash
    near-dedup (in-pipeline pairing OR a streamed pair feed) -> exact
    substring (span) dedup -> eval-set decontamination -> DSIR
    selection -> deterministic shuffle -> sequence packing

Stage order rationale (each earlier stage shrinks the input of a more
expensive later one): the blocklist is a broadcast filter (cheapest),
quality gating is one projection, the perplexity gate one Arrow-UDF
pass (R6 — the CCNet signal, operators/lm.py), exact dedup is one
groupBy, near-dup is the first join-heavy stage, decontamination
touches the eval corpus too, DSIR selection (R6) runs after
membership is final so importance mass is not spent on rows later
stages would drop anyway, and packing/shuffle are layout stages that
must run LAST so pack assignments reflect the final selection.

Every stage is lazy, with ONE documented exception: the DSIR stage
estimates its bucket weights at composition time (two corpus-wide
count aggregations + a B-row collect inside ``dsir_bucket_logratio``
— the weight table is materialized precisely so consumers don't
re-run those corpus scans per action). ``collect_stats=True``
materializes per-stage row counts (caching each counted frame so the
lineage is not recomputed stage-over-stage). At 100 TB run with stats
off, or let the zone writes between stages provide the counts.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.corpus import (
    blocklist_filter,
    decontaminate,
    pack_sequences,
    shuffle_corpus,
)
from ..operators.dedup import (
    dedup_keep_best,
    dedup_keep_min,
    exact_dedup,
    minhash_lsh_pairs,
)
from ..operators.quality import gopher_filter
from ..operators.text import scrub_pii


@dataclass
class CorpusResult:
    df: DataFrame
    stats: dict[str, int] = field(default_factory=dict)
    #: wall seconds to materialize each stage (collect_stats only) —
    #: the per-stage breakdown the scale probes report so a band
    #: drift names its culprit stage instead of guessing (R14)
    stage_secs: dict[str, float] = field(default_factory=dict)
    #: frames this run persisted (stage caches or fork inputs); call
    #: :meth:`unpersist` when done consuming ``df``.
    persisted: list = field(default_factory=list)
    #: per-stage Observations (stats_mode="observe" only), in stage
    #: order; resolved into ``stats`` by :meth:`resolve_stats`.
    observations: dict = field(default_factory=dict)

    def unpersist(self) -> None:
        for frame in self.persisted:
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 — session may be gone
                pass

    def resolve_stats(self) -> dict[str, int]:
        """Fill ``stats`` from the stage observations (stats_mode=
        "observe"). Call ONLY after an action has fully consumed
        ``df`` — each Observation completes with the first action that
        executes its stage, and ``get`` blocks until then."""
        for stage, obs in self.observations.items():
            if stage not in self.stats:
                self.stats[stage] = int(obs.get["n"])
        return self.stats


def prepare_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    html: bool = False,
    normalize_unicode: bool = False,
    line_dedup_min_docs: int | None = None,
    blocked_sources: list[str] | None = None,
    source_col: str = "source",
    quality: bool = True,
    gopher_thresholds: dict[str, float] | None = None,
    classifier_model=None,
    classifier_alpha: float = 9.0,
    classifier_seed: int = 0,
    perplexity_model=None,
    max_perplexity: float | None = None,
    near_dedup_threshold: float | None = 0.5,
    near_dedup_pairs: DataFrame | None = None,
    near_dedup_score_col: str | None = None,
    substring_dedup_k: int | None = None,
    test_set: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_max_gram_df: int | None = 10_000,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_seed: int = 0,
    shuffle_seed: int | None = 0,
    pack_budget: int | None = None,
    pack_streams: int = 256,
    collect_stats: bool = True,
    eager_release: bool = False,
    stats_mode: str = "eager",
) -> CorpusResult:
    """Run the full preparation chain; every stage is optional via its
    parameter (``None``/``False`` skips it). Returns the prepared
    corpus plus per-stage surviving-row counts.

    ``gopher_thresholds`` overrides individual Gopher limits (passed
    through to :func:`gopher_filter`) — corpora far from web prose
    (code, logs, synthetic fixtures) fail the published thresholds
    wholesale, and a gate that zeroes the corpus silently is a
    misconfiguration; with ``collect_stats`` on, a ``quality_gate``
    count of 0 is the tell.

    Persistence: two stages consume their input in more than one
    downstream subtree of the SINGLE final action (the quality gate
    semi-join reuses the scrubbed frame; near-dedup reuses the deduped
    frame for pairing AND for the anti-join). With ``collect_stats``
    every stage is cached anyway; with stats off those fork inputs are
    still persisted — otherwise one action re-executes the upstream
    chain once per consumer (observed 4-6x recompute at bench). All
    frames this call persisted are listed in ``CorpusResult.persisted``
    — call ``result.unpersist()`` when done.

    ``eager_release`` (R14, default OFF) unpersists each stage's cache
    as soon as the next stage has materialized, and nudges a JVM GC so
    the dead stage's shuffle files are reclaimed. MEASURED at the 4M
    scale probe (same host, same session family): retained mode 533s,
    eager mode 797-836s — eager is ~1.5x SLOWER (Spark's
    non-cascading cache invalidation recompiles dependent cached
    plans on every unpersist), and it did NOT save the 8M rung from
    its scratch-disk overflow. Keep it OFF unless executor storage
    memory, not scratch disk, is the binding constraint.

    ``stats_mode`` (R15, VERDICT r14 #4): how ``collect_stats`` gets
    its per-stage survivor counts. ``"eager"`` (default) counts each
    cached stage as it is built — one job per stage, and the count
    doubles as the materialization barrier the scale probes' per-stage
    ``stage_secs`` timing needs. ``"observe"`` attaches a
    ``CollectMetrics`` count to each stage BEFORE caching it and runs
    NO per-stage jobs: the caller's first full action over ``df``
    fills every stage cache once (cache-block locks make concurrent
    fan-in consumers wait, not recompute, so each observed count fires
    exactly once per partition) and completes every Observation —
    same ledger numbers, one job instead of stage-count jobs, and the
    stages pipeline inside that job instead of materializing strictly
    in sequence. Read the ledger with ``CorpusResult.resolve_stats()``
    AFTER the action; ``stage_secs`` is empty in this mode (no
    per-stage barrier to time), so the probes keep ``"eager"``. On a
    cluster where executor loss forces stage resubmission, prefer
    ``"eager"`` for audit-grade ledgers: its per-stage count is a plain
    action result, with no reliance on accumulator semantics under
    retried tasks.
    """
    if stats_mode not in ("eager", "observe"):
        raise ValueError(f"stats_mode {stats_mode!r}: 'eager' or 'observe'")
    if stats_mode == "observe" and eager_release:
        raise ValueError(
            "stats_mode='observe' runs no per-stage actions, so there is "
            "no materialization order for eager_release to follow"
        )
    stats: dict[str, int] = {}
    stage_secs: dict[str, float] = {}
    persisted: list = []
    observations: dict = {}
    df = docs
    prev_cached: list = []

    def record(stage: str, frame: DataFrame) -> DataFrame:
        if collect_stats and stats_mode == "observe":
            from pyspark.sql import Observation

            obs = Observation(f"stage_{stage}")
            observations[stage] = obs
            # observe BELOW the cache: the metric node lives inside the
            # cached plan, so it fires exactly once per partition at
            # cache fill — consumers (including in-stage fan-outs) read
            # the cache and never re-fire it
            frame = frame.observe(obs, F.count(F.lit(1)).alias("n")).cache()
            persisted.append(frame)
            return frame
        if collect_stats:
            frame = frame.cache()
            persisted.append(frame)
            t0 = time.perf_counter()
            stats[stage] = frame.count()
            stage_secs[stage] = round(time.perf_counter() - t0, 2)
            if not eager_release:
                return frame
            # R14 (8M probe post-mortem): release the PREVIOUS
            # stage's cache as soon as this stage has materialized
            # from it — the chain is linear, so nothing downstream
            # ever reads an older frame, and keeping every stage
            # cached (MEMORY_AND_DISK spills blocks to disk) held
            # ~11 full copies of the corpus alive at once: at 8M
            # docs that overflowed the host's scratch disk
            # mid-shuffle ("No space left on device" in the span
            # stage). Fork consumers are safe: both subtrees of a
            # forked input are consumed INSIDE the very next
            # record()'s count. The final frame stays cached for
            # the caller (CorpusResult.unpersist()).
            while prev_cached:
                old = prev_cached.pop()
                old.unpersist()
                if old in persisted:
                    persisted.remove(old)
            prev_cached.append(frame)
            # ...and release the dead stages' SHUFFLE files: the
            # ContextCleaner only removes shuffles whose RDDs the JVM
            # has garbage-collected, and its periodic-GC default (30
            # minutes, spark.cleaner.periodicGC.interval) never fires
            # inside one pipeline run — so every completed stage's
            # shuffle stayed on scratch disk for the whole run, and
            # at 8M docs their SUM (not any one stage's peak)
            # overflowed the host. One System.gc() per stage bounds
            # scratch at ~the live stage's footprint; its 0.1-1s cost
            # is noise against any stage this matters for.
            try:
                frame.sparkSession.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001 — cleanup must not fail a run
                pass
        return frame

    def fork(frame: DataFrame) -> DataFrame:
        """Persist an input consumed by >1 downstream subtree (no-op
        when collect_stats already cached it)."""
        if not collect_stats:
            frame = frame.persist()
            persisted.append(frame)
        return frame

    df = record("input", df)
    if blocked_sources:
        # blocklist first even with html=True: it reads only
        # source_col, so running the regexp chain over rows it drops
        # would be pure waste (the module's cheapest-first rule)
        df = record("blocklist", blocklist_filter(df, source_col, blocked_sources))
    if html:
        # before every TEXT stage: PII regexes, quality ratios,
        # shingles, and perplexity must see prose, not markup
        from ..operators.text import strip_html

        df = record("html_strip", strip_html(df, text_col=text_col))
    if normalize_unicode:
        # Unicode hygiene before any hashing stage: visually-equal
        # variants (curly quotes, NBSP, zero-widths) must hash equal
        # or the dedup tiers silently miss them
        from ..operators.text import normalize_text

        df = record("normalize", normalize_text(df, text_col=text_col))
    df = record("pii_scrub", scrub_pii(df, text_col=text_col))
    if line_dedup_min_docs is not None:
        # Boilerplate line removal (the C4 rule, operators/dedup.py)
        # BEFORE the quality gates and the shingle tiers: nav bars and
        # footers repeated across a site both skew the quality ratios
        # (stopword/length stats judge the boilerplate, not the prose)
        # and inflate shingle overlap into false near-dup pairs.
        from ..operators.dedup import remove_duplicate_lines

        df = record(
            "line_dedup",
            remove_duplicate_lines(
                df,
                min_docs=line_dedup_min_docs,
                text_col=text_col,
                id_col=id_col,
            ),
        )
    if quality:
        df = fork(df)
        kept = (
            gopher_filter(
                df, text_col=text_col, id_col=id_col, thresholds=gopher_thresholds
            )
            .where("keep")
            .select(id_col)
        )
        df = record("quality_gate", df.join(kept, id_col, "left_semi"))
    if classifier_model is not None:
        # Learned quality filter (operators/classifier.py — the GPT-3
        # CommonCrawl recipe): one JVM transform pass + the published
        # Pareto keep rule (deterministic per doc_id). After the
        # heuristic gate (cheaper first), before the LM gate (which
        # should judge only documents that might survive).
        from ..operators.classifier import classifier_filter

        df = record(
            "classifier_gate",
            classifier_filter(
                df, classifier_model, text_col=text_col, id_col=id_col,
                alpha=classifier_alpha, seed=classifier_seed,
            ).drop("quality_prob"),
        )
    if perplexity_model is not None and max_perplexity is not None:
        # CCNet-style gate (operators/lm.py): one vectorized UDF pass;
        # the trained model rides by closure. Docs with NULL perplexity
        # (empty text) are dropped — nothing to judge, nothing to train
        # on. Calibrate max_perplexity from ccnet_buckets' tercile cuts
        # on a reference slice.
        from ..operators.lm import score_perplexity

        df = record(
            "perplexity_gate",
            score_perplexity(df, perplexity_model, text_col=text_col)
            .where(f"perplexity <= {float(max_perplexity)}")
            .drop("perplexity"),
        )
    df = record("exact_dedup", exact_dedup(df, text_col=text_col, id_col=id_col))
    if near_dedup_pairs is not None:
        # Precomputed pair feed (VERDICT r6 #5): the streaming
        # incremental sink (streaming/dedup.py) accumulates near-dup
        # pairs O(delta) per micro-batch — a daily pipeline consumes
        # THAT table here instead of re-pairing the whole corpus
        # (which is what near_dedup_threshold below does). Same
        # keep-min resolution, zero similarity work in this process.
        # The pairs must share the corpus id space. Takes precedence
        # over near_dedup_threshold.
        #
        # The feed was computed on the RAW ingest, but this stage runs
        # after the gates — so keep only pairs whose KEEPER (a_id, the
        # min side) survived upstream (one semi-join): a pair whose
        # keeper was gated away must not still condemn its b_id, or a
        # document the in-pipeline path keeps silently vanishes (its
        # sole near-twin being spam is no reason to drop it — review
        # r7). This reproduces the in-pipeline semantics, where pairs
        # only ever form among gate survivors.
        df = fork(df)
        alive = near_dedup_pairs.join(
            df.select(F.col(id_col).alias("a_id")), "a_id", "left_semi"
        )
        df = record("near_dedup", dedup_keep_min(df, alive, id_col=id_col))
    elif near_dedup_threshold is not None:
        df = fork(df)
        pairs = minhash_lsh_pairs(
            df, threshold=near_dedup_threshold, text_col=text_col, id_col=id_col
        )
        # R8: quality-aware resolution (the Dolma/RefinedWeb keep
        # rule) — with a score column stated, each pair keeps its
        # higher-scoring member instead of the smaller id, so dedup
        # discards the boilerplate-laden copy, not the earliest crawl
        if near_dedup_score_col is not None:
            df = record(
                "near_dedup",
                dedup_keep_best(
                    df, pairs, near_dedup_score_col, id_col=id_col
                ),
            )
        else:
            df = record("near_dedup", dedup_keep_min(df, pairs, id_col=id_col))
    if substring_dedup_k is not None:
        # Span-level exact substring dedup (Lee et al. 2021) AFTER the
        # doc-level tiers (whole-doc dups are already gone — cheaper to
        # drop a row than rewrite it) and BEFORE decontamination, so
        # the eval-overlap n-grams see the cleaned text.
        from ..operators.dedup import remove_duplicate_spans

        df = record(
            "substring_dedup",
            remove_duplicate_spans(
                df, k=substring_dedup_k, text_col=text_col, id_col=id_col
            ),
        )
    if test_set is not None:
        df = record(
            "decontaminate",
            decontaminate(
                df, test_set, n=decontam_n, id_col=id_col,
                text_col=text_col, max_gram_df=decontam_max_gram_df,
            ),
        )
    if dsir_target is not None and dsir_k is not None:
        # DSIR selection (operators/corpus.py): importance weights vs
        # the target distribution over the SURVIVING corpus, then the
        # deterministic Gumbel top-k draw. Runs after dedup/decontam so
        # importance mass is not spent on rows already condemned.
        from ..operators.corpus import (
            dsir_bucket_logratio,
            dsir_resample,
            dsir_scores,
        )

        df = fork(df)
        lr = dsir_bucket_logratio(df, dsir_target, text_col=text_col)
        scored = dsir_scores(df, lr, text_col=text_col, id_col=id_col)
        df = record(
            "dsir_select",
            dsir_resample(scored, dsir_k, seed=dsir_seed, id_col=id_col).drop(
                "log_importance"
            ),
        )
    if shuffle_seed is not None:
        df = shuffle_corpus(df, seed=shuffle_seed, id_col=id_col)
    if pack_budget is not None:
        # pack_streams sizes the packing parallelism to the cluster
        # (pack_sequences docstring); 1 collapses the stream hash to a
        # single ordered fill — the exactly-replayable shape pipe1's
        # oracle checks
        df = record(
            "packed",
            pack_sequences(
                df,
                budget=pack_budget,
                id_col=id_col,
                text_col=text_col,
                n_streams=pack_streams,
            ),
        )
    return CorpusResult(
        df=df, stats=stats, stage_secs=stage_secs, persisted=persisted,
        observations=observations,
    )
