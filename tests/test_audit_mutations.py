"""Mutation tests for the oracle-pinned audit booleans (VERDICT r5 #4).

The R5 conversion made every approximate tier's CORRECTNESS row
hash-checked by returning an exact-by-construction result that CARRIES
booleans computed from the live approximate pipeline (lsh_precision_ok
/ lsh_recall_ok / tiers_match / found_at_hamming0), which the DuckDB
oracle pins TRUE. That bar only means something if the booleans are
FALSIFIABLE: a broken pipeline must flip them FALSE (and so flip the
driver's value-hash red). These tests inject the breaks — dead
banding/bucketing (the pipeline finds nothing), phantom pairs (the
pipeline invents matches), a verify step that mis-measures, divergent
tiers — by monkeypatching the operator the declared query calls, then
run the REAL declared query and assert the advertised boolean went
FALSE while unrelated booleans stayed TRUE.

Runs at sf0.01 (SF_ORACLE) — the same fixture scale the driver's
correctness gate replays, so a passing flip here is exactly the red
hash the gate would record.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.plans import northstar
from etl_zero_spark.plans.all_queries import QUERIES
from tests.conftest import SF_ORACLE


def _run(spark, name):
    df = QUERIES[name].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert rows, f"{name} returned no rows — mutation test needs a non-empty result"
    return rows


def _phantom(spark, score_col):
    return spark.createDataFrame(
        [(-2, -1, 1.0)], f"a_id long, b_id long, {score_col} double"
    )


# --- dd3: MinHash + LSH ------------------------------------------------------


def test_dd3_recall_flips_on_dead_banding(spark, monkeypatch):
    """Banding that never yields a candidate (e.g. a band hash seeded
    differently between build and probe) → the LSH pair set is empty →
    lsh_recall_ok must read FALSE on every declared row; precision
    (vacuously no phantom pairs) stays TRUE."""
    real = northstar.dedup.minhash_lsh_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "minhash_lsh_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd3_minhash_lsh_pairs")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


def test_dd3_precision_flips_on_phantom_pair(spark, monkeypatch):
    """A banding/rescore break that INVENTS a pair absent from the
    exact set → lsh_precision_ok must read FALSE; recall (the real
    pairs are all still found) stays TRUE."""
    real = northstar.dedup.minhash_lsh_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "minhash_lsh_pairs",
        lambda df, *a, **kw: real(df, *a, **kw).unionByName(
            _phantom(df.sparkSession, "jaccard")
        ),
    )
    rows = _run(spark, "dd3_minhash_lsh_pairs")
    assert all(not r.lsh_precision_ok for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


# --- dd4: SimHash ------------------------------------------------------------


def test_dd4_found_flips_when_hamming_verify_breaks(spark, monkeypatch):
    """A broken Hamming verify (every distance off by one — e.g. a
    sign-bit slip in the fingerprint) → no planted clone pair is found
    at Hamming 0 → found_at_hamming0 FALSE on every planted row."""
    real = northstar.dedup.simhash_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "simhash_pairs",
        lambda *a, **kw: real(*a, **kw).withColumn(
            "hamming", F.col("hamming") + F.lit(1)
        ),
    )
    rows = _run(spark, "dd4_simhash_pairs")
    assert all(not r.found_at_hamming0 for r in rows)


# --- dd8: embedding near-dup via LSH buckets ---------------------------------


def test_dd8_recall_flips_on_dead_buckets(spark, monkeypatch):
    real = northstar.similarity.lsh_neardup_pairs
    monkeypatch.setattr(
        northstar.similarity,
        "lsh_neardup_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd8_neardup_lsh")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


def test_dd8_precision_flips_on_phantom_pair(spark, monkeypatch):
    real = northstar.similarity.lsh_neardup_pairs
    monkeypatch.setattr(
        northstar.similarity,
        "lsh_neardup_pairs",
        lambda emb, *a, **kw: real(emb, *a, **kw).unionByName(
            _phantom(emb.sparkSession, "cosine")
        ),
    )
    rows = _run(spark, "dd8_neardup_lsh")
    assert all(not r.lsh_precision_ok for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


# --- sim2/sim3: sign-LSH ANN tiers -------------------------------------------


def test_sim23_tiers_match_flips_on_divergent_tier(spark, monkeypatch):
    """The distributed tier dropping its rank-1 rows at the REAL
    geometry (the exact n_planes=0 calls are untouched, so the
    declared rows themselves are intact) → tiers_match FALSE."""
    real = northstar.similarity.lsh_partitioned_topk
    def mutated(q, c, *a, **kw):
        out = real(q, c, *a, **kw)
        if kw.get("n_planes") == 6:
            out = out.where(F.col("rank") != 1)
        return out
    monkeypatch.setattr(northstar.similarity, "lsh_partitioned_topk", mutated)
    rows = _run(spark, "sim2_sim3_lsh_topk")
    assert all(not r.tiers_match for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


def test_sim23_recall_flips_on_empty_real_geometry(spark, monkeypatch):
    """The broadcast tier finding nothing at the real geometry (the
    exact n_planes=0 call is untouched) → real-geometry recall 0 →
    lsh_recall_ok FALSE."""
    real = northstar.similarity.lsh_bucketed_topk
    def mutated(q, c, *a, **kw):
        out = real(q, c, *a, **kw)
        if kw.get("n_planes") != 0:
            out = out.limit(0)
        return out
    monkeypatch.setattr(northstar.similarity, "lsh_bucketed_topk", mutated)
    rows = _run(spark, "sim2_sim3_lsh_topk")
    assert all(not r.lsh_recall_ok for r in rows)


# --- dd9: incremental near-dedup ---------------------------------------------


def test_dd9_recall_flips_on_dead_probe(spark, monkeypatch):
    """An index probe that never matches (e.g. band hashes computed
    with a different seed than the index build) → zero incremental
    pairs → lsh_recall_ok FALSE, precision vacuously TRUE."""
    real = northstar.dedup.incremental_minhash_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "incremental_minhash_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd9_incremental_neardup")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


# --- sdd1: SemDeDup cluster-local semantic dedup -----------------------------


def test_sdd1_recall_flips_on_dead_clustering(spark, monkeypatch):
    """A production multi-cluster pass that finds nothing (e.g. the
    assignment UDF scoring against the wrong centroid matrix so no two
    near-dups share a cluster) → cluster_recall_ok FALSE on every
    declared row; the single-cluster exact twin (centroids with one
    row) is untouched and precision stays vacuously TRUE."""
    real = northstar.similarity.semantic_dedup_pairs

    def mutated(emb, centroids, *a, **kw):
        out = real(emb, centroids, *a, **kw)
        return out.limit(0) if len(centroids) > 1 else out

    monkeypatch.setattr(northstar.similarity, "semantic_dedup_pairs", mutated)
    rows = _run(spark, "sdd1_semantic_dedup")
    assert all(not r.cluster_recall_ok for r in rows)
    assert all(r.semdedup_precision_ok for r in rows)


def test_sdd1_precision_flips_on_phantom_pair(spark, monkeypatch):
    """A production pass inventing a pair no exact GEMM would emit
    (broken assignment putting far-apart vectors in one cluster plus a
    broken rescore) → semdedup_precision_ok FALSE; recall is computed
    from the surviving REAL pairs and stays TRUE."""
    real = northstar.similarity.semantic_dedup_pairs

    def mutated(emb, centroids, *a, **kw):
        out = real(emb, centroids, *a, **kw)
        if len(centroids) > 1:
            out = out.unionByName(_phantom(emb.sparkSession, "cosine"))
        return out

    monkeypatch.setattr(northstar.similarity, "semantic_dedup_pairs", mutated)
    rows = _run(spark, "sdd1_semantic_dedup")
    assert all(not r.semdedup_precision_ok for r in rows)
    assert all(r.cluster_recall_ok for r in rows)


# --- mix1: exact-quota corpus mixing (R8) -----------------------------------


def test_mix1_realized_flips_on_sabotaged_quota(spark, monkeypatch):
    """A selection that under-fills every quota by one row (e.g. an
    off-by-one in the take window) → realized != allocated → the
    realized_matches boolean must read FALSE on every source row,
    flipping the driver's value hash; the arithmetic ledger columns
    (available/allocated) stay what the oracle recomputes."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.stratified_take

    def short(df, source_col, quotas, id_col, seed):
        return real(
            df, source_col, {s: max(q - 1, 0) for s, q in quotas.items()},
            id_col, seed,
        )

    monkeypatch.setattr(corp, "stratified_take", short)
    rows = _run(spark, "mix1_corpus_mix")
    assert all(not r.realized_matches for r in rows)
    assert all(r.realized == r.allocated - 1 for r in rows)
    assert {r.source: r.allocated for r in rows} == {
        "src0": 25, "src1": 19, "src2": 6,
    }


def test_mix1_nested_flips_on_unstable_selection(spark, monkeypatch):
    """A selection whose hash order drifts between budgets (e.g. a
    seed that leaks run state) breaks the nesting guarantee — the
    24-doc sample is no longer a subset of the 50-doc one → nested_ok
    must read FALSE while the per-source counts still match their
    quotas (realized_matches stays TRUE)."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.stratified_take
    calls = []

    def drifting(df, source_col, quotas, id_col, seed):
        calls.append(1)
        return real(df, source_col, quotas, id_col, seed + len(calls))

    monkeypatch.setattr(corp, "stratified_take", drifting)
    rows = _run(spark, "mix1_corpus_mix")
    assert all(not r.nested_ok for r in rows)
    assert all(r.realized_matches for r in rows)


# --- split1: leakage-safe splitting + hardening (R10) ------------------------


def test_split1_fractions_flip_on_collapsed_assignment(spark, monkeypatch):
    """An assignment bug that funnels every row into one split (e.g. a
    cumulative-interval off-by-all) → fractions_ok FALSE on every row
    (train overshoots its band, val/test undershoot theirs) while the
    partition stays total (totality_ok TRUE) and the heldout booleans
    go vacuously TRUE (there is no heldout left to damage)."""
    from etl_zero_spark.operators import corpus as corp

    def collapsed(df, fractions, id_col="doc_id", seed=42, split_col="split"):
        return df.withColumn(split_col, F.lit("train"))

    monkeypatch.setattr(corp, "split_corpus", collapsed)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.fractions_ok for r in rows)
    assert all(r.totality_ok for r in rows)


def test_split1_totality_flips_on_unnamed_split(spark, monkeypatch):
    """Rows leaking into a split name outside the declared fractions
    (e.g. a CASE fall-through returning a raw hash bucket) → the named
    splits no longer sum to the corpus → totality_ok FALSE."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.split_corpus

    def leaky(df, fractions, id_col="doc_id", seed=42, split_col="split"):
        out = real(df, fractions, id_col=id_col, seed=seed, split_col=split_col)
        return out.withColumn(
            split_col,
            F.when(F.col(id_col) % 10 == 0, F.lit("orphan")).otherwise(
                F.col(split_col)
            ),
        )

    monkeypatch.setattr(corp, "split_corpus", leaky)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.totality_ok for r in rows)


def test_split1_growth_stability_flips_on_state_dependent_seed(
    spark, monkeypatch
):
    """An assignment whose hash leaks run state (mix1's drifting-seed
    shape — or any rank/percentile-based splitter, which is exactly
    what randomSplit does) assigns the doc_id%2==0 subset differently
    from the full corpus → growth_stable_ok FALSE; the per-call
    fractions stay uniform so fractions_ok stays TRUE."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.split_corpus
    calls = []

    def drifting(df, fractions, id_col="doc_id", seed=42, split_col="split"):
        calls.append(1)
        return real(
            df, fractions, id_col=id_col, seed=seed + len(calls),
            split_col=split_col,
        )

    monkeypatch.setattr(corp, "split_corpus", drifting)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.growth_stable_ok for r in rows)
    assert all(r.fractions_ok for r in rows)


def test_split1_heldout_flips_when_hardening_touches_heldout(
    spark, monkeypatch
):
    """A hardening that drops the HELDOUT member instead of (or along
    with) the train twin — the exact bug the eval-comparability rule
    exists to prevent — must flip heldout_untouched_ok FALSE."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.harden_split

    def overzealous(df, **kw):
        out, ledger = real(df, **kw)
        held = kw.get("heldout_splits", ("val", "test"))
        split_col = kw.get("split_col", "split")
        id_col = kw.get("id_col", "doc_id")
        victim = (
            df.where(F.col(split_col).isin(*held))
            .select(F.min(id_col).alias("v"))
            .collect()[0]["v"]
        )
        return out.where(F.col(id_col) != F.lit(victim)), ledger

    monkeypatch.setattr(corp, "harden_split", overzealous)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.heldout_untouched_ok for r in rows)


def test_split1_crossings_flip_when_hardening_drops_nothing(
    spark, monkeypatch
):
    """A no-op hardening (dead LSH banding, empty pair feed) leaves the
    planted cross-boundary twins' train members in place →
    crossings_dropped_ok FALSE; the self-consistent zero ledger keeps
    ledger_ok TRUE (the booleans must fail independently)."""
    from etl_zero_spark.operators import corpus as corp

    def noop(df, **kw):
        held = kw.get("heldout_splits", ("val", "test"))
        split_col = kw.get("split_col", "split")
        tb = df.where(~F.col(split_col).isin(*held)).count()
        return df, {
            "train_before": tb,
            "leaked_dropped": 0,
            "train_after": tb,
        }

    monkeypatch.setattr(corp, "harden_split", noop)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.crossings_dropped_ok for r in rows)
    assert all(r.ledger_ok for r in rows)
    assert all(r.heldout_untouched_ok for r in rows)


def test_split1_ledger_flips_on_miscounted_drop(spark, monkeypatch):
    """A ledger that undercounts the dropped twins (e.g. counting
    pairs instead of distinct condemned ids) breaks the
    before - dropped == after arithmetic → ledger_ok FALSE while the
    frame-level booleans stay TRUE."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.harden_split

    def miscounted(df, **kw):
        out, ledger = real(df, **kw)
        ledger = dict(ledger)
        ledger["leaked_dropped"] = ledger["leaked_dropped"] + 1
        return out, ledger

    monkeypatch.setattr(corp, "harden_split", miscounted)
    rows = _run(spark, "split1_corpus_split")
    assert all(not r.ledger_ok for r in rows)
    assert all(r.crossings_dropped_ok for r in rows)


# --- q1: Gopher gate's greedy dup-ngram pin (R10) ----------------------------


def test_q1_greedy_flips_on_naive_window_count(spark, monkeypatch):
    """The classic wrong implementation — counting every repeated
    window instead of consuming n tokens on a hit — diverges from the
    published greedy scan exactly on the overlapping-repeat planted doc
    (abcde x3), so at least that greedy_ok must flip FALSE; the
    non-overlapping planted doc agrees under both definitions and
    stays TRUE (the pin distinguishes the algorithms, not just
    'returns numbers')."""
    from etl_zero_spark.operators import quality

    def naive_udf(ns):
        @F.pandas_udf("array<double>")
        def scan(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                words = [w for w in text.lower().split() if w]
                total = len(text)
                fracs = []
                for n in ns:
                    if len(words) < n or total == 0:
                        fracs.append(0.0)
                        continue
                    seen: set = set()
                    repeated = 0
                    for i in range(len(words) - n + 1):
                        gram = " ".join(words[i : i + n])
                        if gram in seen:
                            repeated += len(gram)
                        else:
                            seen.add(gram)
                    fracs.append(round(repeated / total, 6))
                out.append(fracs)
            return pd.Series(out)

        return scan

    monkeypatch.setattr(quality, "_dup_ngram_udf", naive_udf)
    rows = _run(spark, "q1_gopher_gate")
    planted = [r for r in rows if r.tag == "planted"]
    assert len(planted) == 3
    flipped = {r.key: r.greedy_ok for r in planted}
    assert flipped[10_000_003] is False  # overlapping repeats diverge
    assert flipped[10_000_002] is True  # no repeats: both agree


# ---------------------------------------------------------------------------
# ct1_decontamination (R11, VERDICT r10 #2): the capped tier is
# hash-checked BEHAVIOR — a cap that silently stops applying must
# change the declared rows (the driver's value-hash goes red)
# ---------------------------------------------------------------------------


def test_ct1_capped_tier_flips_on_ignored_cap(spark, monkeypatch):
    """Mutation: the contamination scan ignores the hot-gram cap (the
    bound that keeps the 100 TB join fan-out linear). The declared
    query's 'capped' tier must then regain the planted hot-gram pairs —
    i.e. differ row-for-row from the committed oracle expectation —
    while the 'exact' tier stays identical. (R14: ct1 computes both
    tiers through cross_corpus_contamination_tiered, so the sabotage
    targets that seam — a cap pushed beyond every gram's df is exactly
    'the cap stopped applying'.)"""
    from etl_zero_spark.operators import corpus as corpus_ops

    healthy = {
        (r.tier, r.test_id, r.train_id, r.shared_ngrams)
        for r in _run(spark, "ct1_decontamination")
    }
    h_exact = {t for t in healthy if t[0] == "exact"}
    h_capped = {t for t in healthy if t[0] == "capped"}
    # the plant worked: hot pairs exist in exact and are absent capped
    assert len(h_exact) > len(h_capped)

    orig = corpus_ops.cross_corpus_contamination_tiered

    def no_cap(train, test, **kw):
        kw["capped_gram_df"] = 1_000_000_000
        return orig(train, test, **kw)

    monkeypatch.setattr(
        corpus_ops, "cross_corpus_contamination_tiered", no_cap
    )
    mutated = {
        (r.tier, r.test_id, r.train_id, r.shared_ngrams)
        for r in _run(spark, "ct1_decontamination")
    }
    m_exact = {t for t in mutated if t[0] == "exact"}
    m_capped = {t for t in mutated if t[0] == "capped"}
    assert m_exact == h_exact  # the exact tier is cap-independent
    assert m_capped != h_capped  # the dead cap flips the hash-checked rows
    # and it flips in the telling direction: the planted hot pairs return
    assert len(m_capped) > len(h_capped)
