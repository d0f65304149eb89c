"""Self-consistency tests for the hash-based dedup operators (SURVEY
§5.2 rows-only side): MinHash recall vs the exact Jaccard oracle,
SimHash banding guarantees, keep-min resolution."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import dedup
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_minhash_recall_and_precision(spark, docs):
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    # precision 1.0 by construction (exact rescore) ...
    assert set(approx) <= set(exact)
    for pair, jac in approx.items():
        assert jac == pytest.approx(exact[pair], abs=1e-6)
    # ... and banding recall must be high (32x2 bands @ t=0.3)
    if exact:
        assert len(approx) / len(exact) >= 0.8


def test_simhash_pairs_verified_hamming(spark, docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    assert pairs.where(F.col("hamming") > 3).count() == 0
    fps = dedup.simhash_fingerprints(docs)
    # fingerprints are deterministic across runs
    a = {(r.id, r.simhash) for r in fps.collect()}
    b = {(r.id, r.simhash) for r in dedup.simhash_fingerprints(docs).collect()}
    assert a == b


def test_identical_texts_are_caught_by_all_signatures(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank"),
            (3, "completely different words about spark catalyst optimizer plans"),
        ],
        ["doc_id", "text"],
    )
    exact = dedup.ngram_jaccard_pairs(df, threshold=0.99).collect()
    assert [(r.a_id, r.b_id) for r in exact] == [(1, 2)]
    mh = dedup.minhash_lsh_pairs(df, threshold=0.99).collect()
    assert [(r.a_id, r.b_id) for r in mh] == [(1, 2)]
    sh = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert [(r.a_id, r.b_id) for r in sh] == [(1, 2)]


def test_dedup_keep_min(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3)
    kept = dedup.dedup_keep_min(docs, pairs)
    n_docs, n_kept = docs.count(), kept.count()
    n_dropped = pairs.select("b_id").distinct().count()
    assert n_kept == n_docs - n_dropped
    # survivors ⊆ input
    assert kept.join(docs, "doc_id", "left_anti").count() == 0


def test_transitive_dedup_collapses_chains(spark):
    """pairs {(2,3), (1,3)}: single-pass keep-min keeps {1, 2} (only
    b-sides drop), but 1~3~2 is one component -> transitive keeps {1}."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"d{i}") for i in [1, 2, 3, 9]]
    )
    pairs = spark.createDataFrame(
        [Row(a_id=2, b_id=3), Row(a_id=1, b_id=3)]
    )
    single = {r.doc_id for r in dedup.dedup_keep_min(docs, pairs).collect()}
    assert single == {1, 2, 9}
    trans = {r.doc_id for r in dedup.dedup_transitive(docs, pairs).collect()}
    assert trans == {1, 9}


@pytest.mark.parametrize("reliable", [False, True])
def test_connected_components_long_chain(spark, tmp_path, reliable):
    """A 5-link chain needs multiple propagation rounds; every node must
    end labeled with the chain minimum — in both checkpoint tiers
    (executor-local and the reliable store a cluster run needs)."""
    from pyspark.sql import Row

    pairs = spark.createDataFrame(
        [Row(a_id=i, b_id=i + 1) for i in range(10, 15)]
        + [Row(a_id=100, b_id=101)]
    )
    labels = {
        r.id: r.label
        for r in dedup.connected_components(
            pairs,
            use_reliable_checkpoint=reliable,
            checkpoint_dir=str(tmp_path / "ckpt") if reliable else None,
        ).collect()
    }
    assert {k: v for k, v in labels.items() if k < 100} == {
        i: 10 for i in range(10, 16)
    }
    assert labels[100] == labels[101] == 100


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter without a fixpoint must fail loudly (the
    labels would silently keep duplicates), unless the caller opts into
    a partial pre-clustering."""
    from pyspark.sql import Row

    chain = spark.createDataFrame([Row(a_id=i, b_id=i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="max_iter"):
        dedup.connected_components(chain, max_iter=2)
    with pytest.warns(RuntimeWarning, match="max_iter"):
        partial = dedup.connected_components(chain, max_iter=2, allow_partial=True)
    assert partial.count() == 9


def test_dedup_transitive_forwards_cc_kwargs(spark):
    """Cluster callers tune the CC loop through dedup_transitive."""
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(doc_id=i, text=f"d{i}") for i in range(8)])
    pairs = spark.createDataFrame([Row(a_id=i, b_id=i + 1) for i in range(7)])
    with pytest.raises(RuntimeError, match="max_iter"):
        dedup.dedup_transitive(docs, pairs, max_iter=1)
    out = {
        r.doc_id
        for r in dedup.dedup_transitive(
            docs, pairs, max_iter=10, shuffle_partitions=8
        ).collect()
    }
    assert out == {0}


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "same"), (2, "same"), (9, "other")], ["doc_id", "text"]
    )
    out = {(r.doc_id, r.text) for r in dedup.exact_dedup(df).collect()}
    assert out == {(2, "same"), (9, "other")}


def test_exact_dedup_keeps_full_winning_row(spark):
    """R7: every column of the smallest-id row survives (metadata must
    ride through a pipeline), in the original column order."""
    df = spark.createDataFrame(
        [(5, "same", "web"), (2, "same", "code"), (9, "other", "web")],
        ["doc_id", "text", "source"],
    )
    out = dedup.exact_dedup(df)
    assert out.columns == ["doc_id", "text", "source"]
    rows = {(r.doc_id, r.text, r.source) for r in out.collect()}
    assert rows == {(2, "same", "code"), (9, "other", "web")}


def _labels(df):
    return {r.id: r.label for r in df.collect()}


def test_star_cc_matches_label_propagation(spark):
    """The O(log n) alternating small-star/large-star backend must agree
    with min-label propagation on chains, stars, cliques, random graphs
    and disjoint components."""
    import random

    from pyspark.sql import Row

    cases = {
        "long_chain": [(i, i + 1) for i in range(30)],
        "two_comps": [(1, 2), (2, 3), (10, 11), (12, 11)],
        "star": [(50, 50 + i) for i in range(1, 8)],
        "clique": [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "dup_and_reversed": [(5, 6), (6, 5), (5, 6)],
    }
    rng = random.Random(13)
    cases["random"] = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    for name, edges in cases.items():
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in edges])
        want = _labels(dedup.connected_components(pairs))
        got = _labels(dedup.connected_components_star(pairs))
        assert got == want, f"{name}: star != label-prop"


def test_star_cc_rounds_beat_diameter(spark):
    """A 60-link chain (diameter 60) must converge in far fewer star
    rounds than label propagation would need — the point of the
    algorithm. max_iter=10 would make label propagation raise."""
    from pyspark.sql import Row

    pairs = spark.createDataFrame([Row(a_id=i, b_id=i + 1) for i in range(60)])
    labels = _labels(dedup.connected_components_star(pairs, max_iter=10))
    assert labels == {i: 0 for i in range(61)}


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_prefix_filter_matches_full_index(spark, docs, threshold):
    """The AllPairs prefix filter must return EXACTLY the pairs of the
    full inverted index at every threshold — it prunes candidates, never
    results."""
    full = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=threshold, prefix_filter=False
        ).collect()
    }
    pref = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=threshold, prefix_filter=True
        ).collect()
    }
    assert set(pref) == set(full)
    for pair in full:
        assert pref[pair] == pytest.approx(full[pair], abs=1e-6)


def test_prefix_filter_planted_near_identical(spark):
    """High-threshold regime (the real dedup use case): near-identical
    long documents must be found through the tiny prefix index."""
    base = " ".join(f"word{i}" for i in range(40))
    variant = " ".join(f"word{i}" for i in range(39)) + " tail"
    other = " ".join(f"zz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, variant), (4, other)], ["doc_id", "text"]
    )
    found = {
        (r.a_id, r.b_id)
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert (1, 2) in found  # identical
    assert (1, 3) in found and (2, 3) in found  # one-word tail change
    assert not any(4 in p for p in found)


def test_df_cap_exact_when_no_stop_shingles(spark, docs):
    """With every shingle's document frequency under the cap, the capped
    discovery+rescore path must return EXACTLY the uncapped counting
    join's pairs and values (the cap is recall-neutral until it
    engages)."""
    uncapped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, df_cap=None
        ).collect()
    }
    capped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, df_cap=10_000
        ).collect()
    }
    assert set(capped) == set(uncapped)
    for pair in uncapped:
        assert capped[pair] == pytest.approx(uncapped[pair], abs=1e-6)


def test_df_cap_bounds_pathological_shared_shingle(spark):
    """One boilerplate shingle shared by ALL docs (the 100 TB quadratic
    hole): under the cap the stop shingle leaves the discovery index, so
    boilerplate-only overlaps emit ZERO candidate pairs instead of
    n^2/2, while pairs that also share a sub-cap shingle keep their
    EXACT Jaccard (full-array rescore)."""
    boiler = "all rights reserved"
    n = 40
    # docs 0..n-1: boilerplate + unique filler -> pairwise overlap is the
    # boilerplate shingle ONLY (jaccard 1/9 for 5-token docs, k=3).
    rows = [(i, f"{boiler} u{i}a u{i}b") for i in range(n)]
    # docs 100/101: boilerplate + a shared rare tail -> a real near-dup
    # pair discoverable through sub-cap shingles.
    rows += [(100, f"{boiler} same tail here"), (101, f"{boiler} same tail here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.05, df_cap=5
        ).collect()
    }
    # the boilerplate-only pairs (every pair among 0..n-1) are gone ...
    assert all(a == 100 and b == 101 for a, b in capped)
    # ... the rare-shingle near-dup survives with its exact value
    # (identical docs -> jaccard 1.0)
    assert capped[(100, 101)] == pytest.approx(1.0, abs=1e-6)

    # uncapped oracle: the boilerplate pairs DO qualify at t=0.05 —
    # n^2/2 filler pairs, plus each filler doc pairing with 100 AND 101
    # through the same boilerplate shingle, plus the real pair. This is
    # exactly the quadratic candidate blow-up the cap exists to prevent.
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.05, df_cap=None)
    assert uncapped.count() == n * (n - 1) // 2 + 2 * n + 1


def test_precomputed_stop_shingles_match_inline_probe(spark):
    """compute_stop_shingles + stop_shingles= (the cached path the
    declared queries and any recurring pipeline use) must return
    exactly the inline probe's pairs; an empty precomputed set is the
    no-stop-shingles assertion (zero probe jobs, uncapped-identical
    plan)."""
    boiler = "all rights reserved"
    rows = [(i, f"{boiler} u{i}a u{i}b") for i in range(40)]
    rows += [(100, f"{boiler} same tail here"), (101, f"{boiler} same tail here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stop = dedup.compute_stop_shingles(df, df_cap=5)
    assert stop == [boiler]
    inline = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.05, df_cap=5).collect()
    }
    cached = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.05, df_cap=5, stop_shingles=stop
        ).collect()
    }
    assert set(cached) == set(inline)
    for pair, j in inline.items():
        assert cached[pair] == pytest.approx(j, abs=1e-6)
    # under the doc-count short-circuit the resolved set is empty and
    # the empty-set fast path equals the uncapped result
    small = spark.createDataFrame(rows[:10], ["doc_id", "text"])
    assert dedup.compute_stop_shingles(small, df_cap=10_000) == []
    a = dedup.ngram_jaccard_pairs(small, threshold=0.05, stop_shingles=[]).collect()
    b = dedup.ngram_jaccard_pairs(small, threshold=0.05, df_cap=None).collect()
    assert sorted((r.a_id, r.b_id, r.jaccard) for r in a) == sorted(
        (r.a_id, r.b_id, r.jaccard) for r in b
    )


def test_stop_shingles_without_df_cap_still_repairs_counts(spark):
    """ADVICE r5: an explicit stop_shingles=[...] with df_cap=None
    still drops those shingles from the counting join, so the
    exact-hybrid repair must run — the repair was gated on df_cap and
    this combination understated Jaccard (missing pairs). Pairs
    sharing BOTH the stop shingle and sub-cap shingles must report the
    same exact Jaccard as with the cap set."""
    boiler = "all rights reserved"
    rows = [(i, f"{boiler} u{i}a u{i}b") for i in range(40)]
    rows += [(100, f"{boiler} same tail here"), (101, f"{boiler} same tail here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.05, df_cap=None, stop_shingles=[boiler]
        ).collect()
    }
    # identical docs share the stop shingle AND rare shingles: without
    # the repair their jaccard reads 8/9 ≈ 0.889 instead of 1.0
    assert got[(100, 101)] == pytest.approx(1.0, abs=1e-6)
    # boilerplate-only pairs still (documented recall contract) absent
    assert all(a == 100 and b == 101 for a, b in got)


def test_df_cap_applies_to_prefix_path(spark):
    """The cap must also bound the prefix (t>=0.5) index: a stop shingle
    inside prefixes is excluded, sub-cap discovery still finds the
    planted near-identical pair exactly."""
    boiler = "all rights reserved"
    rows = [(i, f"{boiler} u{i}a u{i}b") for i in range(20)]
    rows += [(100, f"{boiler} same tail here"), (101, f"{boiler} same tail here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.5, prefix_filter=True, df_cap=5
        ).collect()
    }
    assert capped == {(100, 101): pytest.approx(1.0, abs=1e-6)}


# --- incremental near-dedup --------------------------------------------------


def test_incremental_equals_full_rerun(spark, sf_dir):
    """pairs(corpus) ∪ incremental(delta, index(corpus)) == pairs(corpus ∪ delta):
    the daily-ingest path composes to exactly the full re-pairing."""
    from etl_zero_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    delta = docs.where(F.col("doc_id") >= 400)
    t = 0.3

    def pairset(df):
        return {(r.a_id, r.b_id, r.jaccard) for r in df.collect()}

    full = pairset(minhash_lsh_pairs(docs, threshold=t))
    base = pairset(minhash_lsh_pairs(corpus, threshold=t))
    idx = build_minhash_index(corpus)
    inc = pairset(incremental_minhash_pairs(delta, idx, threshold=t))
    assert base | inc == full
    assert base & inc == set()  # incremental never re-emits corpus pairs


def test_incremental_delta_vs_index_only_drops_within_block(spark, sf_dir):
    """delta_vs_index_only keeps exactly the boundary-crossing subset:
    pairs with one member per side, never delta-vs-delta — the
    leakage_pairs contract (R10 advice: without it harden_split paid a
    train-vs-train LSH self-join + rescore at ~whole-corpus scale just
    to discard the pairs)."""
    from etl_zero_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    delta = docs.where(F.col("doc_id") >= 400)
    t = 0.3

    def pairset(df):
        return {(r.a_id, r.b_id, r.jaccard) for r in df.collect()}

    idx = build_minhash_index(corpus)
    both = pairset(incremental_minhash_pairs(delta, idx, threshold=t))
    cross_only = pairset(
        incremental_minhash_pairs(
            delta, idx, threshold=t, delta_vs_index_only=True
        )
    )
    expected = {
        p for p in both if (p[0] < 400) != (p[1] < 400)  # one member/side
    }
    assert cross_only == expected
    assert cross_only <= both


def test_extend_index_chains_days(spark, sf_dir):
    """Two delta days through extend_minhash_index reach the same pair
    universe as one big re-run."""
    from etl_zero_spark.operators.dedup import (
        build_minhash_index,
        extend_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    day0 = docs.where(F.col("doc_id") < 300)
    day1 = docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    day2 = docs.where(F.col("doc_id") >= 400)
    t = 0.3

    def pairset(df):
        return {(r.a_id, r.b_id) for r in df.collect()}

    idx = build_minhash_index(day0)
    p0 = pairset(minhash_lsh_pairs(day0, threshold=t))
    p1 = pairset(incremental_minhash_pairs(day1, idx, threshold=t))
    idx = extend_minhash_index(idx, day1)
    p2 = pairset(incremental_minhash_pairs(day2, idx, threshold=t))
    full = pairset(minhash_lsh_pairs(docs, threshold=t))
    assert p0 | p1 | p2 == full


def test_incremental_empty_delta(spark, sf_dir):
    from etl_zero_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = build_minhash_index(docs)
    empty = docs.where(F.lit(False))
    assert incremental_minhash_pairs(empty, idx).count() == 0


def test_incremental_rejects_reused_ids_when_checked(spark):
    """R5: check_disjoint_ids catches a delta that reuses indexed ids
    (pairs would alias) with a limit-1 semi-join probe; disjoint deltas
    pass, and the default skips the probe job entirely."""
    rows = [(i, f"doc {i} alpha beta gamma delta") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = dedup.build_minhash_index(df)
    reused = spark.createDataFrame(rows[:3], ["doc_id", "text"])
    with pytest.raises(ValueError, match="reuses indexed ids"):
        dedup.incremental_minhash_pairs(reused, idx, check_disjoint_ids=True)
    fresh = spark.createDataFrame(
        [(100 + i, t) for i, t in rows[:3]], ["doc_id", "text"]
    )
    out = dedup.incremental_minhash_pairs(fresh, idx, check_disjoint_ids=True)
    assert out.count() > 0  # identical texts pair with their originals


def test_exact_tier_refuses_oversized_corpus(spark):
    """R6 (VERDICT r5 #7): ngram_jaccard_pairs is the expensive verify
    tier — above max_exact_docs it refuses with a pointer to the
    banded LSH tier (like reshape's pivot bound); None disables."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        dedup.ngram_jaccard_pairs(df, max_exact_docs=5)
    # at or under the bound: runs; guard disabled: runs
    assert dedup.ngram_jaccard_pairs(df, max_exact_docs=10).count() >= 0
    assert dedup.ngram_jaccard_pairs(df, max_exact_docs=None).count() >= 0


def test_guard_count_skipped_on_cached_stop_shingle_path(spark, monkeypatch):
    """Code-review r6: the max_exact_docs guard must not re-add a
    per-call corpus count to the precomputed-stop-shingles path (the
    cached recurring-pipeline regime r4/r5 optimized)."""
    df = spark.createDataFrame(
        [(i, f"doc number {i} here") for i in range(10)], ["doc_id", "text"]
    )
    calls = []
    real = type(df).count

    def counting(self):
        calls.append(1)
        return real(self)

    monkeypatch.setattr(type(df), "count", counting)
    dedup.ngram_jaccard_pairs(df, threshold=0.3, stop_shingles=[]).collect()
    assert not calls  # zero driver count() jobs on the cached path


# --- keep-best resolution (R8, the Dolma/RefinedWeb keep rule) --------------


def _kb_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a", 0.2),
            (2, "a", 0.9),   # best of {1,2,3}
            (3, "a", 0.9),   # ties 2 -> greater id loses
            (4, "b", 0.5),
            (5, "b", None),  # null score loses to any score
            (6, "c", 0.1),   # unpaired: always survives
        ],
        "doc_id long, text string, quality double",
    )


def _kb_pairs(spark, rows):
    return spark.createDataFrame(rows, "a_id long, b_id long")


def test_keep_best_pairwise(spark):
    df = _kb_corpus(spark)
    pairs = _kb_pairs(spark, [(1, 2), (2, 3), (4, 5)])
    kept = {
        r.doc_id
        for r in dedup.dedup_keep_best(df, pairs, "quality").collect()
    }
    # 1 loses to 2 (score), 3 loses to 2 (tie -> greater id),
    # 5 loses to 4 (null), 6 untouched
    assert kept == {2, 4, 6}


def test_keep_best_transitive_chain(spark):
    """A~B~C with the ENDS beating the middle: pairwise drops only the
    losers of stated pairs (B), transitive keeps exactly one survivor
    per component (the best overall)."""
    df = spark.createDataFrame(
        [(1, 0.8), (2, 0.1), (3, 0.9)], "doc_id long, quality double"
    )
    pairs = _kb_pairs(spark, [(1, 2), (2, 3)])
    pairwise = {
        r.doc_id
        for r in dedup.dedup_keep_best(df, pairs, "quality").collect()
    }
    assert pairwise == {1, 3}  # B lost both its pairs
    trans = {
        r.doc_id
        for r in dedup.dedup_keep_best(
            df, pairs, "quality", transitive=True
        ).collect()
    }
    assert trans == {3}  # one survivor per component, highest score


def test_keep_best_reduces_to_keep_min_on_negated_id(spark):
    """score = -doc_id makes 'best' = smallest id: keep_best must then
    agree exactly with dedup_keep_min on both policies."""
    df = _kb_corpus(spark).withColumn("negid", -F.col("doc_id"))
    pairs = _kb_pairs(spark, [(1, 2), (2, 3), (4, 5)])
    want = {r.doc_id for r in dedup.dedup_keep_min(df, pairs).collect()}
    got = {
        r.doc_id for r in dedup.dedup_keep_best(df, pairs, "negid").collect()
    }
    assert got == want


def test_keep_best_transitive_ignores_absent_members(spark):
    """R8 review: a pair feed computed upstream of a gate can reference
    ids already removed from df — the component keeper must be elected
    among PRESENT members only, and a component with absent members
    still keeps exactly one present copy."""
    df = spark.createDataFrame(
        [(2, 0.4), (3, 0.7)], "doc_id long, quality double"
    )  # doc 1 was gated away upstream
    pairs = _kb_pairs(spark, [(1, 2), (2, 3)])
    kept = {
        r.doc_id
        for r in dedup.dedup_keep_best(
            df, pairs, "quality", transitive=True
        ).collect()
    }
    assert kept == {3}  # best PRESENT member survives, never zero


def test_keep_best_pairwise_ghost_never_condemns_present(spark):
    """Second R8 review pass: a pair whose other side was gated away
    upstream (absent from df) must never drop its PRESENT partner —
    even when the present doc's score is NULL (it used to tie the
    ghost at -inf and lose on the id tie-break)."""
    df = spark.createDataFrame(
        [(5, None), (7, 0.3)], "doc_id long, quality double"
    )
    pairs = _kb_pairs(spark, [(3, 5), (9, 7)])  # 3 and 9 absent
    kept = {
        r.doc_id
        for r in dedup.dedup_keep_best(df, pairs, "quality").collect()
    }
    assert kept == {5, 7}
