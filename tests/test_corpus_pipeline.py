"""End-to-end corpus preparation: composition order, stage accounting,
deterministic shuffle, blocklist filtering."""

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.corpus import blocklist_filter, shuffle_corpus
from etl_zero_spark.plans.corpus_pipeline import prepare_corpus

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# shuffle_corpus
# --------------------------------------------------------------------------


def test_shuffle_is_deterministic_permutation(spark):
    docs = load_table(spark, SF, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]

    a = [r["doc_id"] for r in shuffle_corpus(docs, seed=1).select("doc_id").collect()]
    b = [r["doc_id"] for r in shuffle_corpus(docs, seed=1).select("doc_id").collect()]
    # reproducible across runs AND across input partitionings
    c = [
        r["doc_id"]
        for r in shuffle_corpus(docs.repartition(13), seed=1).select("doc_id").collect()
    ]
    assert a == b == c
    assert sorted(a) == sorted(ids)  # a permutation
    assert a != sorted(a)  # actually shuffled

    d = [r["doc_id"] for r in shuffle_corpus(docs, seed=2).select("doc_id").collect()]
    assert d != a  # seed changes the permutation


# --------------------------------------------------------------------------
# blocklist_filter
# --------------------------------------------------------------------------


def test_blocklist_literal_and_frame_agree(spark):
    docs = load_table(spark, SF, "documents")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    blocked = sources[:1]

    lit_out = blocklist_filter(docs, "source", blocked)
    frame = spark.createDataFrame([(s,) for s in blocked], "source string")
    df_out = blocklist_filter(docs, "source", frame)
    assert lit_out.count() == df_out.count() == docs.where(~F.col("source").isin(blocked)).count()
    assert lit_out.where(F.col("source").isin(blocked)).count() == 0

    allow = blocklist_filter(docs, "source", blocked, invert=True)
    assert allow.count() == docs.where(F.col("source").isin(blocked)).count()


def test_blocklist_keeps_null_sources(spark):
    df = spark.createDataFrame(
        [(1, "bad.com"), (2, "good.com"), (3, None)], "doc_id long, source string"
    )
    out = blocklist_filter(df, "source", ["bad.com"])
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


# --------------------------------------------------------------------------
# prepare_corpus
# --------------------------------------------------------------------------


def test_prepare_corpus_end_to_end(spark):
    docs = load_table(spark, SF, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    some_text = docs.select("text").first()["text"]

    planted = spark.createDataFrame(
        [
            # exact duplicate of an existing doc (text identical)
            (max_id + 1, some_text, "en", "planted", len(some_text)),
            # blocked source
            (max_id + 2, "totally fine text here", "en", "blocked_src", 22),
            # contaminated vs the eval set below (shares its full text)
            (
                max_id + 3,
                "eval question one two three four five six seven eight nine ten",
                "en",
                "planted",
                63,
            ),
        ],
        docs.schema,
    )
    corpus = docs.unionByName(planted)
    test_set = spark.createDataFrame(
        [
            (
                1,
                "eval question one two three four five six seven eight nine ten",
            )
        ],
        "doc_id long, text string",
    )

    res = prepare_corpus(
        corpus,
        blocked_sources=["blocked_src"],
        quality=False,  # fixture docs are synthetic word salad: Gopher drops all
        near_dedup_threshold=0.9,
        test_set=test_set,
        pack_budget=512,
        collect_stats=True,
    )
    out = res.df
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}

    assert max_id + 1 not in ids  # exact dup lost to keep-min
    assert max_id + 2 not in ids  # blocked source
    assert max_id + 3 not in ids  # decontaminated
    # stage accounting is monotone non-increasing in pipeline order
    order = ["input", "blocklist", "pii_scrub", "exact_dedup", "near_dedup", "decontaminate", "packed"]
    counts = [res.stats[s] for s in order if s in res.stats]
    assert counts == sorted(counts, reverse=True)
    assert res.stats["input"] == corpus.count()
    # packing assigned a pack to every surviving doc
    assert out.where(F.col("pack_key").isNull()).count() == 0


def test_prepare_corpus_quality_gate_on_natural_text(spark):
    prose = (
        "The quick brown fox jumps over that old wooden fence and keeps "
        "running toward the distant river where several children have been "
        "playing since morning. Their parents watched from a small hill "
        "nearby, talking about the harvest and whether the weather would "
        "hold through the coming week. Nobody expected the storm that "
        "arrived later with heavy rain and sudden wind, scattering leaves "
        "across every garden in the village before nightfall."
    )
    spam = "buy now " * 100
    df = spark.createDataFrame(
        [(1, prose, "en", "web", len(prose)), (2, spam, "en", "web", len(spam))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    res = prepare_corpus(
        df, near_dedup_threshold=None, shuffle_seed=None, collect_stats=True
    )
    ids = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    assert ids == {1}
    assert res.stats["quality_gate"] == 1


def test_prepare_corpus_stats_off_matches_stats_on(spark):
    """collect_stats=False must produce the SAME corpus as the
    accounting path, with fork inputs persisted so the single final
    action computes each stage once (R5: 4-6x upstream recompute
    observed unpersisted), and unpersist() releases them."""
    docs = load_table(spark, SF, "documents")
    kw = dict(quality=False, near_dedup_threshold=0.5, shuffle_seed=3)
    on = prepare_corpus(docs, collect_stats=True, **kw)
    off = prepare_corpus(docs, collect_stats=False, **kw)
    a = [r["doc_id"] for r in on.df.select("doc_id").collect()]
    b = [r["doc_id"] for r in off.df.select("doc_id").collect()]
    assert a == b  # identical membership AND shuffle order
    assert off.persisted and all(f.is_cached for f in off.persisted)
    off.unpersist()
    on.unpersist()
    assert not any(f.is_cached for f in off.persisted)


def test_prepare_corpus_perplexity_gate_and_dsir(spark):
    """R6 composition: the CCNet perplexity gate drops planted
    gibberish; DSIR selection then pulls the corpus toward the target
    distribution — each stage appearing in the accounting."""
    from etl_zero_spark.operators import lm

    ref = ["the cat sat on the mat", "the dog sat on the rug",
           "a cat chased a dog on the mat", "the mat was on the floor"]
    model = lm.train_ngram_lm(
        spark.createDataFrame([(i, t) for i, t in enumerate(ref)],
                              ["doc_id", "text"])
    )
    rows = []
    for i in range(8):
        rows.append((i, ref[i % len(ref)] + f" extra{i}", "en", "web"))
    rows.append((50, "glorp zz blat qq vonk wibble snee crunk", "en", "web"))
    # target distribution: cat-docs
    rows += [(60 + i, "the cat sat on the mat again", "en", "web") for i in range(4)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    # calibrate the cutoff from the reference slice's own scores
    cut = (
        lm.score_perplexity(docs.where("doc_id < 8"), model)
        .agg({"perplexity": "max"})
        .collect()[0][0]
    )
    target = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a cat chased the cat")],
        ["doc_id", "text"],
    )
    res = prepare_corpus(
        docs,
        quality=False,
        perplexity_model=model,
        max_perplexity=cut * 1.01,
        near_dedup_threshold=None,
        dsir_target=target,
        dsir_k=6,
        shuffle_seed=None,
        collect_stats=True,
    )
    ids = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    assert 50 not in ids  # gibberish gated out by perplexity
    assert "perplexity_gate" in res.stats and "dsir_select" in res.stats
    assert res.stats["dsir_select"] == 6
    # the exact-dedup stage collapses the 4 identical cat docs to one;
    # DSIR then favors cat-like docs among the survivors
    assert any(i >= 60 for i in ids)
    res.unpersist()


def test_prepare_corpus_substring_dedup_stage(spark):
    """R6: the span-dedup stage cuts a repeated passage from the later
    doc while the first occurrence and unrelated docs pass through."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"intro one two {passage} outro one", "en", "web"),
        (2, f"other intro {passage} different outro here", "en", "web"),
        (3, "completely unrelated document text with words", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    res = prepare_corpus(
        docs,
        quality=False,
        near_dedup_threshold=None,
        substring_dedup_k=5,
        shuffle_seed=None,
        collect_stats=True,
    )
    out = {r.doc_id: r.text for r in res.df.select("doc_id", "text").collect()}
    assert "substring_dedup" in res.stats and res.stats["substring_dedup"] == 3
    assert "gamma" in out[1] and "gamma" not in out[2]
    assert out[3] == rows[2][1]
    res.unpersist()


def test_prepare_corpus_html_strip_stage(spark):
    """R6: html=True strips markup FIRST, so downstream signals see
    prose — markup-wrapped duplicates then dedup exactly."""
    body = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"<html><body><p>{body}</p></body></html>", "en", "web"),
        (2, f"<div>{body}</div><script>var x;</script>", "en", "web"),
        (3, "<p>another document entirely different</p>", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    res = prepare_corpus(
        docs,
        html=True,
        quality=False,
        near_dedup_threshold=None,
        shuffle_seed=None,
        collect_stats=True,
    )
    out = {r.doc_id: r.text for r in res.df.select("doc_id", "text").collect()}
    assert res.stats["html_strip"] == 3
    # identical prose behind different markup collapses in exact dedup
    assert set(out) == {1, 3}
    assert out[1] == body and "<" not in out[3]
    res.unpersist()


def test_prepare_corpus_unicode_normalize_enables_dedup(spark):
    """R6: curly-quote/NBSP variants of one text hash equal only after
    normalization — with the stage on, they collapse in exact dedup."""
    rows = [
        (1, "she said ‘hello there’ twice", "en", "web"),
        (2, "she said 'hello there' twice", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    kw = dict(quality=False, near_dedup_threshold=None, shuffle_seed=None,
              collect_stats=True)
    off = prepare_corpus(docs, **kw)
    assert off.df.count() == 2  # variants survive without the stage
    on = prepare_corpus(docs, normalize_unicode=True, **kw)
    assert on.df.count() == 1 and on.stats["normalize"] == 2
    off.unpersist(); on.unpersist()


def test_prepare_corpus_line_dedup_stage(spark):
    """R7: the boilerplate-line stage strips a footer shared across
    docs (all occurrences — the C4 rule) before the dedup tiers, so
    the two docs' remaining prose no longer near-dup-matches."""
    footer = "subscribe to our newsletter for weekly updates"
    rows = [
        (1, f"first document real prose here\n{footer}", "en", "web"),
        (2, f"second document other prose text\n{footer}", "en", "web"),
        (3, "unrelated document with its own words", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    res = prepare_corpus(
        docs,
        quality=False,
        line_dedup_min_docs=2,
        near_dedup_threshold=0.5,
        shuffle_seed=None,
        collect_stats=True,
    )
    out = {r.doc_id: r.text for r in res.df.select("doc_id", "text").collect()}
    assert res.stats["line_dedup"] == 3  # rewrite, never row-drop
    assert len(out) == 3  # boilerplate gone -> docs no longer near-dups
    for t in out.values():
        assert "newsletter" not in t
    res.unpersist()


def test_release_pipeline_prepare_mix_datasheet(spark):
    """R7 integration: the corpus-release flow end-to-end —
    prepare_corpus cleans, mix_corpus composes the mixture to a doc
    budget, corpus_report + datasheet_markdown produce the release
    artifact. Every stage is the real operator; the assertions pin the
    handoffs (cleaned rows reach the mixer, the ledger and datasheet
    agree on composition)."""
    from etl_zero_spark.operators.corpus import mix_corpus
    from etl_zero_spark.operators.report import corpus_report, datasheet_markdown

    footer = "subscribe to our newsletter for weekly updates"
    rows = [
        (i, f"web prose document number {i} with words\n{footer}", "en", "web")
        for i in range(40)
    ] + [
        (100 + i, f"code listing item {i} def main pass", "en", "code")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    res = prepare_corpus(
        docs,
        quality=False,
        line_dedup_min_docs=2,
        near_dedup_threshold=None,
        shuffle_seed=None,
        collect_stats=True,
    )
    assert res.stats["line_dedup"] == 60
    mix = mix_corpus(
        res.df, {"web": 0.5, "code": 0.5}, total_docs=30, exact=True
    )
    assert mix.allocation["web"]["allocated"] == 15
    assert mix.allocation["code"]["allocated"] == 15
    rep = corpus_report(mix.df, source_col="source", lang_col="lang")
    assert rep["n_docs"] == 30
    by_src = {r["key"]: r["docs"] for r in rep["by_source"]}
    assert by_src == {"web": 15, "code": 15}
    md = datasheet_markdown(rep)
    assert "| n_docs | 30 |" in md and "| web | 15 |" in md
    # the boilerplate never reaches the release
    assert mix.df.where(F.col("text").contains("newsletter")).count() == 0
    res.unpersist()


def test_release_gate_classifier_dedup_datasheet(spark):
    """R8 (VERDICT r7 #8): the full release workflow in ONE test —
    train the learned quality gate on register fixtures, gate
    prepare_corpus with it, exact-dedup the survivors, and check on
    corpus_report that the datasheet's mean_quality RISES and
    exact_dup_fraction FALLS from ingest to release. Directional
    assertions only: the Pareto keep rule deliberately leaks a
    diversity tail both ways (Brown 2020 App. A), so survivor counts
    are not exact — but the release-card deltas must move the right
    way or the gate wiring is broken."""
    from etl_zero_spark.operators import classifier
    from etl_zero_spark.operators.report import corpus_report, datasheet_markdown

    good = (
        "the quick analysis of spark query plans shows careful "
        "reasoning about distributed joins and memory"
    ).split()
    spam = (
        "buy cheap pills casino winner click subscribe free offer "
        "deal jackpot bonus prize"
    ).split()

    def mk(words, i, n=12):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    model = classifier.train_quality_classifier(
        spark.createDataFrame(
            [(i, mk(good, i)) for i in range(40)], "doc_id long, text string"
        ),
        spark.createDataFrame(
            [(i, mk(spam, i)) for i in range(40)], "doc_id long, text string"
        ),
        n_features=1 << 14,
    )
    # ingest: 20 held-out good docs, 10 exact duplicates of them, and
    # 20 held-out spam docs
    rows = [(i, mk(good, i + 101), "en", "web") for i in range(20)]
    rows += [(100 + i, rows[i][1], "en", "web") for i in range(10)]
    rows += [(200 + i, mk(spam, i + 101), "en", "web") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    before = corpus_report(docs)
    assert before["exact_dup_fraction"] > 0

    res = prepare_corpus(
        docs,
        quality=False,  # isolate the LEARNED gate from the Gopher gate
        classifier_model=model,
        near_dedup_threshold=None,
        shuffle_seed=None,
        collect_stats=True,
    )
    after = corpus_report(res.df)

    # the gate dropped rows, and dropped MOSTLY spam: the spam share
    # of the survivors must shrink vs the 20/50 ingest share
    assert res.stats["classifier_gate"] < res.stats["input"]
    surv_spam = res.df.where(F.col("doc_id") >= 200).count()
    assert surv_spam / after["n_docs"] < 20 / 50
    # exact dedup ran after the gate: no duplicate content ships
    assert res.stats["exact_dedup"] <= res.stats["classifier_gate"]
    assert after["exact_dup_fraction"] == 0.0
    # the release card moves the right way
    assert after["mean_quality"] > before["mean_quality"]
    md = datasheet_markdown(after)
    assert f"| n_docs | {after['n_docs']} |" in md
    res.unpersist()


def test_prepare_corpus_quality_aware_near_dedup(spark):
    """R8: near_dedup_score_col switches the resolution to keep-best —
    the higher-quality member of a near-dup pair survives even when it
    has the LARGER id (keep-min would drop it)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " extra boilerplate footer", "en", "web", 0.2),
        (2, base, "en", "web", 0.9),  # near-dup of 1, higher quality
        (3, "completely different text about query planning", "en", "web", 0.5),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, q double"
    )
    res_min = prepare_corpus(
        docs, quality=False, near_dedup_threshold=0.5,
        shuffle_seed=None, collect_stats=True,
    )
    res_best = prepare_corpus(
        docs, quality=False, near_dedup_threshold=0.5,
        near_dedup_score_col="q", shuffle_seed=None, collect_stats=True,
    )
    ids_min = {r.doc_id for r in res_min.df.collect()}
    ids_best = {r.doc_id for r in res_best.df.collect()}
    assert ids_min == {1, 3}   # keep-min keeps the smaller id
    assert ids_best == {2, 3}  # keep-best keeps the higher score
    res_min.unpersist()
    res_best.unpersist()
