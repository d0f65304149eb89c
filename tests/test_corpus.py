"""Corpus-prep operators (operators/corpus.py): contamination
detection with planted overlaps, sequence packing budget accounting,
deterministic stratified sampling. Self-oracles per SURVEY §5.2 (no
declared-query slots remain; these are the pytest-only tier)."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import corpus
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _mini_corpora(spark):
    """Train corpus + test set with PLANTED contamination: test 100
    copies an 8-gram from train 1 verbatim; test 101 shares nothing."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "completely unrelated training prose about spark engines"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            (100, "prefix words then alpha beta gamma delta epsilon zeta eta theta tail"),
            (101, "nothing here overlaps with any training document at all"),
        ],
        "doc_id long, text string",
    )
    return train, test


def test_contamination_finds_planted_pair(spark):
    train, test = _mini_corpora(spark)
    pairs = corpus.cross_corpus_contamination(train, test, n=8).collect()
    assert {(r.test_id, r.train_id) for r in pairs} == {(100, 1)}
    # test 100 carries the 8-grams [alpha..theta] — the train doc's
    # window [alpha..theta] is the single shared one
    assert pairs[0].shared_ngrams == 1


def test_contamination_min_shared_threshold(spark):
    train, test = _mini_corpora(spark)
    assert (
        corpus.cross_corpus_contamination(train, test, n=8, min_shared=2).count()
        == 0
    )
    # at n=4 the copied span yields many shared 4-grams
    many = corpus.cross_corpus_contamination(train, test, n=4, min_shared=2)
    assert many.where("test_id = 100 AND train_id = 1").first().shared_ngrams >= 2


def test_contamination_matches_python_oracle(spark, docs):
    """Exact n-gram overlap recomputed in plain Python on the fixture
    corpus (truncated for the driver-side oracle)."""
    sub = docs.where(F.col("doc_id") < 60)
    train = sub.where(F.col("doc_id") < 40)
    test = sub.where(F.col("doc_id") >= 40)
    n = 5
    got = {
        (r.test_id, r.train_id): r.shared_ngrams
        for r in corpus.cross_corpus_contamination(train, test, n=n).collect()
    }

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    tr = {r.doc_id: grams(r.text) for r in train.select("doc_id", "text").collect()}
    te = {r.doc_id: grams(r.text) for r in test.select("doc_id", "text").collect()}
    want = {}
    for tid, tg in te.items():
        for rid, rg in tr.items():
            k = len(tg & rg)
            if k >= 1:
                want[(tid, rid)] = k
    assert got == want


def test_contamination_stop_gram_cap_bounds_fanout(spark):
    """A gram present in EVERY train doc must not explode the join:
    with the cap at 2 the boilerplate gram drops out of the index and
    only the genuine contamination survives."""
    boiler = "this document is provided as is without any warranty"
    train = spark.createDataFrame(
        [(i, f"{boiler} body text number {i} unique content") for i in range(10)],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, boiler), (101, "body text number 3 unique content plus more")],
        "doc_id long, text string",
    )
    capped = corpus.cross_corpus_contamination(
        train, test, n=8, max_gram_df=2
    ).collect()
    # test 100 (pure boilerplate) matches nothing; uncapped it would
    # pair with all 10 train docs
    assert all(r.test_id != 100 for r in capped)
    uncapped = corpus.cross_corpus_contamination(
        train, test, n=8, max_gram_df=None
    )
    assert uncapped.where("test_id = 100").count() == 10


def test_decontaminate_removes_only_contaminated(spark):
    train, test = _mini_corpora(spark)
    clean = corpus.decontaminate(train, test, n=8)
    assert {r.doc_id for r in clean.collect()} == {2, 3}


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_budget_accounting(spark, docs):
    budget = 200
    packed = corpus.pack_sequences(docs, budget=budget)
    assert packed.count() == docs.count()  # every doc assigned
    per_pack = packed.groupBy("pack_key").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("biggest")
    )
    # a pack never exceeds budget by more than its largest member
    # (contiguous-fill guarantee)
    assert per_pack.where(F.col("tot") >= budget + F.col("biggest")).count() == 0
    # packs actually fill: within each stream every pack except the
    # last reaches the budget threshold with its successor's help —
    # equivalently, pack_ids are contiguous from 0
    streams = packed.groupBy("stream").agg(
        F.countDistinct("pack_id").alias("n_packs"), F.max("pack_id").alias("mx")
    )
    assert streams.where(F.col("n_packs") != F.col("mx") + 1).count() == 0


def test_pack_sequences_deterministic_under_partitioning(spark, docs):
    a = corpus.pack_sequences(docs, budget=300)
    b = corpus.pack_sequences(docs.repartition(13), budget=300)
    ka = {(r.doc_id, r.pack_key) for r in a.collect()}
    kb = {(r.doc_id, r.pack_key) for r in b.collect()}
    assert ka == kb


def test_pack_sequences_respects_precomputed_counts(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 60)], "doc_id long, n_tok long"
    )
    out = corpus.pack_sequences(
        df, budget=100, token_count_col="n_tok", n_streams=1
    ).orderBy("doc_id")
    packs = [r.pack_id for r in out.collect()]
    # cumsum 60/120/180/240 -> floor((cum-60)/100) = 0,0,1,1
    assert packs == [0, 0, 1, 1]
    with pytest.raises(ValueError, match="budget"):
        corpus.pack_sequences(df, budget=0, token_count_col="n_tok")


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_mixture_spec(spark, docs):
    frac = {"en": 0.5, "de": 0.1}  # other langs -> 0
    out = corpus.stratified_sample(docs, "lang", frac, id_col="doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"en", "de"}  # unlisted strata fully dropped
    for lang, f in frac.items():
        n, tot = counts.get(lang, 0), totals[lang]
        # binomial 5-sigma bound
        sigma = (tot * f * (1 - f)) ** 0.5
        assert abs(n - tot * f) <= 5 * sigma + 1, (lang, n, tot)


def test_stratified_sample_is_stable_and_incremental(spark, docs):
    out1 = {r.doc_id for r in corpus.stratified_sample(docs, "lang", 0.3, "doc_id").collect()}
    out2 = {
        r.doc_id
        for r in corpus.stratified_sample(
            docs.repartition(17), "lang", 0.3, "doc_id"
        ).collect()
    }
    assert out1 == out2  # partitioning-independent
    # incremental property: sampling a SUBSET keeps exactly the
    # intersection — rows never flip when other rows disappear
    sub = docs.where(F.col("doc_id") % 2 == 0)
    out_sub = {r.doc_id for r in corpus.stratified_sample(sub, "lang", 0.3, "doc_id").collect()}
    assert out_sub == {i for i in out1 if i % 2 == 0}
    with pytest.raises(ValueError, match="fraction"):
        corpus.stratified_sample(docs, "lang", 1.5, "doc_id")


def test_corpus_plans_have_no_scale_killers(spark, docs):
    train, test = _mini_corpora(spark)
    plans = [
        corpus.cross_corpus_contamination(train, test, n=8),
        corpus.pack_sequences(docs, budget=256),
        corpus.stratified_sample(docs, "lang", 0.5, "doc_id"),
    ]
    for df in plans:
        s = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in s, s
        assert "EvalPython" not in s, s


def test_stratified_take_exact_counts_and_nesting(spark, docs):
    take50 = corpus.stratified_take(docs, "lang", 50, "doc_id")
    counts = {
        r.lang: r.n
        for r in take50.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, tot in totals.items():
        assert counts[lang] == min(50, tot), lang
    # nesting: the 20-take is a subset of the 50-take (same seed)
    ids20 = {r.doc_id for r in corpus.stratified_take(docs, "lang", 20, "doc_id").collect()}
    ids50 = {r.doc_id for r in take50.collect()}
    assert ids20 <= ids50
    # partitioning-independent
    ids50b = {
        r.doc_id
        for r in corpus.stratified_take(
            docs.repartition(11), "lang", 50, "doc_id"
        ).collect()
    }
    assert ids50 == ids50b
    # per-stratum quota dict; unlisted strata -> dropped
    q = corpus.stratified_take(docs, "lang", {"en": 3, "de": 1}, "doc_id")
    got = {r.lang: r.n for r in q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {"en": 3, "de": 1}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="negative"):
        corpus.stratified_take(docs, "lang", -1, "doc_id")


# ---------------------------------------------------------------------------
# mixture allocation (mix_corpus)
# ---------------------------------------------------------------------------


def _mix_docs(spark, n_web=600, n_code=300, n_papers=40):
    rows = []
    for i in range(n_web):
        rows.append((i, "web words " + " ".join(f"w{j}" for j in range(8)), "web"))
    for i in range(n_code):
        rows.append((10_000 + i, "def f(): pass " + f"c{i}", "code"))
    for i in range(n_papers):
        rows.append((20_000 + i, "abstract " + f"p{i} " + "x " * 5, "papers"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mix_corpus_waterfill_redistributes_shortfall(spark):
    """papers can't fill its 25% share of 400 docs (only 40 exist):
    it caps at availability and the shortfall redistributes to web and
    code in weight proportion."""
    docs = _mix_docs(spark)
    res = corpus.mix_corpus(
        docs, {"web": 0.5, "code": 0.25, "papers": 0.25},
        total_docs=400, exact=True,
    )
    a = res.allocation
    assert a["papers"]["allocated"] == 40  # capped at availability
    assert a["papers"]["target"] == 100
    # shortfall (60) redistributes 2:1 between web and code
    assert a["web"]["allocated"] == 240 and a["code"]["allocated"] == 120
    got = {
        r.source: r.cnt
        for r in res.df.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == {"web": 240, "code": 120, "papers": 40}


def test_mix_corpus_exact_is_deterministic_and_nested(spark):
    """Same budget twice (different partitioning) -> identical ids;
    bigger budget -> superset (hash order is fixed)."""
    docs = _mix_docs(spark)
    w = {"web": 0.7, "code": 0.3}
    ids = lambda res: {r.doc_id for r in res.df.select("doc_id").collect()}  # noqa: E731
    small = ids(corpus.mix_corpus(docs, w, total_docs=100, exact=True))
    again = ids(corpus.mix_corpus(docs.repartition(13), w, total_docs=100, exact=True))
    big = ids(corpus.mix_corpus(docs, w, total_docs=300, exact=True))
    assert small == again
    assert small < big
    # excluded source (papers ids live at >= 20_000) never leaks in
    assert all(i < 20_000 for i in small)
    src = {
        r.source
        for r in corpus.mix_corpus(docs, w, total_docs=100, exact=True)
        .df.select("source").distinct().collect()
    }
    assert "papers" not in src


def test_mix_corpus_approximate_within_binomial_bound(spark):
    docs = _mix_docs(spark, n_web=2000, n_code=1000, n_papers=0)
    res = corpus.mix_corpus(docs, {"web": 0.5, "code": 0.5}, total_docs=1200)
    got = {
        r.source: r.cnt
        for r in res.df.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # quota 600 each; binomial sd ~= sqrt(600*(1-0.6)) < 16 -> 5 sd
    assert abs(got["web"] - 600) < 80 and abs(got["code"] - 600) < 80


def test_mix_corpus_token_budget_exact_cuts_at_last_fit(spark):
    docs = _mix_docs(spark, n_web=50, n_code=0, n_papers=0)
    # every web doc is 10 whitespace tokens -> 95-token budget fits 9 docs
    res = corpus.mix_corpus(
        docs, {"web": 1.0}, total_tokens=95, exact=True,
    )
    rows = res.df.select("text").collect()
    assert len(rows) == 9
    assert res.unit == "tokens"
    assert res.allocation["web"]["allocated"] == 95


def test_mix_corpus_rejects_bad_specs(spark):
    docs = _mix_docs(spark, n_web=5, n_code=0, n_papers=0)
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {"web": 1.0})  # no budget
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {"web": 1.0}, total_docs=5, total_tokens=5)
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {}, total_docs=5)
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {"web": -1.0}, total_docs=5)


def test_mix_corpus_budget_exceeding_corpus_takes_everything(spark):
    docs = _mix_docs(spark, n_web=30, n_code=20, n_papers=0)
    res = corpus.mix_corpus(
        docs, {"web": 0.5, "code": 0.5}, total_docs=10_000, exact=True
    )
    assert res.df.count() == 50
    assert res.allocation["web"]["allocated"] == 30
    assert res.allocation["code"]["allocated"] == 20


def test_mix_corpus_token_mode_null_text_counts_zero(spark):
    """Review r7: null-text docs count 0 tokens — the running-sum cut
    stays monotonic and the sample stays a clean hash prefix."""
    rows = [(i, "tok " * 5, "web") for i in range(10)]
    rows += [(100 + i, None, "web") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    res = corpus.mix_corpus(docs, {"web": 1.0}, total_tokens=1000, exact=True)
    # budget exceeds the 50 available tokens -> everything, nulls too
    assert res.df.count() == 18
    assert res.allocation["web"]["available"] == 50
    # determinism across partitionings with nulls present
    a = {r.doc_id for r in res.df.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in corpus.mix_corpus(
            docs.repartition(5), {"web": 1.0}, total_tokens=1000, exact=True
        ).df.select("doc_id").collect()
    }
    assert a == b


def test_mix_corpus_rejects_nonpositive_budget(spark):
    docs = spark.createDataFrame(
        [(1, "t", "web")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {"web": 1.0}, total_docs=-100)
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, {"web": 1.0}, total_tokens=0)


def test_mix_corpus_zero_quota_source_never_leaks(spark):
    """Review r7 (2nd pass): a zero-weight source's null/empty docs
    must not ride a 0-token running sum into an exact-token sample."""
    rows = [(i, "tok tok tok", "web") for i in range(5)]
    rows += [(10, None, "code"), (11, "   ", "code")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    res = corpus.mix_corpus(
        docs, {"web": 1.0, "code": 0.0}, total_tokens=9, exact=True
    )
    got = {r.source for r in res.df.select("source").distinct().collect()}
    assert got == {"web"}
    assert res.allocation["code"]["allocated"] == 0
    assert res.df.count() == 3  # 9-token budget fits three 3-token docs


# --- temperature-based mixture weights (R8, XLM-R/mT5 alpha sampling) -------


def _tw_corpus(spark):
    rows = (
        [(i, "w " * 5, "web") for i in range(80)]
        + [(100 + i, "c " * 5, "code") for i in range(16)]
        + [(200 + i, "p " * 5, "papers") for i in range(4)]
        + [(300, "x", None)]  # null source: excluded from the spec
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_temperature_alpha_one_is_natural_distribution(spark):
    w = corpus.temperature_weights(_tw_corpus(spark), alpha=1.0)
    assert w == pytest.approx({"web": 0.8, "code": 0.16, "papers": 0.04})


def test_temperature_alpha_zero_is_uniform(spark):
    w = corpus.temperature_weights(_tw_corpus(spark), alpha=0.0)
    assert w == pytest.approx({"web": 1 / 3, "code": 1 / 3, "papers": 1 / 3})


def test_temperature_boosts_tail_monotonically(spark):
    """Published settings sit between natural and uniform: lowering
    alpha monotonically raises every tail source's share and lowers
    the head's, while weights stay normalized."""
    df = _tw_corpus(spark)
    prev = corpus.temperature_weights(df, alpha=1.0)
    for alpha in (0.7, 0.3, 0.0):
        w = corpus.temperature_weights(df, alpha=alpha)
        assert sum(w.values()) == pytest.approx(1.0)
        assert w["papers"] > prev["papers"] or alpha == 0.0 and prev["papers"] == w["papers"]
        assert w["web"] < prev["web"] or alpha == 0.0 and prev["web"] == w["web"]
        prev = w


def test_temperature_token_mass_expr(spark):
    """size_expr switches the mass measure: doubling one source's doc
    LENGTH doubles its mass under token counting but not row counting."""
    rows = [(0, "a b", "s1"), (1, "a b c d", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from etl_zero_spark.operators.corpus import _token_count

    by_rows = corpus.temperature_weights(df, alpha=1.0)
    by_tokens = corpus.temperature_weights(
        df, alpha=1.0, size_expr=_token_count(F.col("text"))
    )
    assert by_rows == pytest.approx({"s1": 0.5, "s2": 0.5})
    assert by_tokens == pytest.approx({"s1": 1 / 3, "s2": 2 / 3})


def test_temperature_composes_with_mix_corpus(spark):
    """The intended pipeline: alpha-tempered weights feed mix_corpus;
    the tail source gets MORE than its natural share of the budget."""
    df = _tw_corpus(spark)
    w = corpus.temperature_weights(df, alpha=0.3)
    mix = corpus.mix_corpus(df, w, total_docs=20, exact=True)
    nat = corpus.mix_corpus(
        df, corpus.temperature_weights(df, alpha=1.0), total_docs=20, exact=True
    )
    tempered = mix.allocation["papers"]["allocated"]
    natural = nat.allocation["papers"]["allocated"]
    assert tempered > natural
    assert sum(v["allocated"] for v in mix.allocation.values()) == 20


def test_temperature_validation_and_empty(spark):
    df = _tw_corpus(spark)
    with pytest.raises(ValueError):
        corpus.temperature_weights(df, alpha=-0.1)
    assert corpus.temperature_weights(df.where("source = 'nope'")) == {}
