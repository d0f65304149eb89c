"""BM25 lexical retrieval (operators/retrieval.py): exact parity with
a pure-Python oracle, determinism across partitionings, the prebuilt-
postings path, and edge cases (null/empty text, repeated and unknown
query terms)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import retrieval

_DOCS = [
    (0, "hash join beats sort merge join on small tables"),
    (1, "window functions stream over sorted partitions"),
    (2, "a slow scan beats a fast scan with a bad filter"),
    (3, "join join join"),
    (4, None),
    (5, ""),
    (6, "the filter pushes past the scan into the join"),
]

_QUERIES = [(0, "join scan"), (1, "slow filter"), (2, "zebra")]


def _tokens(text):
    return [t for t in (text or "").lower().split() if t]


def _oracle(docs, queries, k1=1.2, b=0.75, top_k=10):
    """Pure-Python BM25 replay of the module docstring's formula."""
    toks = {i: _tokens(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in dict.fromkeys(_tokens(qtext)):
            df = sum(1 for w in toks.values() if term in w)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, w in toks.items():
                tf = w.count(term)
                if tf == 0:
                    continue
                dl = len(w)
                scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl)
                )
        ranked = sorted(
            ((round(s, 6), i) for i, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )[:top_k]
        out[qid] = [
            (i, rank + 1, s) for rank, (s, i) in enumerate(ranked)
        ]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(_QUERIES, "query_id bigint, query_text string")


def _result_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, []).append((r.doc_id, r.rank, r.score))
    for v in out.values():
        v.sort(key=lambda t: t[1])
    return out


def test_matches_python_oracle_exactly(spark, docs, queries):
    got = _result_map(retrieval.bm25_topk(docs, queries))
    want = _oracle(_DOCS, _QUERIES)
    # the no-hit query ('zebra') yields no rows on both sides
    assert got == {k: v for k, v in want.items() if v}


def test_deterministic_across_partitionings(spark, docs, queries):
    a = _result_map(retrieval.bm25_topk(docs, queries))
    b = _result_map(retrieval.bm25_topk(docs.repartition(7), queries))
    c = _result_map(retrieval.bm25_topk(docs.coalesce(1), queries))
    assert a == b == c


def test_prebuilt_postings_path_identical(spark, docs, queries):
    post = retrieval.bm25_postings(docs)
    assert _result_map(
        retrieval.bm25_topk(docs, queries, postings=post)
    ) == _result_map(retrieval.bm25_topk(docs, queries))


def test_null_and_empty_docs_count_in_stats_not_postings(spark, docs):
    post = retrieval.bm25_postings(docs)
    assert post.where(F.col("doc_id").isin(4, 5)).count() == 0
    stats = retrieval.corpus_stats(docs).collect()[0]
    assert stats.n_docs == len(_DOCS)  # null/empty still corpus members
    want_avg = sum(len(_tokens(t)) for _, t in _DOCS) / len(_DOCS)
    assert abs(stats.avgdl - want_avg) < 1e-9


def test_repeated_query_terms_do_not_double_count(spark, docs):
    once = _result_map(
        retrieval.bm25_topk(
            docs,
            docs.sparkSession.createDataFrame(
                [(0, "join")], "query_id bigint, query_text string"
            ),
        )
    )
    thrice = _result_map(
        retrieval.bm25_topk(
            docs,
            docs.sparkSession.createDataFrame(
                [(0, "join join JOIN")], "query_id bigint, query_text string"
            ),
        )
    )
    assert once == thrice


def test_tf_saturation_and_tie_break(spark, docs, queries):
    """doc 3 ('join join join') saturates tf but has tiny dl; the
    ranking must still be the oracle's, and equal rounded scores break
    ties by doc_id ascending."""
    res = retrieval.bm25_topk(docs, queries).where("query_id = 0")
    rows = sorted(res.collect(), key=lambda r: r.rank)
    for a, b in zip(rows, rows[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)
        if a.score == b.score:
            assert a.doc_id < b.doc_id


def test_top_k_bounds_results(spark, docs):
    q = spark.createDataFrame(
        [(0, "join scan filter")], "query_id bigint, query_text string"
    )
    assert retrieval.bm25_topk(docs, q, top_k=2).count() == 2


# --- RRF hybrid fusion -------------------------------------------------------


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, doc_id bigint, rank int"
    )


def test_rrf_matches_formula(spark):
    a = _rank_df(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    b = _rank_df(spark, [(0, 11, 1), (0, 13, 2)])
    got = {
        (r.doc_id): (r.rank, r.score)
        for r in retrieval.rrf_fuse([a, b], k=60).collect()
    }
    want_scores = {
        10: 1 / 61,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    ranked = sorted(want_scores, key=lambda d: (-want_scores[d], d))
    for rank, d in enumerate(ranked, 1):
        assert got[d] == (rank, round(want_scores[d], 6))


def test_rrf_single_ranking_preserves_order(spark):
    a = _rank_df(spark, [(0, 5, 1), (0, 9, 2), (0, 2, 3)])
    got = sorted(
        ((r.rank, r.doc_id) for r in retrieval.rrf_fuse([a]).collect())
    )
    assert got == [(1, 5), (2, 9), (3, 2)]


def test_rrf_hybrid_with_bm25(spark, docs, queries):
    """The intended composition: BM25 candidates fused with a second
    (here synthetic 'ANN') candidate list — a doc ranked by both must
    outrank a doc of the same single-list rank ranked by one."""
    bm = retrieval.bm25_topk(docs, queries).where("query_id = 0")
    top_bm = min(bm.collect(), key=lambda r: r.rank)
    ann = _rank_df(spark, [(0, top_bm.doc_id, 1), (0, 999, 2)])
    fused = {
        r.doc_id: r.rank
        for r in retrieval.rrf_fuse([bm, ann]).where("query_id = 0").collect()
    }
    assert fused[top_bm.doc_id] == 1  # ranked #1 by both lists
    assert 999 in fused  # single-list candidates still surface


def test_rrf_empty_and_topk(spark):
    a = _rank_df(spark, [(0, i, i) for i in range(1, 8)])
    assert retrieval.rrf_fuse([a], top_k=3).count() == 3
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([])


# --- incremental posting maintenance (R8, the dd9 daily-ingest shape) -------


def test_incremental_postings_equal_full_rebuild(spark, docs, queries):
    """extend_postings(base, delta) + merge_stats must reproduce the
    full-corpus search EXACTLY — the dd9 equivalence contract applied
    to the lexical index."""
    base_docs = docs.where("doc_id < 3")
    delta_docs = docs.where("doc_id >= 3")
    post = retrieval.extend_postings(
        retrieval.bm25_postings(base_docs), delta_docs
    )
    stats = retrieval.merge_stats(
        retrieval.corpus_stats(base_docs), retrieval.corpus_stats(delta_docs)
    )
    got = _result_map(
        retrieval.bm25_topk(docs, queries, postings=post, stats=stats)
    )
    want = _result_map(retrieval.bm25_topk(docs, queries))
    assert got == want
    # the merged stats equal the full-corpus aggregate exactly
    s = stats.collect()[0]
    full = retrieval.corpus_stats(docs).collect()[0]
    assert s.n_docs == full.n_docs
    assert abs(s.avgdl - full.avgdl) < 1e-12


def test_remove_then_extend_replaces_document(spark, docs, queries):
    """The replace flow: remove an id's postings, re-ingest its new
    text — search over the maintained index equals a fresh build over
    the updated corpus."""
    updated_row = docs.sparkSession.createDataFrame(
        [(0, "filter filter filter")], "doc_id bigint, text string"
    )
    updated_corpus = docs.where("doc_id != 0").unionByName(updated_row)
    post = retrieval.extend_postings(
        retrieval.remove_postings(
            retrieval.bm25_postings(docs),
            docs.where("doc_id = 0").select("doc_id"),
        ),
        updated_row,
    )
    got = _result_map(
        retrieval.bm25_topk(
            updated_corpus, queries, postings=post
        )
    )
    want = _result_map(retrieval.bm25_topk(updated_corpus, queries))
    assert got == want
