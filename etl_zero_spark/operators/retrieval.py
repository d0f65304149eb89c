"""Lexical full-text retrieval: BM25 top-k over the documents table
(Robertson & Spärck Jones probabilistic relevance; the Lucene /
Elasticsearch practical scoring function).

The reference engine exposes no text-search surface; this is part of
the §2.11 extension tier (SURVEY) — the lexical complement to the
embedding similarity tier (sim1-sim5): hybrid retrieval at corpus
scale is "BM25 candidates ∪ ANN candidates", and training-data
curation uses the same machinery for query-driven corpus audits
("which documents match this probe query?").

Scale shape (the 100 TB story):

* The posting build is ONE explode + ONE groupBy over the corpus —
  the same shape as the shingle index dedup already pays. No
  vocabulary ever reaches the driver.
* Query terms are a SMALL relation by construction (human queries);
  every join against the corpus-sized posting table broadcasts the
  query side, so scoring is a map-side pipeline: semi-join filter →
  per-term df aggregation (bounded by |query vocabulary|) →
  broadcast-join scoring → per-(query, doc) partial-aggregated sum.
* Corpus statistics (N, avgdl) are a 1-row aggregate cross-joined
  back in (the repo's 1-row audit-boolean pattern) — never a driver
  round-trip inside the plan.
* Top-k is a per-query window over the scored candidates; candidates
  are bounded by matched postings (documents sharing at least one
  query term), the classic inverted-index pruning.

Tokenization is the repo-standard ``tokens_expr`` (lowercased ASCII
whitespace split, empties dropped) so BM25, dedup shingles, token
counts and the DuckDB oracles all agree on what a term is.

Scoring (Robertson idf, the Lucene variant — always positive):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

with the conventional k1=1.2, b=0.75 defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_zero_spark.operators.dedup import tokens_expr


def bm25_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The inverted index as rows: ``(term, doc_id, tf, dl)`` — term
    frequency and document length per posting. One explode + one
    groupBy (map-side partials); dl rides the grouping as ``max``
    (constant per document). Null/empty texts contribute no postings.
    At corpus scale callers build this once and persist it as a table
    bucketed by term; every search below is then index-only."""
    toks = tokens_expr(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )


def corpus_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """1-row frame ``(n_docs, avgdl)`` — document count and mean token
    length over the corpus (null text counts as length 0, matching the
    posting build where it simply contributes no terms)."""
    toks = tokens_expr(F.col(text_col))
    # size(NULL) is NULL under ANSI but -1 under legacy semantics —
    # greatest(coalesce(..), 0) pins a null-text document to length 0
    # in BOTH session modes (the conftest runs ANSI off, the driver on)
    dl = F.greatest(F.coalesce(F.size(toks), F.lit(0)), F.lit(0))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(dl).alias("avgdl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-``top_k`` documents per query by BM25, as
    ``(query_id, doc_id, rank, score)`` with ``score`` rounded to 6
    decimals and ties broken by ``doc_id`` (deterministic across
    partitionings and engines — the LIMIT-total-order rule).

    ``queries`` is a small relation of ``(query_id, query_text)``;
    its terms are deduplicated per query (BM25 is a set-of-terms
    model; repeating a query word must not double-count the term).
    Pass a prebuilt ``postings`` (from :func:`bm25_postings`,
    persisted/bucketed) AND ``stats`` (from :func:`corpus_stats`,
    1 row — persist them together) to make a call fully index-only;
    with only ``postings`` prebuilt, the (n_docs, avgdl) aggregate
    still scans the corpus once per call (R8 review)."""
    post = (
        postings
        if postings is not None
        else bm25_postings(docs, text_col, id_col)
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens_expr(F.col(query_text_col)))
        ).alias("term"),
    )
    if stats is None:
        stats = corpus_stats(docs, text_col)
    # document frequency: a query-vocabulary-bounded aggregation over
    # the term-filtered postings, broadcast back. NOT a window over
    # the matched rows (2nd R8 review): a window by (query, term)
    # would exchange+sort every raw matched posting row — common
    # terms mean huge posting lists — where this shape's only wide
    # exchange carries map-side-combined (query, doc) partials. In
    # the postings=None convenience path the dfreq subtree does
    # re-tokenize the corpus once more; at scale callers pass the
    # persisted postings table and no corpus scan happens at all.
    dfreq = (
        post.join(
            F.broadcast(qterms.select("term").distinct()), "term", "semi"
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        # a degenerate stats row (n_docs=0 / avgdl<=0 — e.g. a streamed
        # index whose postings committed but whose stats epoch hasn't
        # yet, ADVICE r8) would divide by zero and score every
        # candidate NULL; refuse it declaratively so the result is
        # EMPTY, never silently meaningless
        .where((F.col("n_docs") > 0) & (F.col("avgdl") > 0))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    return _window_topk(scored, top_k)


def _window_topk(scored: DataFrame, top_k: int) -> DataFrame:
    """THE deterministic top-k contract, shared by bm25_topk and
    rrf_fuse: score desc, doc_id asc tie-break, rank <= top_k —
    one place, so rounding/tie rules cannot drift apart."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) —
    the standard hybrid-retrieval combiner: fused score per (query,
    doc) is ``Σ_r 1/(k + rank_r)`` over every input ranking that
    returned the doc. Rank-based, so BM25 scores and cosine
    similarities fuse WITHOUT calibration — exactly why hybrid
    (lexical ∪ ANN) search ships RRF rather than score interpolation;
    k=60 is the paper's constant.

    Inputs are ``(query_col, id_col, rank_col)`` frames — e.g.
    :func:`bm25_topk` output and an embedding top-k from the
    similarity tier. Each is one candidate list, already bounded by
    its own top-k, so the fusion is a union + one aggregation over
    per-query candidate sets — nothing corpus-sized. Output mirrors
    bm25_topk: ``(query_id, doc_id, rank, score)`` with score rounded
    to 6dp, ties by doc_id."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contrib = None
    for r in rankings:
        c = r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("score")
    )
    return _window_topk(fused, top_k)


def extend_postings(
    postings: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Absorb a document delta into a persisted posting table — the
    daily-ingest shape the incremental MinHash index (dd9) set: cost is
    O(delta), never a corpus re-tokenization. The delta's ids must be
    NEW (same contract as the snapshot append path); re-ingesting an
    id would double its postings — call :func:`remove_postings` first
    for replacements. Union only — at the table layer this is an
    APPEND to the postings table, preserving its term bucketing."""
    return postings.unionByName(bm25_postings(new_docs, text_col, id_col))


def remove_postings(
    postings: DataFrame, ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every posting of the given ids (one anti-join) — the
    delete/replace half of incremental index maintenance."""
    return postings.join(
        ids.select(F.col(id_col).alias("doc_id")).dropDuplicates(),
        "doc_id",
        "left_anti",
    )


def merge_stats(stats_a: DataFrame, stats_b: DataFrame) -> DataFrame:
    """Exactly merge two ``corpus_stats`` frames: counts add, avgdl
    recombines n-weighted — so incremental ingest updates (n_docs,
    avgdl) without any corpus scan. Commutative and associative (the
    mergeable-sketch contract quantile aggregation already follows)."""
    a = stats_a.select(
        F.col("n_docs").alias("na"), F.col("avgdl").alias("aa")
    )
    b = stats_b.select(
        F.col("n_docs").alias("nb"), F.col("avgdl").alias("ab")
    )
    return (
        a.crossJoin(b)
        .select(
            (F.col("na") + F.col("nb")).alias("n_docs"),
            F.when(F.col("na") + F.col("nb") == 0, F.lit(0.0))
            .otherwise(
                (F.col("na") * F.col("aa") + F.col("nb") * F.col("ab"))
                / (F.col("na") + F.col("nb"))
            )
            .alias("avgdl"),
        )
    )
