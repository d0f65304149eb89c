"""Streaming BM25 index maintenance (streaming/search.py): micro-
batched ingest must yield exactly the full-rebuild search results,
replays must be no-ops, and a crash between the postings and stats
commits must converge to the clean-run state on redelivery."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_zero_spark.operators import retrieval
from etl_zero_spark.streaming.search import (
    StreamingSearchState,
    search,
    streaming_postings_sink,
)

_DAY1 = [
    (1, "hash join beats sort merge join on small tables"),
    (2, "window functions stream over sorted partitions"),
    (3, "join join join"),
]
_DAY2 = [
    (20, "a slow scan beats a fast scan with a bad filter"),
    (21, "the filter pushes past the scan into the join"),
    (22, None),
]

_QUERIES = [(0, "join scan"), (1, "slow filter")]


def _write_days(spark, src):
    import os

    for i, day in enumerate((_DAY1, _DAY2)):
        spark.createDataFrame(day, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"day{i}"))


def _run(spark, src, state, ckpt, name):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_postings_sink(stream, state, name, ckpt)
    q.awaitTermination()


def _results(df):
    return {
        (r.query_id, r.doc_id, r.rank, r.score) for r in df.collect()
    }


def test_streamed_index_matches_full_rebuild_and_replays_noop(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    _write_days(spark, src)
    state = StreamingSearchState(str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")
    queries = spark.createDataFrame(
        _QUERIES, "query_id bigint, query_text string"
    )
    _run(spark, src, state, ckpt, "search_stream")

    all_docs = spark.createDataFrame(
        _DAY1 + _DAY2, "doc_id long, text string"
    )
    assert _results(search(spark, state, queries)) == _results(
        retrieval.bm25_topk(all_docs, queries)
    )
    # the merged stats equal the full-corpus aggregate exactly —
    # null-text docs included in n_docs at dl 0
    s = state.current_stats(spark).collect()[0]
    full = retrieval.corpus_stats(all_docs).collect()[0]
    assert (s.n_docs, round(s.avgdl, 12)) == (
        full.n_docs, round(full.avgdl, 12)
    )
    assert len(state.committed_epochs(state.postings)) == 2
    assert len(state.committed_epochs(state.stats)) == 2

    # restart on the same checkpoint: nothing new to drain, no epochs
    _run(spark, src, state, ckpt, "search_stream2")
    assert len(state.committed_epochs(state.postings)) == 2
    assert state.postings.read(spark).count() == retrieval.bm25_postings(
        all_docs
    ).count()


def test_crash_suffix_replay_converges(spark, tmp_path):
    """Simulate a crash AFTER epoch 0's postings commit but BEFORE its
    stats commit: rerunning the stream from a fresh checkpoint
    redelivers both epochs; the committed suffix is skipped per table
    and the final state equals a clean run."""
    src = str(tmp_path / "src")
    _write_days(spark, src)
    state = StreamingSearchState(str(tmp_path / "state"))
    day1 = spark.createDataFrame(_DAY1, "doc_id long, text string")
    state.postings.commit(
        retrieval.bm25_postings(day1),
        mode="append",
        operation_prefix="stream@0",
    )
    _run(spark, src, state, str(tmp_path / "ckpt_fresh"), "search_replay")

    clean = StreamingSearchState(str(tmp_path / "clean"))
    _run(spark, src, clean, str(tmp_path / "ckpt_clean"), "search_clean")
    queries = spark.createDataFrame(
        _QUERIES, "query_id bigint, query_text string"
    )
    assert _results(search(spark, state, queries)) == _results(
        search(spark, clean, queries)
    )
    # no double postings for day 1's docs
    post = state.postings.read(spark)
    assert (
        post.groupBy("term", "doc_id").count().where(F.col("count") > 1).count()
        == 0
    )


def test_empty_index_returns_no_rows(spark, tmp_path):
    state = StreamingSearchState(str(tmp_path / "state"))
    queries = spark.createDataFrame(
        _QUERIES, "query_id bigint, query_text string"
    )
    out = search(spark, state, queries)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "rank", "score"]


def test_postings_without_stats_returns_empty_not_null_scores(
    spark, tmp_path
):
    """A crash between the postings commit and the stats commit of the
    first epoch leaves postings queryable with (n_docs=0, avgdl=0);
    scoring would divide by zero and return NULL scores for every
    candidate (ADVICE r8). The degenerate-stats guard must make the
    result EMPTY instead — silently meaningless rows are the one
    unacceptable mode."""
    state = StreamingSearchState(str(tmp_path / "state"))
    docs = spark.createDataFrame(_DAY1, "doc_id long, text string")
    post = retrieval.bm25_postings(docs)
    state.postings.commit(post)  # stats table never committed
    queries = spark.createDataFrame(
        _QUERIES, "query_id bigint, query_text string"
    )
    out = search(spark, state, queries)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "rank", "score"]
