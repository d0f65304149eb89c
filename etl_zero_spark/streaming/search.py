"""Streaming BM25 index maintenance: the daily-ingest search regime as
an exactly-once Structured Streaming sink.

Composes the two halves the repo already has, exactly like the
streaming near-dedup sink (streaming/dedup.py) composed the MinHash
index machinery:

* ``operators/retrieval``'s incremental posting machinery —
  ``bm25_postings`` builds a batch's posting rows O(delta);
  ``corpus_stats`` is a 1-row mergeable summary (``merge_stats`` is
  exact and associative, so per-batch stats rows reduce to the whole
  corpus's (n_docs, avgdl) without any corpus scan);
* ``sources/snapshots``' epoch-ledger pattern: every micro-batch
  commit carries its ``stream@{batch_id}`` tag in the manifest
  operation, so a batch replayed after a crash is detected in table
  history and skipped.

Per micro-batch the sink appends (a) the batch's posting rows and
(b) a 1-row stats partial. Two tables cannot commit in one atomic
publish, so exactly-once is per-table idempotence plus a FIXED commit
order (postings -> stats): a crash loses only a suffix, the replay
recomputes deterministically and commits whatever is missing — every
interleaving converges to the clean-run state. ``search`` then runs
:func:`~etl_zero_spark.operators.retrieval.bm25_topk` fully
index-only: the persisted postings plus the reduced stats, no
document scan at query time — the property the prebuilt-postings
path exists for.

Scale: postings grow by appends (one small file per epoch);
``compact`` is the maintenance pass. Document ids must be unique
across batches (the same disjointness contract as the near-dedup
sink); replace flows run ``remove_postings`` + re-ingest in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.retrieval import (
    bm25_postings,
    bm25_topk,
    corpus_stats,
)
from etl_zero_spark.sources.snapshots import SnapshotTable


class StreamingSearchState:
    """The two snapshot tables a streaming search index owns, rooted
    under one directory: ``postings/`` (term, doc_id, tf, dl — one
    epoch-tagged append per micro-batch) and ``stats/`` (one
    (n_docs, avgdl) partial row per epoch)."""

    def __init__(self, root: str):
        import os

        self.postings = SnapshotTable(os.path.join(root, "postings"))
        self.stats = SnapshotTable(os.path.join(root, "stats"))

    def committed_epochs(self, table: SnapshotTable) -> set[str]:
        from etl_zero_spark.sources.snapshots import committed_stream_epochs

        return committed_stream_epochs(table)

    def current_stats(self, spark) -> DataFrame:
        """The whole ingested corpus's (n_docs, avgdl) — the per-epoch
        partials reduced with the exact n-weighted merge (one
        aggregation over #epochs rows, never a corpus scan). Zero
        epochs -> (0, 0.0)."""
        if self.stats.current_version() is None:
            return spark.createDataFrame(
                [(0, 0.0)], "n_docs bigint, avgdl double"
            )
        parts = self.stats.read(spark)
        return parts.agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(
                F.sum(F.col("n_docs") * F.col("avgdl"))
                / F.sum("n_docs"),
                F.lit(0.0),
            ).alias("avgdl"),
        )

    def compact(self, spark, target_file_mb: int = 128) -> dict[str, int]:
        """Bin-pack the append-scattered posting files (one per epoch).
        Adds a new version, rewrites no manifests — the ``stream@``
        epoch tags stay in history, replay detection unaffected."""
        out = {}
        for name, t in (("postings", self.postings), ("stats", self.stats)):
            if t.current_version() is not None:
                out[name] = t.compact(spark, target_file_mb=target_file_mb)
        return out


def streaming_postings_sink(
    stream_docs: DataFrame,
    state: StreamingSearchState,
    query_name: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the exactly-once posting-maintenance query over a
    document stream. Returns the started StreamingQuery (availableNow
    trigger — drain what's arrived, then stop: the scheduled-ingest
    shape; the caller owns awaiting it)."""
    seen = {
        t: state.committed_epochs(t) for t in (state.postings, state.stats)
    }

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"stream@{batch_id}"
        docs = batch_df.select(id_col, text_col)
        if tag not in seen[state.postings]:
            state.postings.commit(
                bm25_postings(docs, text_col, id_col),
                mode="append",
                operation_prefix=tag,
            )
            seen[state.postings].add(tag)
        if tag not in seen[state.stats]:
            state.stats.commit(
                corpus_stats(docs, text_col),
                mode="append",
                operation_prefix=tag,
            )
            seen[state.stats].add(tag)

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def search(
    spark,
    state: StreamingSearchState,
    queries: DataFrame,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the STREAMED index — fully index-only: the
    persisted postings and the reduced stats partials; no document
    ever rescanned at query time. Before the first epoch the index is
    empty and every query returns no rows — the empty frame takes its
    query_id type from ``queries`` (2nd R8 review: a hardcoded type
    would diverge from the populated-index schema and break
    unionByName/append consumers across the first-epoch boundary);
    doc_id is typed bigint, the repo-wide id convention, since no
    posting row exists yet to derive it from."""
    if state.postings.current_version() is None:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(
                    "query_id", queries.schema["query_id"].dataType
                ),
                T.StructField("doc_id", T.LongType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        return queries.sparkSession.createDataFrame([], schema)
    return bm25_topk(
        None,  # docs unused: postings + stats both supplied
        queries,
        top_k=top_k,
        k1=k1,
        b=b,
        postings=state.postings.read(spark),
        stats=state.current_stats(spark),
    )
