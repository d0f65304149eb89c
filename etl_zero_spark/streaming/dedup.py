"""Streaming incremental near-dedup (VERDICT r5 #5): the daily-ingest
dedup regime as an exactly-once Structured Streaming sink.

Composes the two halves the repo already has, previously unconnected:

* ``operators/dedup``'s incremental MinHash machinery —
  ``build_minhash_index`` / ``incremental_minhash_pairs`` /
  ``extend_minhash_index`` (delta-vs-corpus + delta-vs-delta, NEVER
  corpus-vs-corpus; seeded deterministic hashing so index rows built
  yesterday match a delta hashed today);
* ``sources/snapshots``' epoch-ledger pattern (``snapshot_sink``):
  every micro-batch commit carries its ``stream@{batch_id}`` tag in
  the manifest operation, so a batch replayed after a crash is
  detected in table history and skipped.

Per micro-batch of documents the sink (a) probes the CURRENT index
tables for near-dup pairs involving the batch, (b) appends those pairs
to a pairs table, then (c) extends the index by appending the batch's
band and shingle rows. Three tables cannot commit in one atomic
publish, so exactly-once is per-table idempotence plus a FIXED commit
order (pairs -> bands -> shingles): a crash loses only a suffix, and
the replay recomputes deterministically, skips the tables whose epoch
already landed, and commits the rest — every interleaving converges to
the same state as one clean run. The probe in a replay is consistent
because the index can only already contain the batch's rows when the
pairs commit also landed (order), in which case the probe is skipped
entirely.

Scale: per batch the work is O(delta x bands + matched buckets) —
exactly the incremental regime's contract; the index tables grow by
appends (small files), so periodic ``SnapshotTable.compact`` is the
maintenance pass, exactly like any streaming table sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_zero_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_HASHES,
    MinHashIndex,
    build_minhash_index,
    incremental_minhash_pairs,
)
from etl_zero_spark.sources.snapshots import SnapshotTable


class StreamingNeardupState:
    """The three snapshot tables a streaming near-dedup pipeline owns,
    rooted under one directory: ``pairs/`` (the near-dup pair feed,
    one epoch-tagged append per micro-batch), ``bands/`` and
    ``shingles/`` (the persisted MinHash index)."""

    def __init__(self, root: str, k: int = 3,
                 num_hashes: int = MINHASH_HASHES, bands: int = MINHASH_BANDS):
        import os

        self.pairs = SnapshotTable(os.path.join(root, "pairs"))
        self.bands = SnapshotTable(os.path.join(root, "bands"))
        self.shingles = SnapshotTable(os.path.join(root, "shingles"))
        self.k, self.num_hashes, self.n_bands = k, num_hashes, bands

    def index(self, spark) -> MinHashIndex | None:
        """The current persisted index, or None before the first
        extension commit."""
        if self.bands.current_version() is None:
            return None
        return MinHashIndex(
            self.bands.read(spark),
            self.shingles.read(spark),
            self.k,
            self.num_hashes,
            self.n_bands,
        )

    def committed_epochs(self, table: SnapshotTable) -> set[str]:
        from etl_zero_spark.sources.snapshots import committed_stream_epochs

        return committed_stream_epochs(table)

    def compact(self, spark, target_file_mb: int = 128) -> dict[str, int]:
        """Maintenance pass: bin-pack each state table's
        append-scattered small files (every micro-batch adds a commit,
        so a long-running ingest accumulates one small file per epoch
        per table). Compaction adds a NEW version and rewrites no
        manifests, so the ``stream@`` epoch tags stay in history and
        replay detection is unaffected; only ``vacuum`` below the
        epochs' versions would forget them (at which point the stream's
        checkpoint is the remaining replay guard). Returns the new
        version per table."""
        out = {}
        for name, t in (
            ("pairs", self.pairs),
            ("bands", self.bands),
            ("shingles", self.shingles),
        ):
            if t.current_version() is not None:
                out[name] = t.compact(spark, target_file_mb=target_file_mb)
        return out


def streaming_neardup_sink(
    stream_docs: DataFrame,
    state: StreamingNeardupState,
    query_name: str,
    checkpoint: str,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the exactly-once streaming near-dedup query over a
    document stream. Returns the started StreamingQuery (availableNow
    trigger — drain what's arrived, then stop: the scheduled-ingest
    shape; the caller owns awaiting it).

    Document ids must be unique ACROSS batches (the incremental API's
    disjointness contract — reuse would alias pairs); gate upstream
    with ``incremental_minhash_pairs(check_disjoint_ids=True)``
    semantics if the feed cannot guarantee it.
    """
    # Ledgers loaded once per query start, maintained in writer memory
    # (single writer per sink query — snapshot_sink's pattern).
    seen = {
        t: state.committed_epochs(t)
        for t in (state.pairs, state.bands, state.shingles)
    }

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"stream@{batch_id}"
        spark = batch_df.sparkSession
        docs = batch_df.select(id_col, text_col)
        if tag not in seen[state.pairs]:
            idx = state.index(spark)
            if idx is None:
                # empty index with the right schema/geometry: the
                # incremental probe then yields exactly the batch's
                # self-pairs (delta-vs-delta)
                idx = build_minhash_index(
                    docs.limit(0), state.k, state.num_hashes, state.n_bands,
                    text_col, id_col,
                )
            pairs = incremental_minhash_pairs(
                docs, idx, threshold=threshold, text_col=text_col, id_col=id_col
            )
            state.pairs.commit(pairs, mode="append", operation_prefix=tag)
            seen[state.pairs].add(tag)
        d_idx = build_minhash_index(
            docs, state.k, state.num_hashes, state.n_bands, text_col, id_col
        )
        if tag not in seen[state.bands]:
            state.bands.commit(d_idx.bands, mode="append", operation_prefix=tag)
            seen[state.bands].add(tag)
        if tag not in seen[state.shingles]:
            state.shingles.commit(
                d_idx.shingles, mode="append", operation_prefix=tag
            )
            seen[state.shingles].add(tag)

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def resolved_keep_set(
    spark,
    state: StreamingNeardupState,
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The RESOLUTION the pairs feed exists for (VERDICT r6 #5 — the
    sink emitted pairs but nothing consumed them): the rows of ``docs``
    surviving near-dup removal under dd6's keep-min-id rule, driven by
    the ACCUMULATED streaming pairs table instead of a fresh corpus
    re-pairing. One anti-join against the distinct higher-id side of
    the pairs table — O(|pairs|), never a re-shingle of the corpus;
    the daily-ingest consumer reads yesterday's keep-set without
    re-running any similarity work. Before the first pairs commit the
    whole corpus is trivially kept.

    ``docs`` is whatever id-carrying frame the caller wants filtered
    (the raw ingest table, or a later pipeline stage — the keep-set is
    a pure id predicate). Feed the same pairs table to
    ``prepare_corpus(near_dedup_pairs=...)`` to slot this into the
    corpus pipeline's near-dedup stage.
    """
    from etl_zero_spark.operators.dedup import dedup_keep_min

    if state.pairs.current_version() is None:
        return docs
    return dedup_keep_min(docs, state.pairs.read(spark), id_col=id_col)
