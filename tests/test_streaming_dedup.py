"""Streaming incremental near-dedup (streaming/dedup.py — VERDICT r5
#5): micro-batched ingest with planted cross-batch duplicates must
yield exactly the batch re-run's pair set, extend the persisted index
exactly-once, and make checkpoint replays / epoch re-delivery no-ops.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import dedup
from etl_zero_spark.streaming.dedup import (
    StreamingNeardupState,
    streaming_neardup_sink,
)

# Two "days" of documents. Cross-batch near-dups planted: docs 20/21
# (day 2) duplicate docs 1/2 (day 1); in-batch dup 10~11 on day 1 and
# 22~23 on day 2; the rest unique.
_DAY1 = [
    (1, "the quick brown fox jumps over the lazy dog by the river"),
    (2, "spark structured streaming processes micro batches exactly once"),
    (10, "minhash banding buckets similar documents into shared band hashes"),
    (11, "minhash banding buckets similar documents into shared band hashes"),
    (12, "completely unrelated text about catalyst optimizer rule batches"),
]
_DAY2 = [
    (20, "the quick brown fox jumps over the lazy dog by the river"),
    (21, "spark structured streaming processes micro batches exactly once"),
    (22, "snapshot tables publish manifests with an atomic hard link"),
    (23, "snapshot tables publish manifests with an atomic hard link"),
    (24, "watermarks bound state for late arriving event time data"),
]


def _pairs_set(df):
    return {(r.a_id, r.b_id) for r in df.select("a_id", "b_id").collect()}


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
    q = streaming_neardup_sink(stream, state, name, ckpt, threshold=0.9)
    q.awaitTermination()
    return q


def test_streaming_matches_batch_rerun_and_replays_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_days(spark, src)
    state = StreamingNeardupState(str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, "neardup_stream")

    # result ≡ one batch run over the full corpus (the incremental
    # composition contract, now through the streaming path)
    all_docs = spark.createDataFrame(_DAY1 + _DAY2, "doc_id long, text string")
    expected = _pairs_set(dedup.minhash_lsh_pairs(all_docs, threshold=0.9))
    got = _pairs_set(state.pairs.read(spark))
    assert got == expected
    # the planted cross-batch dups are in there
    assert {(1, 20), (2, 21)} <= got
    # index extended once per batch: 2 epoch-tagged versions per table
    assert len(state.committed_epochs(state.bands)) == 2
    assert len(state.committed_epochs(state.shingles)) == 2
    assert state.bands.read(spark).select("id").distinct().count() == 10

    # checkpoint restart with no new data: zero new versions anywhere
    versions_before = (
        state.pairs.current_version(),
        state.bands.current_version(),
        state.shingles.current_version(),
    )
    _run(spark, src, state, ckpt, "neardup_stream_replay")
    assert versions_before == (
        state.pairs.current_version(),
        state.bands.current_version(),
        state.shingles.current_version(),
    )
    assert _pairs_set(state.pairs.read(spark)) == expected


def test_crash_suffix_replay_converges(spark, tmp_path):
    """Simulate the crash window the commit order defends: epoch 0's
    pairs commit landed but the index extension did not. Re-delivering
    the SAME batch must skip pairs and commit only the missing tables
    — final state identical to a clean run."""
    docs0 = spark.createDataFrame(_DAY1, "doc_id long, text string")
    state = StreamingNeardupState(str(tmp_path / "state"))

    # hand-run the crashed attempt: pairs committed, bands/shingles not
    idx0 = dedup.build_minhash_index(docs0.limit(0))
    pairs0 = dedup.incremental_minhash_pairs(docs0, idx0, threshold=0.9)
    state.pairs.commit(pairs0, mode="append", operation_prefix="stream@0")

    # replay epoch 0 through the sink's processor
    from etl_zero_spark.streaming import dedup as sdedup

    sink_seen = {
        t: state.committed_epochs(t)
        for t in (state.pairs, state.bands, state.shingles)
    }
    assert sink_seen[state.pairs] == {"stream@0"}
    assert sink_seen[state.bands] == set()

    # drive _process directly (foreachBatch hands it the batch)
    src = str(tmp_path / "src")
    docs0.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    q = sdedup.streaming_neardup_sink(
        stream, state, "crash_replay", str(tmp_path / "ckpt"), threshold=0.9
    )
    q.awaitTermination()

    # pairs NOT duplicated; index now extended exactly once
    assert state.pairs.current_version() == 0
    assert _pairs_set(state.pairs.read(spark)) == _pairs_set(pairs0)
    assert state.committed_epochs(state.bands) == {"stream@0"}
    assert state.committed_epochs(state.shingles) == {"stream@0"}
    assert state.bands.read(spark).select("id").distinct().count() == 5


def test_compact_preserves_ledger_and_next_day_probe(spark, tmp_path):
    """The maintenance pass bin-packs each state table without
    disturbing the epoch ledger, and a later ingest day probes the
    compacted index to the same pairs a batch re-run yields."""
    src = str(tmp_path / "src")
    _write_days(spark, src)
    state = StreamingNeardupState(str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, "neardup_maint")
    epochs_before = state.committed_epochs(state.bands)

    new_versions = state.compact(spark, target_file_mb=128)
    assert set(new_versions) == {"pairs", "bands", "shingles"}
    # ledger intact across compaction (history keeps old manifests)
    assert state.committed_epochs(state.bands) == epochs_before
    # fewer files, same rows
    m = state.bands.manifest(new_versions["bands"])
    assert len(m["files"]) <= 2
    assert state.bands.read(spark).count() == m["rows"]

    # day 3 arrives after compaction: new near-dups vs day-1 docs
    import os

    day3 = [(30, _DAY1[0][1]), (31, "entirely novel text about nothing else")]
    spark.createDataFrame(day3, "doc_id long, text string").coalesce(1).write.parquet(
        os.path.join(src, "day2")
    )
    _run(spark, src, state, ckpt, "neardup_maint_d3")
    all_docs = spark.createDataFrame(
        _DAY1 + _DAY2 + day3, "doc_id long, text string"
    )
    expected = _pairs_set(dedup.minhash_lsh_pairs(all_docs, threshold=0.9))
    assert _pairs_set(state.pairs.read(spark)) == expected
    assert (1, 30) in _pairs_set(state.pairs.read(spark))


def test_keep_set_closes_the_loop_into_prepare_corpus(spark, tmp_path):
    """VERDICT r6 #5: the pairs the streaming sink accumulates must
    DRIVE a resolution — resolved_keep_set over the streamed state
    equals a batch dedup_keep_min re-run, and prepare_corpus consuming
    the streamed pairs table (near_dedup_pairs=...) yields the same
    surviving rows as re-pairing the corpus in-pipeline. NEAR (not
    exact) cross-batch duplicates, so the pipeline's exact-dedup stage
    cannot mask the near-dedup stage under test."""
    import os

    from etl_zero_spark.plans.corpus_pipeline import prepare_corpus
    from etl_zero_spark.streaming.dedup import resolved_keep_set

    day1 = [
        (1, "the quick brown fox jumps over the lazy dog by the river bank"),
        (2, "spark structured streaming processes micro batches exactly once with checkpointed state stores"),
        (3, "completely unrelated text about catalyst optimizer rule batches"),
    ]
    day2 = [  # 20 ~ 1 and 21 ~ 2 with one token APPENDED: jaccard
        # 11/12 = 0.917 and 10/11 = 0.909, both >= 0.9 (a CHANGED token
        # would cut 3 shingles and land near 0.8) — near, not exact
        (20, "the quick brown fox jumps over the lazy dog by the river bank shore"),
        (21, "spark structured streaming processes micro batches exactly once with checkpointed state stores nightly"),
        (22, "watermarks bound state for late arriving event time data"),
    ]
    src = str(tmp_path / "src")
    for i, day in enumerate((day1, day2)):
        spark.createDataFrame(day, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"day{i}"))
    state = StreamingNeardupState(str(tmp_path / "state"))
    _run(spark, src, state, str(tmp_path / "ckpt"), "keepset_loop")

    union = spark.createDataFrame(day1 + day2, "doc_id long, text string")
    # 1) keep-set view == batch keep-min re-run over the union corpus
    streamed_keep = {r.doc_id for r in resolved_keep_set(spark, state, union).collect()}
    batch_pairs = dedup.minhash_lsh_pairs(union, threshold=0.9)
    batch_keep = {r.doc_id for r in dedup.dedup_keep_min(union, batch_pairs).collect()}
    assert streamed_keep == batch_keep == {1, 2, 3, 22}

    # 2) prepare_corpus consumes the streamed pairs table for its
    #    near-dedup stage — same survivors as the in-pipeline re-pair,
    #    and the expensive pairing stage never runs in this process.
    common = dict(quality=False, shuffle_seed=None, collect_stats=True)
    via_stream = prepare_corpus(
        union, near_dedup_pairs=state.pairs.read(spark),
        near_dedup_threshold=None, **common,
    )
    via_repair = prepare_corpus(union, near_dedup_threshold=0.9, **common)
    got = {r.doc_id for r in via_stream.df.select("doc_id").collect()}
    want = {r.doc_id for r in via_repair.df.select("doc_id").collect()}
    assert got == want == {1, 2, 3, 22}
    assert via_stream.stats["near_dedup"] == via_repair.stats["near_dedup"] == 4
    via_stream.unpersist(); via_repair.unpersist()


def test_keep_set_respects_upstream_gates(spark, tmp_path):
    """Review r7: a streamed pair whose KEEPER (min id) is removed by
    an upstream gate must not still condemn the surviving member —
    the in-pipeline path only ever pairs gate survivors, and the
    external-feed path must reproduce that. Here the blocklist drops
    doc 1 (the keeper of planted pair (1, 20)); doc 20 must SURVIVE
    on both paths."""
    import os

    from pyspark.sql import functions as F

    from etl_zero_spark.plans.corpus_pipeline import prepare_corpus

    day1 = [
        (1, "the quick brown fox jumps over the lazy dog by the river bank", "spamco"),
        (2, "spark structured streaming processes micro batches exactly once with checkpointed state stores", "good"),
        (3, "completely unrelated text about catalyst optimizer rule batches", "good"),
    ]
    day2 = [
        (20, "the quick brown fox jumps over the lazy dog by the river bank shore", "good"),
        (21, "spark structured streaming processes micro batches exactly once with checkpointed state stores nightly", "good"),
        (22, "watermarks bound state for late arriving event time data", "good"),
    ]
    schema = "doc_id long, text string, source string"
    src = str(tmp_path / "src")
    for i, day in enumerate((day1, day2)):
        spark.createDataFrame(day, schema).select("doc_id", "text").coalesce(
            1
        ).write.parquet(os.path.join(src, f"day{i}"))
    state = StreamingNeardupState(str(tmp_path / "state"))
    _run(spark, src, state, str(tmp_path / "ckpt"), "keepset_gate")

    union = spark.createDataFrame(day1 + day2, schema)
    common = dict(
        blocked_sources=["spamco"], quality=False, shuffle_seed=None,
        collect_stats=True,
    )
    via_stream = prepare_corpus(
        union, near_dedup_pairs=state.pairs.read(spark),
        near_dedup_threshold=None, **common,
    )
    via_repair = prepare_corpus(union, near_dedup_threshold=0.9, **common)
    got = {r.doc_id for r in via_stream.df.select("doc_id").collect()}
    want = {r.doc_id for r in via_repair.df.select("doc_id").collect()}
    # doc 1 blocked; 20 survives (its only near-twin was gated away);
    # 21 still drops (its keeper 2 survived)
    assert got == want == {2, 3, 20, 22}
    via_stream.unpersist(); via_repair.unpersist()
