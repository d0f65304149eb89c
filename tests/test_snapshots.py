"""Snapshot tables (sources/snapshots.py) + incremental materialized
views (operators/matview.py).

Contracts under test:

* commit/read round-trip, append vs overwrite semantics;
* time travel: every historical version stays byte-stable after later
  commits; a reader's pinned file list survives an overwrite;
* atomicity: staged-but-unpublished data (crashed writer) is invisible;
* optimistic concurrency: racing the same parent version yields exactly
  one winner; ``expected_version`` guards read-modify-write;
* rollback restores old contents as a NEW auditable version;
* read_changes == the appended rows, and REFUSES non-append history;
* vacuum deletes exactly the unreferenced files, keeps pinned history;
* matview: incremental refresh equals the full recompute for every
  decomposable aggregate (incl. avg + HLL), cursor makes replay a
  no-op, base overwrite triggers full-recompute fallback, and
  non-decomposable specs are rejected.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators.matview import (
    MaterializedAgg,
    finalize,
    merge_partials,
    partial_agg,
    validate_spec,
)
from etl_zero_spark.sources.snapshots import CommitConflict, SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"))


def test_commit_read_roundtrip(spark, tbl):
    v0 = tbl.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    assert v0 == 0
    got = sorted(tbl.read(spark).collect(), key=lambda r: r.id)
    assert [(r.id, r.grp, r.v) for r in got] == [(1, "a", 1.0), (2, "b", 2.0)]


def test_append_and_time_travel(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(2, "b", 2.0)]), mode="append")
    v2 = tbl.commit(_df(spark, [(9, "z", 9.0)]), mode="overwrite")
    assert v2 == 2
    assert tbl.read(spark, version=0).count() == 1
    assert tbl.read(spark, version=1).count() == 2
    assert {r.id for r in tbl.read(spark, version=1).collect()} == {1, 2}
    assert {r.id for r in tbl.read(spark).collect()} == {9}
    hist = tbl.history()
    assert [h["version"] for h in hist] == [2, 1, 0]
    assert hist[1]["operation"] == "append"


def test_pinned_reader_survives_overwrite(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    pinned = tbl.read(spark)  # plan pins version-0 file list
    tbl.commit(_df(spark, [(3, "b", 3.0)]), mode="overwrite")
    # the pinned plan still reads version 0's files
    assert {r.id for r in pinned.collect()} == {1, 2}


def test_crashed_writer_invisible(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    # simulate a crash between staging and publish: stage writes files
    # but no manifest appears
    tbl._stage(_df(spark, [(99, "x", 99.0)]))
    assert tbl.current_version() == 0
    assert {r.id for r in tbl.read(spark).collect()} == {1}
    # vacuum reclaims the orphaned commit dir
    dead = tbl.vacuum(keep_versions=1)
    assert len(dead["deleted_files"]) >= 1
    assert {r.id for r in tbl.read(spark).collect()} == {1}


def test_commit_conflict_cas(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    # two writers stage against parent 0; both publish version 1 — the
    # CAS admits exactly one
    m = tbl.manifest(0)
    f1, r1, s1, _ = tbl._stage(_df(spark, [(2, "b", 2.0)]))
    f2, r2, s2, _ = tbl._stage(_df(spark, [(3, "c", 3.0)]))
    base = {"parent": 0, "operation": "overwrite", "added_files": [], "committed_at": 0.0}
    tbl._publish({**base, "version": 1, "files": f1, "rows": r1, "schema": s1}, 1)
    with pytest.raises(CommitConflict):
        tbl._publish({**base, "version": 1, "files": f2, "rows": r2, "schema": s2}, 1)
    assert {r.id for r in tbl.read(spark).collect()} == {2}


def test_expected_version_guard(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(2, "b", 2.0)]), mode="append")
    with pytest.raises(CommitConflict):
        tbl.commit(_df(spark, [(3, "c", 3.0)]), expected_version=0)


def test_rollback_is_new_version(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(9, "z", 9.0)]), mode="overwrite")
    v = tbl.rollback(0)
    assert v == 2
    assert {r.id for r in tbl.read(spark).collect()} == {1}
    # the bad version stays in history for audit
    assert {r.id for r in tbl.read(spark, version=1).collect()} == {9}


def test_read_changes_append_only(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(2, "b", 2.0), (3, "b", 3.0)]), mode="append")
    tbl.commit(_df(spark, [(4, "c", 4.0)]), mode="append")
    delta = tbl.read_changes(spark, 0)
    assert {r.id for r in delta.collect()} == {2, 3, 4}
    delta12 = tbl.read_changes(spark, 1, 2)
    assert {r.id for r in delta12.collect()} == {4}


def test_read_changes_refuses_overwrite(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(2, "b", 2.0)]), mode="overwrite")
    with pytest.raises(ValueError, match="non-append"):
        tbl.read_changes(spark, 0)


def test_vacuum_retention(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    tbl.commit(_df(spark, [(2, "b", 2.0)]), mode="overwrite")
    tbl.commit(_df(spark, [(3, "c", 3.0)]), mode="overwrite")
    plan = tbl.vacuum(keep_versions=2, dry_run=True)
    assert plan["dropped_versions"] == [0]
    assert len(plan["deleted_files"]) >= 1
    # dry run deleted nothing
    assert tbl.read(spark, version=0).count() == 1
    out = tbl.vacuum(keep_versions=2)
    assert out["dropped_versions"] == [0]
    # retained versions still read fine
    assert {r.id for r in tbl.read(spark, version=1).collect()} == {2}
    assert {r.id for r in tbl.read(spark).collect()} == {3}
    # expired manifest is gone
    assert tbl.versions() == [1, 2]


def test_compact_preserves_contents(spark, tbl):
    tbl.commit(_df(spark, [(i, "a", float(i)) for i in range(10)]))
    for i in range(10, 14):
        tbl.commit(_df(spark, [(i, "b", float(i))]), mode="append")
    n_files_before = len(tbl.manifest(tbl.current_version())["files"])
    v = tbl.compact(spark)
    m = tbl.manifest(v)
    assert len(m["files"]) < n_files_before
    assert tbl.read(spark).count() == 14
    assert {r.id for r in tbl.read(spark).collect()} == set(range(14))


def test_empty_commit_reads_back_empty(spark, tbl):
    tbl.commit(_df(spark, []).where(F.lit(False)))
    df = tbl.read(spark)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "grp", "v"]


# --- matview ----------------------------------------------------------------

AGGS = {"v": ["sum", "count", "min", "max", "avg"], "grp": ["approx_count_distinct"]}


def _mv(spark, tmp_path):
    base = SnapshotTable(str(tmp_path / "base"))
    state = SnapshotTable(str(tmp_path / "state"))
    return base, MaterializedAgg(base, state, keys=["grp"], aggs=AGGS)


def _expected(spark, base):
    return (
        base.read(spark)
        .groupBy("grp")
        .agg(
            F.sum("v").alias("v_sum"),
            F.count("v").alias("v_count"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.avg("v").alias("v_avg"),
        )
    )


def _assert_view_matches(spark, base, mv):
    got = {
        r.grp: (r.v_sum, r.v_count, r.v_min, r.v_max, round(r.v_avg, 9))
        for r in mv.read(spark).collect()
    }
    want = {
        r.grp: (r.v_sum, r.v_count, r.v_min, r.v_max, round(r.v_avg, 9))
        for r in _expected(spark, base).collect()
    }
    assert got == want


def test_matview_incremental_equals_full(spark, tmp_path):
    base, mv = _mv(spark, tmp_path)
    base.commit(_df(spark, [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0)]))
    r = mv.refresh(spark)
    assert r["mode"] == "full"
    _assert_view_matches(spark, base, mv)
    base.commit(
        _df(spark, [(4, "a", 7.0), (5, "c", 2.0), (6, "b", -1.0)]), mode="append"
    )
    r = mv.refresh(spark)
    assert r["mode"] == "incremental"
    _assert_view_matches(spark, base, mv)
    # HLL estimate present and sane (1 distinct grp value per group)
    for row in mv.read(spark).collect():
        assert row.grp_approx_count_distinct == 1


def test_matview_replay_noop(spark, tmp_path):
    base, mv = _mv(spark, tmp_path)
    base.commit(_df(spark, [(1, "a", 1.0)]))
    mv.refresh(spark)
    r = mv.refresh(spark)
    assert r["mode"] == "noop"


def test_matview_overwrite_falls_back_to_full(spark, tmp_path):
    base, mv = _mv(spark, tmp_path)
    base.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    mv.refresh(spark)
    base.commit(_df(spark, [(7, "a", 7.0)]), mode="overwrite")
    r = mv.refresh(spark)
    assert r["mode"] == "full"
    _assert_view_matches(spark, base, mv)


def test_matview_multi_round_incremental(spark, tmp_path):
    base, mv = _mv(spark, tmp_path)
    base.commit(_df(spark, [(1, "a", 2.0)]))
    mv.refresh(spark)
    for i in range(2, 6):
        base.commit(
            _df(spark, [(i, "ab"[i % 2], float(i) * 1.5)]), mode="append"
        )
        r = mv.refresh(spark)
        assert r["mode"] == "incremental"
        _assert_view_matches(spark, base, mv)


def test_matview_rejects_non_decomposable():
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        validate_spec({"v": ["count_distinct"]})
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        validate_spec({"v": ["median"]})


def test_partial_merge_algebra(spark):
    """merge(partial(A), partial(B)) == partial(A ∪ B) — the algebraic
    identity the whole module rests on, checked directly."""
    a = _df(spark, [(1, "g", 1.0), (2, "g", 4.0), (3, "h", 2.0)])
    b = _df(spark, [(4, "g", -3.0), (5, "h", 8.0), (6, "h", 0.5)])
    aggs = {"v": ["sum", "count", "min", "max", "avg"]}
    merged = finalize(
        merge_partials(
            partial_agg(a, ["grp"], aggs), partial_agg(b, ["grp"], aggs), ["grp"], aggs
        ),
        ["grp"],
        aggs,
    )
    direct = finalize(partial_agg(a.unionByName(b), ["grp"], aggs), ["grp"], aggs)
    got = {r.grp: (r.v_sum, r.v_count, r.v_min, r.v_max, r.v_avg) for r in merged.collect()}
    want = {r.grp: (r.v_sum, r.v_count, r.v_min, r.v_max, r.v_avg) for r in direct.collect()}
    assert got == want


# --- streaming sink ---------------------------------------------------------


def test_snapshot_sink_exactly_once(spark, tmp_path):
    """availableNow stream lands in the snapshot table; a replayed
    epoch (same batch id, e.g. fresh checkpoint reprocessing the same
    input) is detected in the manifest history and skipped — rows are
    never duplicated."""
    from etl_zero_spark.sources.snapshots import snapshot_sink
    from etl_zero_spark.streaming import events as sev
    from tests.conftest import SF_SMOKE

    tbl = SnapshotTable(str(tmp_path / "sink"))
    stream = sev.read_events_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "value"
    )
    n_fixture = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    )

    q = snapshot_sink(stream, tbl, "t_snap_sink", str(tmp_path / "ck1"))
    q.awaitTermination()
    assert tbl.read(spark).count() == n_fixture
    v1 = tbl.current_version()
    assert tbl.manifest(v1)["operation"].startswith("stream@")

    # same checkpoint: no new input -> no new batches -> no new versions
    q = snapshot_sink(stream, tbl, "t_snap_sink", str(tmp_path / "ck1"))
    q.awaitTermination()
    assert tbl.current_version() == v1

    # FRESH checkpoint: Spark replays everything as batch 0 again; the
    # sink sees stream@0 in history and skips — exactly-once holds
    q = snapshot_sink(stream, tbl, "t_snap_sink", str(tmp_path / "ck2"))
    q.awaitTermination()
    assert tbl.current_version() == v1
    assert tbl.read(spark).count() == n_fixture

    # downstream incremental consumers see the appended files
    if v1 > 0:
        assert tbl.read_changes(spark, v1 - 1, v1).count() > 0
    else:  # single epoch: the whole table IS the first delta
        assert tbl.manifest(v1)["added_files"] == tbl.manifest(v1)["files"]


# --- data skipping ----------------------------------------------------------


def test_manifest_stats_and_read_where(spark, tbl):
    """Per-file min/max ride the manifest; a range read plans only the
    overlapping files and still returns exact results."""
    # three appends with disjoint id ranges -> three separately
    # stat-bounded commit dirs
    tbl.commit(_df(spark, [(i, "a", float(i)) for i in range(0, 10)]).coalesce(1))
    tbl.commit(
        _df(spark, [(i, "b", float(i)) for i in range(100, 110)]).coalesce(1),
        mode="append",
    )
    tbl.commit(
        _df(spark, [(i, "c", float(i)) for i in range(200, 210)]).coalesce(1),
        mode="append",
    )
    m = tbl.manifest(tbl.current_version())
    assert m["stats"], "stats missing from manifest"
    pr = tbl.prune_files("id", 100, 109)
    assert pr["n_total"] == 3 and pr["n_kept"] == 1
    got = {r.id for r in tbl.read_where(spark, "id", 100, 109).collect()}
    assert got == set(range(100, 110))
    # open ranges
    assert tbl.prune_files("id", 150, None)["n_kept"] == 1
    assert tbl.prune_files("id", None, 50)["n_kept"] == 1
    # unknown column -> conservatively keep everything
    assert tbl.prune_files("nope", 0, 1)["n_kept"] == 3


def test_read_where_exact_at_file_boundaries(spark, tbl):
    """Skipping is a superset filter: rows outside [lo, hi] inside a
    kept file are still filtered out by the residual predicate."""
    tbl.commit(_df(spark, [(i, "a", float(i)) for i in range(0, 100)]).coalesce(1))
    got = sorted(r.id for r in tbl.read_where(spark, "id", 10, 12).collect())
    assert got == [10, 11, 12]


def test_string_stats_prune(spark, tbl):
    tbl.commit(
        _df(spark, [(1, "apple", 1.0), (2, "banana", 1.0)]).coalesce(1)
    )
    tbl.commit(
        _df(spark, [(3, "yak", 1.0), (4, "zebra", 1.0)]).coalesce(1), mode="append"
    )
    assert tbl.prune_files("grp", "x", "zzz")["n_kept"] == 1
    got = {r.grp for r in tbl.read_where(spark, "grp", "x", "zzz").collect()}
    assert got == {"yak", "zebra"}


# --- schema guard + copy-on-write upsert ------------------------------------


def test_append_schema_guard(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    drifted = spark.createDataFrame([(2, "b")], "id long, grp string")
    with pytest.raises(ValueError, match="schema mismatch"):
        tbl.commit(drifted, mode="append")
    # overwrite is the explicit evolution path
    v = tbl.commit(drifted, mode="overwrite")
    assert [f.name for f in tbl.read(spark).schema.fields] == ["id", "grp"]
    assert v == 1


def test_upsert_semantics_and_pruning(spark, tbl):
    """Updates replace matching keys, new keys insert; files outside
    the update key range survive UNREWRITTEN (same paths in the new
    manifest)."""
    # three range-disjoint files
    tbl.commit(_df(spark, [(i, "a", float(i)) for i in range(0, 10)]).coalesce(1))
    tbl.commit(
        _df(spark, [(i, "b", float(i)) for i in range(100, 110)]).coalesce(1),
        mode="append",
    )
    tbl.commit(
        _df(spark, [(i, "c", float(i)) for i in range(200, 210)]).coalesce(1),
        mode="append",
    )
    before = tbl.manifest(tbl.current_version())
    ups = _df(spark, [(105, "UPD", -1.0), (150, "NEW", -2.0)])
    v = tbl.upsert(spark, ups, key="id")
    after = tbl.manifest(v)
    assert after["operation"].startswith("upsert(1/3")
    # the low and high files survived by path
    survivors = set(before["files"]) & set(after["files"])
    assert len(survivors) == 2
    rows = {r.id: (r.grp, r.v) for r in tbl.read(spark).collect()}
    assert rows[105] == ("UPD", -1.0)          # replaced
    assert rows[150] == ("NEW", -2.0)          # inserted
    assert rows[104] == ("b", 104.0)           # same-file neighbor kept
    assert rows[5] == ("a", 5.0) and rows[205] == ("c", 205.0)
    assert len(rows) == 31
    assert after["rows"] == 31
    # time travel still serves the pre-upsert table
    assert {r.id for r in tbl.read(spark, version=v - 1).collect()} == (
        set(range(0, 10)) | set(range(100, 110)) | set(range(200, 210))
    )


def test_upsert_empty_batch_noop(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    v = tbl.upsert(spark, _df(spark, []).where(F.lit(False)), key="id")
    assert v == 0 and tbl.current_version() == 0


def test_upsert_matches_full_merge(spark, tbl):
    """Pruned copy-on-write result == the naive full-table merge."""
    tbl.commit(
        _df(spark, [(i, "x", float(i)) for i in range(0, 50)]).repartitionByRange(
            4, "id"
        )
    )
    ups = _df(spark, [(i, "u", -float(i)) for i in (3, 17, 17, 44, 99)]).dropDuplicates(["id"])
    base = tbl.read(spark)
    want_df = base.join(ups.select("id"), "id", "left_anti").unionByName(ups)
    want = {(r.id, r.grp, r.v) for r in want_df.collect()}
    tbl.upsert(spark, ups, key="id")
    got = {(r.id, r.grp, r.v) for r in tbl.read(spark).collect()}
    assert got == want


def test_zone_snapshot_accessor(spark, tmp_path):
    """Zones expose the transactional table path: commit via the zone,
    read versions back, coexisting with the plain parquet layout."""
    from etl_zero_spark.catalog import Zone

    zone = Zone(str(tmp_path), "golden")
    df = _df(spark, [(1, "a", 1.0)])
    zone.write(df, "t")  # plain layout
    snap = zone.snapshot("t")
    snap.commit(df)
    snap.commit(_df(spark, [(2, "b", 2.0)]), mode="append")
    assert snap.read(spark).count() == 2
    assert snap.read(spark, version=0).count() == 1
    assert zone.read(spark, "t").count() == 1  # plain path untouched


def test_diff_rows_multiset_and_keyed(spark, tbl):
    """Row-level CDC across an overwrite: inserts/deletes as multiset
    diff; keyed mode classifies updates with both images."""
    tbl.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    tbl.commit(
        _df(spark, [(1, "a", 1.0), (2, "B", 2.5), (4, "d", 4.0)]),
        mode="overwrite",
    )
    plain = tbl.diff_rows(spark, 0, 1)
    got = {(r.id, r.grp, r._change_type) for r in plain.collect()}
    assert got == {
        (2, "B", "insert"), (4, "d", "insert"),
        (2, "b", "delete"), (3, "c", "delete"),
    }  # unchanged row 1 never surfaces
    keyed = tbl.diff_rows(spark, 0, 1, key="id")
    got = {(r.id, r._change_type) for r in keyed.collect()}
    assert got == {
        (2, "update_pre"), (2, "update_post"),
        (3, "delete"), (4, "insert"),
    }


def test_diff_rows_skips_shared_files(spark, tbl):
    """Shared untouched files cancel BEFORE any row work: after a
    pruned upsert the diff plan reads only the rewritten + new files."""
    tbl.commit(_df(spark, [(i, "a", float(i)) for i in range(0, 10)]).coalesce(1))
    tbl.commit(
        _df(spark, [(i, "b", float(i)) for i in range(100, 110)]).coalesce(1),
        mode="append",
    )
    v0 = tbl.current_version()
    tbl.upsert(spark, _df(spark, [(105, "UPD", -1.0)]), key="id")
    d = tbl.diff_rows(spark, v0, key="id")
    got = {(r.id, r._change_type) for r in d.collect()}
    assert got == {(105, "update_pre"), (105, "update_post")}
    # the 0-9 file is shared between versions -> not in the diff scan
    plan = d._jdf.queryExecution().executedPlan().toString()
    a = tbl.manifest(v0)["files"]
    b = tbl.manifest(tbl.current_version())["files"]
    shared = set(a) & set(b)
    assert shared, "expected a surviving shared file"
    for f in shared:
        assert f.split("/")[-1] not in plan


def test_snapshot_sink_cdc_upsert(spark, tmp_path):
    """mode='upsert': a changelog stream MERGEs into the table per
    epoch — final state is last-writer-wins by key, replays skip."""
    from etl_zero_spark.sources.snapshots import snapshot_sink
    from etl_zero_spark.streaming import events as sev
    from tests.conftest import SF_SMOKE

    tbl = SnapshotTable(str(tmp_path / "cdc"))
    # seed: every event with a sentinel value
    seed = (
        load_smoke_events(spark)
        .select("event_id", "user_id")
        .withColumn("value", F.lit(-1.0))
    )
    tbl.commit(seed.coalesce(2))
    v0 = tbl.current_version()
    stream = sev.read_events_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "value"
    )
    q = snapshot_sink(
        stream, tbl, "t_cdc", str(tmp_path / "ck"), mode="upsert", key="event_id"
    )
    q.awaitTermination()
    v1 = tbl.current_version()
    assert v1 == v0 + 1
    assert tbl.manifest(v1)["operation"].startswith("stream@0:upsert(")
    cur = tbl.read(spark)
    assert cur.count() == seed.count()
    assert cur.where("value = -1.0").count() == 0  # every row replaced
    # replay with a fresh checkpoint: epoch 0 detected, no new version
    q = snapshot_sink(
        stream, tbl, "t_cdc", str(tmp_path / "ck2"), mode="upsert", key="event_id"
    )
    q.awaitTermination()
    assert tbl.current_version() == v1


def load_smoke_events(spark):
    from etl_zero_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    return load_table(spark, SF_SMOKE, "events")


def test_delete_where_metadata_only_drop(spark, tbl):
    """Fully-covered files are dropped without reading; boundary files
    are rewritten; disjoint files survive by path; NULL keys survive
    any range delete."""
    tbl.commit(_df(spark, [(i, "a", 1.0) for i in range(0, 10)]).coalesce(1))
    tbl.commit(
        _df(spark, [(i, "b", 1.0) for i in range(10, 20)]).coalesce(1),
        mode="append",
    )
    null_rows = spark.createDataFrame(
        [(None, "n", 9.0), (25, "c", 1.0)], "id long, grp string, v double"
    )
    tbl.commit(null_rows.coalesce(1), mode="append")
    before = tbl.manifest(tbl.current_version())
    v = tbl.delete_where(spark, "id", 10, 19)
    m = tbl.manifest(v)
    assert "1 files dropped metadata-only" in m["operation"]
    # the 0-9 file survived by path (disjoint)
    assert any(f in m["files"] for f in before["files"])
    got = {r.id for r in tbl.read(spark).collect()}
    assert got == set(range(0, 10)) | {None, 25}
    assert m["rows"] == 12
    # time travel still reaches the pre-delete version
    assert tbl.read(spark, version=v - 1).count() == 22


def test_delete_where_open_ranges_and_boundary(spark, tbl):
    tbl.commit(
        _df(spark, [(i, "x", 1.0) for i in range(0, 100)]).repartitionByRange(
            4, "id"
        )
    )
    v = tbl.delete_where(spark, "id", 37, None)  # delete everything >= 37
    got = sorted(r.id for r in tbl.read(spark).collect())
    assert got == list(range(0, 37))
    op = tbl.manifest(v)["operation"]
    assert "dropped metadata-only" in op and "rewritten" in op


def test_timestamp_stats_enable_time_pruning(spark, tmp_path, sf_dir):
    """TIMESTAMP_MICROS output (session conf) puts min/max footer stats
    on time columns, so retention deletes drop files metadata-only and
    time-range reads prune — the INT96 default writes NO stats and
    silently degrades both to full rewrites/scans."""
    import datetime as dt

    from etl_zero_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    tbl = SnapshotTable(str(tmp_path / "ev"))
    tbl.commit(ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"))
    m = tbl.manifest(0)
    assert any("ts" in s for s in m["stats"].values()), "no ts stats in manifest"
    lo = dt.datetime(2024, 1, 8)
    pr = tbl.prune_files("ts", None, lo)
    assert 0 < pr["n_kept"] < pr["n_total"]
    v = tbl.delete_where(spark, "ts", None, lo)
    assert "dropped metadata-only" in tbl.manifest(v)["operation"]
    assert int(tbl.manifest(v)["operation"].split("(")[1].split(" ")[0]) >= 1
    left = tbl.read(spark)
    assert left.where(F.col("ts") <= lo).count() == 0


def test_create_view_and_rows(spark, tbl):
    tbl.commit(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    tbl.commit(_df(spark, [(3, "c", 3.0)]), mode="overwrite")
    assert tbl.rows() == 1 and tbl.rows(version=0) == 2
    tbl.create_view(spark, "snap_v0", version=0)
    got = spark.sql("SELECT count(*) AS n FROM snap_v0").collect()[0].n
    assert got == 2
    # the view stays pinned to version 0 across later commits
    tbl.commit(_df(spark, [(9, "z", 9.0)]), mode="overwrite")
    assert spark.sql("SELECT count(*) AS n FROM snap_v0").collect()[0].n == 2


# --- bloom point index -------------------------------------------------------


def test_bloom_index_point_lookup(spark, tbl):
    """A NON-clustered key (scattered across every file) still point-
    prunes via per-file blooms; lookups are exact (no false negatives
    by construction), and append inherits the parent's blooms."""
    # 4 files laid out by grp (so id ranges overlap everywhere: min/max
    # stats CANNOT prune on id)
    df = spark.createDataFrame(
        [(i, "abcd"[i % 4], float(i)) for i in range(400)],
        "id long, grp string, v double",
    )
    tbl.commit(df.repartition(4, "grp"), index=["id"])
    m = tbl.manifest(0)
    assert m["bloom"] and all("id" in b for b in m["bloom"].values())
    # min/max would keep everything; bloom keeps ~1 file
    range_pr = tbl.prune_files("id", 137, 137)
    point_pr = tbl.prune_files_point("id", 137)
    assert point_pr["n_kept"] < range_pr["n_kept"]
    got = tbl.read_point(spark, "id", 137).collect()
    assert [(r.id, r.grp) for r in got] == [(137, "b")]
    # every value findable — blooms never false-negative
    for probe in (0, 1, 399, 200):
        assert tbl.read_point(spark, "id", probe).count() == 1
    # absent key: possibly a false-positive file read, never a row
    assert tbl.read_point(spark, "id", 100_000).count() == 0
    # append inherits parent blooms and indexes the new files
    tbl.commit(
        spark.createDataFrame([(1000, "z", 0.0)], "id long, grp string, v double"),
        mode="append",
        index=["id"],
    )
    assert tbl.read_point(spark, "id", 1000).count() == 1
    assert tbl.read_point(spark, "id", 137).count() == 1
    assert tbl.prune_files_point("id", 1000)["n_kept"] <= 2


def test_compact_with_clustering_restores_pruning(spark, tbl):
    """Arrival-ordered appends scatter each key range across every
    file (range pruning useless); cluster-compacting restores disjoint
    per-file ranges in one maintenance pass."""
    for batch in range(4):  # interleaved arrival: every batch spans the domain
        tbl.commit(
            _df(spark, [(i, "x", 1.0) for i in range(batch, 400, 4)]).coalesce(1),
            mode="append",
        )
    scattered = tbl.prune_files("id", 0, 50)
    assert scattered["n_kept"] == scattered["n_total"]  # nothing prunes
    tbl.compact(spark, cluster_by="id", n_files=4)
    clustered = tbl.prune_files("id", 0, 50)
    assert clustered["n_kept"] < clustered["n_total"]
    assert tbl.read(spark).count() == 400
    got = {r.id for r in tbl.read_where(spark, "id", 0, 50).collect()}
    assert got == set(range(0, 51))


def test_additive_schema_evolution_on_append(spark, tbl):
    """An append may ADD columns: the manifest schema widens and old
    files read NULL for the new field; drops/re-types stay refused."""
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    wider = spark.createDataFrame(
        [(2, "b", 2.0, "eu")], "id long, grp string, v double, region string"
    )
    tbl.commit(wider, mode="append")
    got = {r.id: r.region for r in tbl.read(spark).collect()}
    assert got == {1: None, 2: "eu"}
    # old version still reads with its own (narrow) schema
    assert "region" not in tbl.read(spark, version=0).columns
    # re-type stays refused
    retyped = spark.createDataFrame(
        [(3, "c", "not-a-double", "x")],
        "id long, grp string, v string, region string",
    )
    with pytest.raises(ValueError, match="re-typed"):
        tbl.commit(retyped, mode="append")


def test_concurrent_writers_race_cas(spark, tbl):
    """N threads race append commits with retry-on-conflict: every
    append eventually lands exactly once, versions are a linear chain,
    and no rows are lost or duplicated — the optimistic-concurrency
    contract under a real race, not just the two-staged-writers case."""
    import threading

    tbl.commit(_df(spark, [(0, "seed", 0.0)]))
    n_writers, results, errors = 6, [], []

    def writer(i):
        df = _df(spark, [(100 + i, f"w{i}", float(i))])
        for _ in range(50):  # retry loop — the documented CAS-loser path
            try:
                results.append(tbl.commit(df, mode="append"))
                return
            except CommitConflict:
                continue
        errors.append(i)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"writers starved: {errors}"
    assert sorted(results) == list(range(1, n_writers + 1))  # linear chain
    got = {r.id for r in tbl.read(spark).collect()}
    assert got == {0} | {100 + i for i in range(n_writers)}
    assert tbl.rows() == n_writers + 1
    # parent pointers chain without gaps
    for v in range(1, n_writers + 1):
        assert tbl.manifest(v)["parent"] == v - 1


def test_blooms_survive_unrelated_upsert_and_delete(spark, tbl):
    """Maintenance ops carry untouched files' blooms forward: point
    pruning keeps working after an upsert/delete elsewhere."""
    tbl.commit(
        _df(spark, [(i, "a", float(i)) for i in range(0, 100)]).coalesce(1),
        index=["id"],
    )
    tbl.commit(
        _df(spark, [(i, "b", float(i)) for i in range(1000, 1100)]).coalesce(1),
        mode="append",
        index=["id"],
    )
    tbl.upsert(spark, _df(spark, [(1050, "U", -1.0)]), key="id")
    # the untouched low file kept its bloom: a key in NO file excludes
    # it (rewritten files have no bloom yet and stay, conservatively)
    pr = tbl.prune_files_point("id", 999_999)
    assert pr["n_kept"] < pr["n_total"]
    m = tbl.manifest(tbl.current_version())
    assert m["bloom"], "untouched blooms were dropped"
    v = tbl.delete_where(spark, "id", 1000, 1200)
    assert tbl.manifest(v)["bloom"]
    assert tbl.prune_files_point("id", 999_999, version=v)["n_kept"] < len(
        tbl.manifest(v)["files"]
    )
    assert {r.id for r in tbl.read_point(spark, "id", 50).collect()} == {50}


def test_delete_where_numpy_bound_deletes_exact_range(spark, tbl):
    """ADVICE r4 (high): a numpy-scalar bound must mean what it says —
    np.int64(90) deletes rows 90..99, not the whole table. (numpy
    scalars now normalize through the abstract-number registries; the
    old str/int/float isinstance chain returned None for them, which
    the covered-classification read as an OPEN range end.)"""
    import numpy as np

    tbl.commit(
        _df(spark, [(i, "x", 1.0) for i in range(100)]).repartitionByRange(4, "id")
    )
    tbl.delete_where(spark, "id", np.int64(90), None)
    got = sorted(r.id for r in tbl.read(spark).collect())
    assert got == list(range(0, 90))


def test_delete_where_unmodeled_bound_rewrites_conservatively(spark, tmp_path):
    """A bound type the stats model doesn't cover (bool) must route
    every file to the exact-predicate rewrite path — never into the
    covered/disjoint classification where it reads as an open end."""
    t = SnapshotTable(str(tmp_path / "b"))
    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(20)], "id long, flag boolean"
    )
    t.commit(df.coalesce(2))
    v = t.delete_where(spark, "flag", True, True)
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == [i for i in range(20) if i % 2 == 1]
    assert "0 files dropped metadata-only" in t.manifest(v)["operation"]


def test_bloom_point_lookup_numeric_type_canonical(spark, tbl):
    """ADVICE r4: read_point(col, 5) and read_point(col, 5.0) must hit
    the same bloom bits (Spark's 5 == 5.0) — a type-sensitive hash
    yields FALSE NEGATIVES, i.e. silently empty exact lookups."""
    import numpy as np

    tbl.commit(
        _df(spark, [(i, "g", float(i)) for i in range(64)]).repartition(8),
        index=["id", "v"],
    )
    # double column probed with int / float / numpy scalars
    for probe in (5, 5.0, np.int64(5), np.float64(5.0)):
        assert [r.id for r in tbl.read_point(spark, "v", probe).collect()] == [5]
    # long column probed with a float literal
    assert [r.v for r in tbl.read_point(spark, "id", 7.0).collect()] == [7.0]


def test_bloom_format_version_guards_stale_hash(spark, tbl):
    """ADVICE r5: blooms persisted under the pre-canonical hash
    (manifests with no ``bloom_format`` stamp) probe DIFFERENT bit
    positions than the current code — trusting them silently skips
    files (empty point reads). Unstamped/mismatched sections must be
    ignored (conservative keep), commits inheriting them must
    propagate the distrust, and a fresh re-index restores pruning."""
    import json

    from etl_zero_spark.sources.snapshots import _BLOOM_FORMAT, _version_path

    df = spark.createDataFrame(
        [(i, "abcd"[i % 4], float(i)) for i in range(400)],
        "id long, grp string, v double",
    )
    tbl.commit(df.repartition(4, "grp"), index=["id"])
    assert tbl.manifest(0)["bloom_format"] == _BLOOM_FORMAT
    n_total = tbl.prune_files_point("id", 137)["n_total"]
    assert tbl.prune_files_point("id", 137)["n_kept"] < n_total
    # simulate a table written by the pre-v2 code: blooms present but
    # no format stamp (their bits are actually stale garbage)
    mpath = _version_path(tbl.root, 0)
    m = json.load(open(mpath))
    del m["bloom_format"]
    os.unlink(mpath)
    json.dump(m, open(mpath, "w"))
    # unstamped blooms are distrusted: every file kept, lookup exact
    pr = tbl.prune_files_point("id", 137)
    assert pr["n_kept"] == n_total
    assert [r.id for r in tbl.read_point(spark, "id", 137).collect()] == [137]
    # append on the unstamped parent: the merged bloom section mixes
    # formats, so the child must NOT claim the current stamp
    v1 = tbl.commit(
        spark.createDataFrame([(1000, "z", 0.0)], "id long, grp string, v double"),
        mode="append",
        index=["id"],
    )
    assert tbl.manifest(v1).get("bloom_format") != _BLOOM_FORMAT
    # blooms distrusted → all 4 scattered parent files kept; min/max
    # stats legitimately still prune the appended id=1000 file
    assert tbl.prune_files_point("id", 137, version=v1)["n_kept"] >= n_total
    # upsert likewise propagates the distrust
    v2 = tbl.upsert(
        spark,
        spark.createDataFrame([(137, "B", 137.5)], "id long, grp string, v double"),
        key="id",
    )
    assert tbl.manifest(v2).get("bloom_format") != _BLOOM_FORMAT
    # a full re-index (compact) rebuilds every bloom under the current
    # format: stamp restored, point pruning resumes
    v3 = tbl.compact(spark, n_files=4, cluster_by="grp", index=["id"])
    assert tbl.manifest(v3)["bloom_format"] == _BLOOM_FORMAT
    pr3 = tbl.prune_files_point("id", 137, version=v3)
    assert pr3["n_kept"] < pr3["n_total"]
    assert [r.grp for r in tbl.read_point(spark, "id", 137).collect()] == ["B"]


def test_compact_race_raises_instead_of_lost_update(spark, tbl, monkeypatch):
    """ADVICE r4: a writer landing between compact's read and its
    publish must surface as CommitConflict — compact previously
    committed without expected_version, silently overwriting the
    racer's rows with pre-commit contents."""
    tbl.commit(_df(spark, [(i, "a", 1.0) for i in range(10)]).coalesce(4))
    real_read = tbl.read
    raced = {"done": False}

    def read_then_race(spark_, version=None):
        df = real_read(spark_, version=version)
        if not raced["done"]:
            raced["done"] = True
            SnapshotTable(tbl.root).commit(
                _df(spark_, [(99, "z", 9.0)]), mode="append"
            )
        return df

    monkeypatch.setattr(tbl, "read", read_then_race)
    with pytest.raises(CommitConflict):
        tbl.compact(spark, n_files=1)
    # the racing append survived; nothing was lost
    assert 99 in {r.id for r in real_read(spark).collect()}


def test_point_prune_uses_stats_on_clustered_unindexed_column(spark, tbl):
    """R5: read_point prunes via manifest min/max even when the column
    was never bloom-indexed — on a range-clustered key the degenerate
    [v, v] range skips every non-covering file; with blooms present
    both filters compose."""
    tbl.commit(
        _df(spark, [(i, "g", float(i)) for i in range(100)]).repartitionByRange(
            5, "id"
        )
    )
    pr = tbl.prune_files_point("id", 7)
    assert pr["n_kept"] == 1 and pr["n_total"] == 5
    assert [r.id for r in tbl.read_point(spark, "id", 7).collect()] == [7]
    # a value outside every file's range keeps nothing
    assert tbl.prune_files_point("id", 10_000)["n_kept"] == 0


def test_upsert_rejects_duplicate_key_batch(spark, tbl):
    """R5: a merge batch with two rows for one key has no defined
    winner and would silently break table key-uniqueness — refused by
    default (one small agg job on the batch); an explicitly
    pre-collapsed feed can skip the probe."""
    tbl.commit(_df(spark, [(1, "a", 1.0)]))
    dups = _df(spark, [(2, "x", 1.0), (2, "y", 2.0)])
    with pytest.raises(ValueError, match="duplicate"):
        tbl.upsert(spark, dups, key="id")
    tbl.upsert(
        spark, _df(spark, [(2, "y", 2.0)]), key="id", check_unique_keys=False
    )
    assert {(r.id, r.grp) for r in tbl.read(spark).collect()} == {
        (1, "a"),
        (2, "y"),
    }


def test_matview_full_refresh_pins_base_version(spark, tmp_path, monkeypatch):
    """R5: a base commit landing between the refresh's cursor capture
    and its read must NOT leak into this refresh — the cursor records
    base_v, so an unpinned read would double-count the racer's rows on
    the next incremental refresh."""
    base = SnapshotTable(str(tmp_path / "b"))
    state = SnapshotTable(str(tmp_path / "s"))
    base.commit(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    view = MaterializedAgg(base, state, keys=["grp"], aggs={"v": ["sum", "count"]})

    real_read = base.read
    raced = {"done": False}

    def read_then_race(spark_, version=None):
        df = real_read(spark_, version=version)
        if not raced["done"]:
            raced["done"] = True
            SnapshotTable(base.root).commit(
                _df(spark_, [(3, "a", 10.0)]), mode="append"
            )
        return df

    monkeypatch.setattr(base, "read", read_then_race)
    r1 = view.refresh(spark)  # full build, racer lands mid-refresh
    assert r1["mode"] == "full" and r1["base_version"] == 0
    monkeypatch.setattr(base, "read", real_read)
    r2 = view.refresh(spark)  # consumes the racer's append incrementally
    assert r2["mode"] == "incremental"
    got = {
        (r.grp, r.v_sum, r.v_count)
        for r in finalize(state.read(spark), ["grp"], {"v": ["sum", "count"]}).collect()
    }
    assert got == {("a", 13.0, 3)}  # racer counted exactly once


def test_rewritten_files_reindexed_on_upsert_and_delete(spark, tbl):
    """R5: merge/delete rewrites re-bloom their output files on the
    parent's indexed columns — point-lookup pruning no longer decays
    with every upsert until a manual indexed compact."""
    tbl.commit(
        _df(spark, [(i, "g", float(i)) for i in range(100)]).repartitionByRange(
            4, "id"
        ),
        index=["id"],
    )
    tbl.upsert(spark, _df(spark, [(50, "U", -1.0)]), key="id")
    m = tbl.manifest(tbl.current_version())
    assert set(m["files"]) == set(m["bloom"])  # every live file indexed
    assert {r.grp for r in tbl.read_point(spark, "id", 50).collect()} == {"U"}
    v = tbl.delete_where(spark, "id", 10, 30)
    m = tbl.manifest(v)
    assert set(m["files"]) == set(m["bloom"])
    assert [r.id for r in tbl.read_point(spark, "id", 77).collect()] == [77]


def test_delete_on_column_added_by_append(spark, tbl):
    """Schema-evolution x stats interplay: deleting on a column that a
    later append ADDED must treat pre-evolution files as unknown-stats
    (rewritten with the exact predicate) — their rows read NULL for the
    new column, never match a range, and must all survive."""
    tbl.commit(_df(spark, [(i, "old", 1.0) for i in range(10)]).coalesce(1))
    widened = spark.createDataFrame(
        [(100 + i, "new", 1.0, i * 10) for i in range(10)],
        "id long, grp string, v double, extra long",
    )
    tbl.commit(widened.coalesce(1), mode="append")
    v = tbl.delete_where(spark, "extra", 50, None)  # drops extra>=50 only
    got = tbl.read(spark)
    # pre-evolution rows (extra IS NULL) all survive
    assert got.where("extra IS NULL").count() == 10
    kept_extra = sorted(
        r.extra for r in got.where("extra IS NOT NULL").collect()
    )
    assert kept_extra == [0, 10, 20, 30, 40]
    # time travel to the pre-delete version still sees everything
    assert tbl.read(spark, version=v - 1).count() == 20
