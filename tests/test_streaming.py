"""Streaming operators: batch==stream equivalence (the oracle for
operators DuckDB can't replay — SURVEY §5.2), stateful dedup, custom
state. All runs are one-shot (availableNow) on the events fixture."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.plans.all_queries import QUERIES
from etl_zero_spark.plans.events_queries import (
    e1_e2_windows,
    e3_sessionize_batch,
)
from etl_zero_spark.streaming import events as sev
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream(spark):
    return sev.read_events_stream(spark, SF_SMOKE)


def _rowset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_stream_reads_events(spark, stream):
    out = sev.run_available_now(stream.select("event_id", "ts"), "t_raw", "append")
    batch = load_table(spark, SF_SMOKE, "events")
    assert out.count() == batch.count()
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_tumbling_batch_equivalence(spark, stream):
    got = sev.run_available_now(sev.tumbling_agg(stream), "t_tumble")
    want = e1_e2_windows(spark, SF_SMOKE).where("op = 'e1'")
    cols = ["window_start", "event_type", "n_events", "value_sum"]
    assert _rowset(got, cols) == _rowset(want, cols)


def test_sliding_batch_equivalence(spark, stream):
    got = sev.run_available_now(sev.sliding_agg(stream), "t_slide")
    want = e1_e2_windows(spark, SF_SMOKE).where("op = 'e2'")
    cols = ["window_start", "n_events", "value_sum"]
    assert _rowset(got, cols) == _rowset(want, cols)


def test_session_batch_equivalence(spark, stream):
    got = sev.run_available_now(sev.session_agg(stream), "t_sess")
    want = e3_sessionize_batch(spark, SF_SMOKE).select(
        "user_id",
        F.col("session_start"),
        "n_events",
        "value_sum",
    )
    cols = ["user_id", "session_start", "n_events", "value_sum"]
    assert _rowset(got, cols) == _rowset(want, cols)


def test_dedup_within_watermark(spark, stream):
    out = sev.run_available_now(
        sev.dedup_within_watermark(stream), "t_dedup", "append"
    )
    batch = load_table(spark, SF_SMOKE, "events")
    assert out.count() == batch.select("event_id").distinct().count()


def test_dedup_drops_planted_duplicates(spark, tmp_path):
    """The fixture is duplicate-free, so the count assertion above
    cannot catch a dedup that deduplicates nothing. Plant REAL
    duplicates (each event tripled) in a staged copy and assert the
    stream collapses them back to one row per event_id."""
    src = load_table(spark, SF_SMOKE, "events").limit(500)
    tripled = src.unionByName(src).unionByName(src)
    d = str(tmp_path / "events_dup")
    (tmp_path / "events_dup").mkdir()
    # single FILE like the driver fixture (the stream source does not
    # recurse into a nested parquet directory)
    tripled.toPandas().to_parquet(f"{d}/events.parquet", index=False)
    stream = sev.read_events_stream(spark, d)
    out = sev.run_available_now(
        sev.dedup_within_watermark(stream), "t_dedup_planted", "append"
    )
    assert tripled.count() == 1500
    assert out.count() == 500
    assert out.select("event_id").distinct().count() == 500


def test_running_user_totals_matches_batch(spark, stream):
    got = sev.run_available_now(
        sev.running_user_totals(stream), "t_state", "update"
    )
    # update mode may emit one row per user per micro-batch; the LAST row
    # per user is the final state. availableNow on one file = one batch.
    final = {r.user_id: (r.n_events, r.value_sum) for r in got.collect()}
    want = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert final == want


def test_stream_stream_join_matches_batch(spark, stream):
    """Watermarked stream-stream inner join (clicks x purchases within
    1 hour per user) must equal the identical plan run in batch mode —
    the same function serves both, withWatermark being a batch no-op."""
    got = sev.run_available_now(
        sev.clicks_joined_purchases(stream), "t_ssjoin", "append"
    )
    want = sev.clicks_joined_purchases(load_table(spark, SF_SMOKE, "events"))
    cols = ["click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"]
    gset, wset = _rowset(got, cols), _rowset(want, cols)
    assert gset == wset
    assert len(wset) > 0  # fixture must actually exercise the join


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_plan_builds(spark, stream):
    """The TWS twin's analysis contract holds even where execution
    can't run (no protobuf in this container): grouping key + output
    schema resolve."""
    df = sev.running_user_totals_tws(stream)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["user_id", "n_events", "value_sum"]


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's state server needs google.protobuf "
    "in the Python workers (absent in this container)",
)
def test_transform_with_state_matches_legacy_and_batch(spark, stream):
    """Spark 4's transformWithStateInPandas twin must produce the same
    final per-user totals as the legacy applyInPandasWithState op and
    the batch aggregate."""
    got = sev.run_available_now(
        sev.running_user_totals_tws(stream), "t_tws", "update"
    )
    final = {r.user_id: (r.n_events, r.value_sum) for r in got.collect()}
    want = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert final == want


def test_stream_static_enrichment_matches_batch(spark, stream):
    """Stream-static dimension join under availableNow equals the batch
    join; plan carries a broadcast, stream side stays stateless."""
    users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("string"))
    )
    enriched = sev.enrich_with_dimension(
        stream.select("event_id", "user_id", "value"), users, "user_id"
    )
    out = sev.run_available_now(enriched, "t_enrich", "append")
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "value")
        .join(users, "user_id", "left")
    )
    cols = ["event_id", "user_id", "segment"]
    assert _rowset(out, cols) == _rowset(batch, cols)
    # every stream row survived the left join
    assert out.count() == load_table(spark, SF_SMOKE, "events").count()


def test_stream_static_rejects_stateful_join_types(spark, stream):
    users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct()
    with pytest.raises(ValueError, match="stream state"):
        sev.enrich_with_dimension(stream, users, "user_id", how="full")


def test_session_gap_boundary_inclusive_both_formulations(spark):
    """R5 pin: an event at EXACTLY the session gap continues the
    session in BOTH formulations — the batch lag-expression uses
    strict `> gap` for the break, and Spark's session_window is
    empirically inclusive at start+gap — so the batch/streaming
    equivalence cannot silently break on boundary-grain data."""
    import datetime as dt

    T0 = dt.datetime(2022, 1, 1)
    gap_s = 1800  # SESSION_GAP_S
    rows = [
        (1, T0, "a"), (1, T0 + dt.timedelta(seconds=gap_s), "a"),       # exact
        (2, T0, "a"), (2, T0 + dt.timedelta(seconds=gap_s - 1), "a"),   # inside
        (3, T0, "a"), (3, T0 + dt.timedelta(seconds=gap_s + 1), "a"),   # beyond
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    want = {1: 1, 2: 1, 3: 2}
    # Spark's native session_window (the streaming formulation's core)
    sw = (
        df.groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {r.user_id: r.n for r in sw.collect()} == want
    # the batch lag-expression formulation (e3's shape)
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ts")
    brk = (
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros("ts")).over(order))
        > gap_s * 1_000_000
    ).cast("int")
    batch = (
        df.withColumn("b", F.coalesce(brk, F.lit(0)))
        .withColumn("sid", F.sum("b").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .groupBy("user_id")
        .agg(F.count_distinct("sid").alias("n"))
    )
    assert {r.user_id: r.n for r in batch.collect()} == want
