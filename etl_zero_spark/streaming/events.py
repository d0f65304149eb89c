"""Streaming operators over the events fixture.

The reference's only "streaming" is an every-N-minutes re-run of the
max-key incremental load (scheduler.py:252-264 + data_extraction.py:
59-107) — a hand-rolled micro-batch source. Structured Streaming is the
engine-native version: the file source discovers new files, offsets
replace the max-key watermark, and ``Trigger.AvailableNow`` reproduces
the one-shot run (scheduler.py:236-250). Everything here is a standard
streaming DataFrame program — no custom state store code except the
``applyInPandasWithState`` example, which is the documented extension
point for operators Spark lacks.

Batch equivalence (SURVEY §5.2): each window shape has a batch twin in
plans/events_queries.py; tests assert stream(availableNow, complete
output) == batch on the same fixture. That is the oracle for operators
DuckDB cannot replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _events_raw_schema(ts_type: DataType) -> StructType:
    """Explicit source schema (streams cannot infer). ``ts``'s declared
    type must match the fixture's physical parquet encoding, which has
    shipped as TIMESTAMP(NANOS)-read-as-long, and currently as plain
    ``timestamp[us]`` (TIMESTAMP_NTZ under Spark 4) — so the caller
    sniffs the observed dtype and passes it in."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def _stage_events_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory* of plain files to
    tail; the fixture is a single read-only file OR a Spark-written
    parquet directory (the source does NOT recurse into
    subdirectories). Stage symlinks into a per-sf_dir temp directory —
    the file directly, or each part file of a directory (idempotent,
    never touches the fixture)."""
    import hashlib
    import tempfile

    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"etlzero_events_{tag}")
    os.makedirs(d, exist_ok=True)
    if os.path.isdir(src):
        for part in os.listdir(src):
            if part.endswith(".parquet"):
                link = os.path.join(d, part)
                if not os.path.exists(link):
                    os.symlink(os.path.join(src, part), link)
    else:
        link = os.path.join(d, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the events table. One file today;
    on a live lake the same code tails the directory as micro-batches
    (the offset log plays the reference's stored-watermark role).

    ``ts``'s physical encoding is sniffed with a metadata-only batch
    read (footer schema, no data scan) so the declared stream schema
    always matches the fixture on disk — the r3 regression was exactly
    this assumption going stale. All encodings normalize to
    TimestampType, matching catalog.load_table's batch twin (session
    TZ pinned UTC, so the NTZ cast is value-stable)."""
    path = os.path.join(sf_dir, "events.parquet")
    observed = dict(spark.read.parquet(path).dtypes).get("ts")
    if observed == "bigint":  # TIMESTAMP(NANOS) under nanosAsLong
        ts_type: DataType = LongType()
        normalize = F.timestamp_micros(F.expr("ts div 1000"))
    elif observed == "timestamp":  # already TZ-bearing micros
        ts_type = TimestampType()
        normalize = F.col("ts")
    else:  # timestamp[us] → TIMESTAMP_NTZ (current fixtures)
        ts_type = TimestampNTZType()
        normalize = F.col("ts").cast("timestamp")
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .format("parquet")
        .load(_stage_events_dir(sf_dir))
    )
    return raw.withColumn("ts", normalize)


def tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of e1_tumbling_window: 1-hour tumbling windows by
    event type, late data bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )


def sliding_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of e2_sliding_window: 2-hour windows sliding 1 hour."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "value_sum")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of e3_sessionize_batch via the native
    ``session_window`` (dynamic gap-merged windows). Emits per-session
    start, event count and value sum per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on event_id with bounded state
    (dropDuplicatesWithinWatermark) — the streaming analog of P2 whose
    state is evicted once the watermark passes, so it runs forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_STATE_SCHEMA = "user_id long, n_events long, value_sum double"
RUNNING_OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double"


def running_user_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, value sum) across micro-batches — the extension
    point for semantics no built-in stateful operator covers."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, round(s, 6)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType="n_events long, value_sum double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: State-store partition cap for one-shot runs. Streaming stateful
#: stages spin up one state store per shuffle partition; under a vanilla
#: session (200 partitions) that is 200 store instances per stateful
#: stage for a single micro-batch — pure fixed overhead at any fixture
#: size, and the reason a contended driver run can blow its wall-clock
#: budget on three streaming queries. On a real cluster with real volume
#: the caller sizes partitions; the cap only applies to this one-shot
#: helper.
ONESHOT_SHUFFLE_PARTITIONS = 16


def run_available_now(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan one-shot (Trigger.AvailableNow — the
    reference's run-once scheduling, scheduler.py:236-250) into a memory
    sink and return the result table.

    Hardened for driver-owned vanilla sessions: shuffle partitions are
    temporarily capped (state-store count == shuffle partitions), the
    checkpoint location is unique per run and REMOVED after the run
    completes (a one-shot memory-sink result is not resumable, so the
    checkpoint has no value once the table exists), and the session
    conf is restored afterward.

    Concurrency note: the shuffle-partition cap mutates SESSION-global
    conf for the duration of the run; a query racing on the same
    SparkSession could observe it. This helper is for the one-shot
    scheduler/driver path, which is single-threaded by construction —
    long-running concurrent streams should set their own session conf
    and call ``writeStream`` directly.
    """
    import shutil
    import tempfile
    import uuid

    spark = stream_df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    checkpoint = os.path.join(
        tempfile.gettempdir(), f"etlzero_ckpt_{name}_{uuid.uuid4().hex[:12]}"
    )
    try:
        if int(prev) > ONESHOT_SHUFFLE_PARTITIONS:
            spark.conf.set(conf_key, str(ONESHOT_SHUFFLE_PARTITIONS))
        query = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev)
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name)


def clicks_joined_purchases(
    events: DataFrame, join_window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked stream-stream INNER join: each click pairs with the
    same user's purchases from the preceding ``join_window`` (inclusive
    both ends) — the attribution-join shape.

    The canonical bounded-state pattern: BOTH sides carry a watermark
    and the join condition carries a time-range bound, so the state
    store can evict rows older than watermark+window instead of
    buffering both streams forever — the requirement for an unbounded
    100 TB/day run. Stream-stream inner joins emit in append mode only.

    Accepts a streaming OR batch events frame: ``withWatermark`` is a
    no-op under batch execution, so the same plan doubles as its own
    batch twin — the equivalence oracle in tests/test_streaming.py
    (SURVEY §5.2: no DuckDB replay for streaming operators).
    """
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purch = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark("click_ts", watermark)
    p = purch.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"user_id = p_user_id AND purchase_ts BETWEEN "
            f"click_ts - INTERVAL {join_window} AND click_ts"
        ),
        "inner",
    ).drop("p_user_id")


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The MODERN twin of ``running_user_totals``: Spark 4's
    ``transformWithStateInPandas`` (SPARK-49564, the arbitrary-stateful
    API that supersedes ``applyInPandasWithState``) with an explicit
    ``StatefulProcessor`` holding one ValueState per user. Same
    semantics — per-user running (count, value sum) across
    micro-batches — so the two APIs cross-verify each other in
    tests/test_streaming.py; new custom stateful operators should
    start from this shape (typed state handles, timers, TTL live
    here, not in the legacy API).

    Environment gate: TWS's state-server protocol needs
    ``google.protobuf`` in the Python workers — absent in this
    container, so the equivalence test skips (executes wherever
    protobuf exists) and the plan-build contract is asserted
    unconditionally. ``applyInPandasWithState`` above remains the
    fully-executed path here."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState runs only on the RocksDB state store (bundled
    # with Spark 4); the default HDFS-backed provider crashes the TWS
    # worker. Session-level conf, read at query start.
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events long, value_sum double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, s = self._state.get()
            else:
                n, s = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, round(s, 6)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def enrich_with_dimension(
    events: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream joins the static dimension frame — the streaming analog of
    the reference's silver-zone mapping join (mapping.py:105-150), and
    the standard way to attach dimension attributes to a live feed.

    The static side is explicitly ``broadcast()``: a dimension beside
    a 100 TB/day stream is small by definition, and broadcasting keeps
    the stream side shuffle-free (stateless stage — no watermark, no
    state store; Spark re-plans the static side per micro-batch, so a
    dimension OVERWRITTEN between batches is picked up on the next
    trigger without restarting the query — pair with
    sources/scd.scd2_asof for a version-stable view instead when
    mid-run drift is unacceptable).

    Join types are restricted to the stateless set (inner / left with
    the stream on the left): a right/full join against a stream would
    need to know "rows the stream will never send", which is a
    watermark question, not a lookup."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how {how!r}: stream-static enrichment supports 'inner' or "
            "'left' (stream side preserved); right/full need stream state"
        )
    return events.join(F.broadcast(dim), on, how)
