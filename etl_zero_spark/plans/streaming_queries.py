"""Declared queries that run Structured Streaming one-shot
(Trigger.AvailableNow — the reference's run-once scheduling,
scheduler.py:236-250) and return the materialized result.

st1/st4 reuse e1/e2's DuckDB oracles verbatim, and st2 reuses e3's
session oracle reshaped to the session_window output columns: a
streaming aggregation in complete output mode over the full fixture
must equal the batch answer — the strongest oracle a streaming operator
can have. (Gap-merged session windows and lag-based sessionization
agree everywhere except an event landing EXACTLY gap seconds after its
predecessor — equality verified at sf0.01 and continuously by
tests/test_streaming.py's batch-equivalence asserts.) Stateful dedup
returns a shape DuckDB can't replay (state eviction order), so it
keeps a rows-only check plus the distinct-count assert in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_zero_spark.plans.registry import QUERIES, query
from etl_zero_spark.streaming import events as sev


@query(
    "st1_stream_tumbling",
    "streaming: watermark + tumbling window (availableNow)",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    "Streaming tumbling aggregation, complete mode — hash-matches the "
    "batch oracle because availableNow drains the whole source.",
)
def st1_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.tumbling_agg(stream), "q_st1_tumbling")


@query(
    "st2_stream_session_windows",
    "streaming: session_window (gap-merged, availableNow)",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(CAST(ts AS TIMESTAMP)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM numbered
    GROUP BY user_id, session_id
    """,
    "Native session windows (30-minute gap) per user, oracled by the "
    "lag-based batch sessionization (e3's oracle reshaped to the "
    "session_window output): merged-window semantics equal gap-based "
    "sessionization on static data.",
)
def st2_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.session_agg(stream), "q_st2_session")


@query(
    "st4_stream_sliding",
    "streaming: watermark + sliding window (availableNow)",
    """
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(off))
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - off * INTERVAL 1 HOUR AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events, offsets
    GROUP BY 1
    """,
    "Streaming sliding-window aggregation (2-hour windows sliding 1 "
    "hour), complete mode — e2's batch oracle applies verbatim because "
    "availableNow drains the whole source; completes the window family "
    "(tumbling/sliding/session) under streaming execution.",
)
def st4_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.sliding_agg(stream), "q_st4_sliding")


@query(
    "st3_stream_dedup",
    "streaming: dropDuplicatesWithinWatermark",
    """
    SELECT DISTINCT event_id, user_id, event_type, value FROM events
    """,
    "Stateful exact dedup with watermark-bounded state. Oracle-able "
    "because exact dedup of rows whose duplicates are IDENTICAL in the "
    "projected columns is order-independent: the kept row equals the "
    "DISTINCT projection whichever copy the state store sees first "
    "(the fixture is currently duplicate-free, making this a lossless "
    "pass-through pin; eviction semantics under PLANTED duplicates are "
    "asserted in tests/test_streaming.py::test_dedup_drops_planted_"
    "duplicates).",
)
def st3_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(
        sev.dedup_within_watermark(stream), "q_st3_dedup", "append"
    ).select("event_id", "user_id", "event_type", "value")
