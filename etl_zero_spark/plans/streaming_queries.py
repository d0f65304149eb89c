"""Declared queries that run Structured Streaming one-shot
(Trigger.AvailableNow — the reference's run-once scheduling,
scheduler.py:236-250) and return the materialized result.

st1 reuses e1_tumbling_window's DuckDB oracle verbatim: a streaming
aggregation in complete output mode over the full fixture must equal
the batch answer — the strongest oracle a streaming operator can have.
Session windows and stateful dedup return shapes DuckDB can't replay
bit-for-bit (merged-window semantics / state eviction), so they carry
rows-only checks here and batch-equivalence asserts in
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
    None,  # batch equivalence asserted in tests/test_streaming.py
    "Native session windows (30-minute gap) per user.",
)
def st2_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.session_agg(stream), "q_st2_session")


@query(
    "st3_stream_dedup",
    "streaming: dropDuplicatesWithinWatermark",
    None,  # distinct-count equivalence asserted in tests/test_streaming.py
    "Stateful exact dedup with watermark-bounded state.",
)
def st3_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(
        sev.dedup_within_watermark(stream), "q_st3_dedup", "append"
    ).select("event_id", "user_id", "event_type", "value")
