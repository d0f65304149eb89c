"""Event-time queries over the events fixture (SURVEY §2.9 batch side +
§2.7 json).

These are the *batch* formulations of the streaming operators — each
window shape is expressed with plain date arithmetic so DuckDB can act
as the oracle; streaming/events.py re-runs the same shapes under
Structured Streaming and tests assert batch==stream equivalence
(SURVEY §5.2 "self-consistency").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.joins import asof_join, range_join
from etl_zero_spark.plans.registry import query

#: Session gap for batch sessionization (seconds).
SESSION_GAP_S = 1800


@query(
    "json1_extract_props",
    "scalar fn: JSON extraction (F.get_json_object)",
    """
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k
    FROM events WHERE props IS NOT NULL
    """,
    "Typed field extraction from the JSON props payload.",
)
def json1_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def e1_e2_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows by event type (batch formulation of
    F.window(ts, '1 hour')) unioned with 2-hour windows sliding by
    1 hour — each event in exactly two windows, expressed as an
    explode over window offsets (the same expansion Spark's
    F.window(ts, '2 hours', '1 hour') performs); event_type is NULL
    on the sliding rows. Streaming twins in streaming/events.py.
    Declared (hash-checked) through `e1_e3_events_family` — the R12
    fold that freed the slot declaring pv1_pivot_unpivot."""
    ev = load_table(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.lit("e1").alias("op"),
            "window_start",
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    off = F.explode(F.sequence(F.lit(0), F.lit(1))).alias("off")
    sliding = (
        ev.select("ts", "value", off)
        .groupBy(
            (
                F.date_trunc("hour", F.col("ts"))
                - F.make_interval(hours=F.col("off"))
            ).alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.lit("e2").alias("op"),
            "window_start",
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            "value_sum",
        )
    )
    return tumbling.unionByName(sliding)


def e3_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization via lag + cumulative flag — the
    batch twin of F.session_window(ts, '30 minutes'). Declared
    (hash-checked) through `e1_e3_events_family` (R12 fold); bench
    keeps its standalone timing as x_e3_sessionize for drift-panel
    continuity."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.lit(SESSION_GAP_S * 1_000_000)
    new_session = (
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order))
        > gap_us
    ).cast("int")
    return (
        ev.withColumn("new_session", F.coalesce(new_session, F.lit(0)))
        .withColumn("session_id", F.sum("new_session").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


@query(
    "e1_e3_events_family",
    "event-time: tumbling + sliding + session windows (tagged union; "
    "R12 fold of e1_e2_windows + e3_sessionize_batch freeing the slot "
    "that declares pv1 — operator ids E1+E2+E3 all preserved, every "
    "window row of all three shapes hash-checked)",
    f"""
    SELECT 'e1' AS op,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum,
           CAST(NULL AS BIGINT) AS user_id,
           CAST(NULL AS BIGINT) AS session_id,
           CAST(NULL AS TIMESTAMP) AS session_end
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'e2', ws, CAST(NULL AS VARCHAR), n_events, value_sum,
           NULL, NULL, NULL
    FROM (
      WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(off))
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - off * INTERVAL 1 HOUR AS ws,
             count(*) AS n_events,
             round(sum(value), 2) AS value_sum
      FROM events, offsets
      GROUP BY 1
    )
    UNION ALL
    SELECT 'e3', session_start, CAST(NULL AS VARCHAR), n_events,
           value_sum, user_id, session_id, session_end
    FROM (
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
      ), numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_events,
             min(CAST(ts AS TIMESTAMP)) AS session_start,
             max(CAST(ts AS TIMESTAMP)) AS session_end,
             round(sum(value), 2) AS value_sum
      FROM numbered
      GROUP BY user_id, session_id
    )
    """,
    "The three batch event-time window shapes as one tagged union "
    "(the w1_w4 pattern): 'e1' 1-hour tumbling by event type, 'e2' "
    "2h/1h sliding via offset explode, 'e3' 30-minute-gap "
    "sessionization (window_start carries session_start; user_id / "
    "session_id / session_end ride NULL on the e1/e2 rows). Streaming "
    "twins in streaming/events.py assert batch==stream equivalence "
    "against the standalone functions above.",
)
def e1_e3_events_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    win = e1_e2_windows(spark, sf_dir).select(
        "op",
        "window_start",
        "event_type",
        "n_events",
        "value_sum",
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("long").alias("session_id"),
        F.lit(None).cast("timestamp").alias("session_end"),
    )
    ses = e3_sessionize_batch(spark, sf_dir).select(
        F.lit("e3").alias("op"),
        F.col("session_start").alias("window_start"),
        F.lit(None).cast("string").alias("event_type"),
        "n_events",
        "value_sum",
        "user_id",
        "session_id",
        "session_end",
    )
    return win.unionByName(ses)


@query(
    "ts1_gap_fill",
    "§2.13-L10: time-series resample + dense grid + forward fill",
    """
    WITH res AS (
      SELECT event_type,
             CAST(to_timestamp((epoch(CAST(ts AS TIMESTAMP))::BIGINT // 21600) * 21600)
                  AS TIMESTAMP) AS bucket,
             sum(value) AS value_sum
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT event_type, min(bucket) lo, max(bucket) hi FROM res GROUP BY 1
    ), grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
      FROM spans
    ), joined AS (
      SELECT g.event_type, g.bucket, r.value_sum,
             r.event_type IS NULL AS filled
      FROM grid g LEFT JOIN res r
        ON g.event_type = r.event_type AND g.bucket = r.bucket
    )
    SELECT event_type, bucket,
           round(last_value(value_sum IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_sum,
           filled
    FROM joined
    """,
    "Irregular telemetry regularized to a dense 6-hour grid per event "
    "type: resample (one hash aggregate) + per-key grid materialization "
    "(min/max span exploded through sequence — O(output), no cross "
    "join, no driver calendar) + last-observation-carried-forward (one "
    "ordered window), with imputed slots flagged. operators/"
    "timeseries.fill_gaps; oracle is DuckDB generate_series + "
    "last_value IGNORE NULLS.",
)
def ts1_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators.timeseries import fill_gaps

    ev = load_table(spark, sf_dir, "events")
    return fill_gaps(
        ev, "ts", "event_type", "6 hours", {"value": "sum"}, fill="ffill"
    ).select(
        "event_type",
        "bucket",
        F.round("value_sum", 2).alias("value_sum"),
        F.col("__filled").alias("filled"),
    )


@query(
    "aj1_asof_join",
    "join family: point-in-time (as-of) join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                                  ORDER BY value) AS rn
        FROM events WHERE event_type = 'purchase')
      WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           p.ts AS ts_right, p.value AS value_right
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "Each click joined to that user's most recent purchase at or "
    "before it (backward as-of, left-outer) — an operator Spark lacks, "
    "composed as union + one window pass (operators/joins.asof_join); "
    "the oracle is DuckDB's NATIVE ASOF LEFT JOIN. The right side is "
    "deterministically deduped on (user_id, ts) so both engines face a "
    "unique-match input.",
)
def aj1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user_id", "ts").orderBy("value")),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return asof_join(clicks, purch, on="ts", by="user_id")


@query(
    "rj1_range_join",
    "join family: point-in-interval (range) join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(ts AS TIMESTAMP) - INTERVAL 30 MINUTE AS window_start,
             CAST(ts AS TIMESTAMP) AS window_end
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_id, p.window_start, p.window_end
    FROM clicks c JOIN purch p
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.window_start AND p.window_end
    """,
    "Each click paired with every purchase whose preceding-30-minute "
    "attribution window contains it — a range predicate Catalyst can "
    "only plan as a nested loop, bucketized instead into a plain "
    "shuffled equi-join on (user, time-bucket) + exact BETWEEN filter "
    "(operators/joins.range_join; plan asserted NestedLoop-free in "
    "tests/test_scale_joins.py). The oracle is DuckDB's native IEJoin "
    "range join.",
)
def rj1_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("window_start"),
        F.col("ts").alias("window_end"),
    )
    return range_join(
        clicks, purch, "ts", "window_start", "window_end", by="user_id"
    )
