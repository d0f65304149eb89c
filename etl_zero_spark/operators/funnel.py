"""Funnel analysis: ordered event-sequence matching per user.

The events fixture's page_view -> click -> purchase shape is the
canonical product-analytics question the reference's chart pages
circle around but cannot ask: *of the users who did A, how many went
on to do B, then C, in that order?* SQL engines grew MATCH_RECOGNIZE
for this; the set-based equivalent here is:

* per user, ONE ``sort_array(collect_list(struct(ts, event)))``
  aggregation (a single hash shuffle on user — the same partitioning
  every per-user operator in this repo uses), then
* a single ``aggregate`` fold over the ordered array that advances a
  k-slot timestamp vector: slot ``i`` is the FIRST time step ``i``'s
  event was seen AT OR AFTER slot ``i-1``'s time — evaluated against
  the pre-update vector, so one event advances at most one slot and
  strict ordering holds even when a funnel repeats an event name
  (A -> B -> A).

All pure Column expressions — no UDFs, no explode, no per-step join
chain (the k-self-join formulation shuffles k times and re-scans k
times; this is one scan, one shuffle, any k). Per-user state is the
user's own event list: bounded by per-user activity, the same
working-set assumption as sessionization.

``within`` bounds the whole journey: later steps only count inside
``within`` of the user's step-1 time (the "converted within 7 days"
cut). Oracle: a step-chained min-aggregate SQL formulation in DuckDB
(tests/test_funnel.py) — deliberately a DIFFERENT algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def funnel_users(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within: str | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Per-user funnel progress: (user, step_1_ts..step_k_ts,
    steps_completed). ``step_i_ts`` is the first time the user
    completed steps 1..i in order (NULL = never); ``within`` (an
    INTERVAL string, e.g. ``'7 days'``) bounds steps 2..k relative to
    the user's step-1 time.

    Per-user state: the fold's working set is one user's DISTINCT
    (ts, event) pairs — duplicate events collapse in the aggregation
    itself (``collect_set``; a chained-min fold minimizes over a set,
    so duplicates provably cannot change any slot), which already
    defuses the bot-user-replays-one-event hot key. For data where a
    single user can still carry millions of *distinct* timestamps,
    ``max_events_per_user`` caps the working set hard: only the user's
    EARLIEST n funnel events (ordered by ts, tie by event name) are
    considered — a documented truncation (journeys completing only via
    later events read as incomplete), applied through a row_number
    window whose sort spills to disk instead of an in-memory array.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    filtered = events.where(F.col(event_col).isin(steps))
    if max_events_per_user is not None:
        # Collapse exact replays BEFORE ranking (ADVICE r5): the cap
        # must count DISTINCT (ts, event) pairs — otherwise a bot
        # replaying one event burns the budget and evicts real later
        # events, contradicting the duplicates-cannot-change-any-slot
        # guarantee the collect_set below provides when uncapped. The
        # dropDuplicates is a partial-agg-combined shuffle on the same
        # user key the window needs anyway.
        w = Window.partitionBy(user_col).orderBy(
            F.col(ts_col).cast("timestamp"), F.col(event_col)
        )
        filtered = (
            filtered.dropDuplicates([user_col, ts_col, event_col])
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= F.lit(int(max_events_per_user)))
            .drop("__rn")
        )
    seq = (
        filtered.select(
            F.col(user_col).alias("user"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                F.col(event_col).alias("e"),
            ).alias("ev"),
        )
        .groupBy("user")
        .agg(F.sort_array(F.collect_set("ev")).alias("seq"))
    )
    steps_sql = "array(" + ", ".join(_sql_str(s) for s in steps) + ")"
    deadline = (
        "TRUE" if within is None else f"x.ts <= acc[0] + INTERVAL {within}"
    )
    # Semantics: chained min — slot i = min ts of a steps[i] event with
    # ts >= slot[i-1] (and within the deadline). One fold pass reads
    # the PRE-update acc, which under TIMESTAMP TIES can miss a
    # qualifying event that sorts before the event finalizing the
    # predecessor slot; k chained passes fix that exactly (pass p
    # finalizes slot p-1: its predecessor is final and constant through
    # the pass, and the pass takes the MINIMUM qualifying ts — a filled
    # slot is LOWERED when a qualifying event with a smaller ts is
    # seen, which is what makes re-passes able to repair a slot that
    # pass 1 filled with a later tied event; `least` skips NULL, so one
    # branch covers fill-and-lower). A pass can only lower a slot, and
    # any lowered value qualifies against the final predecessor too
    # (predecessor values also only decrease), so pass p's slot p-1 is
    # exact. Expression nests k folds deep; funnels are short
    # (k <= ~10), per-user cost is k * |events|, still one shuffle and
    # zero UDFs.
    body = f"""
        aggregate(
          seq,
          {{init}},
          (acc, x) -> transform(acc, (slot, i) ->
            CASE
              WHEN element_at({steps_sql}, i + 1) = x.e
                   AND (i = 0 OR (acc[i - 1] IS NOT NULL AND x.ts >= acc[i - 1]))
                   AND (i = 0 OR ({deadline}))
              THEN least(slot, x.ts)
              ELSE slot
            END)
        )
    """
    expr = f"array_repeat(CAST(NULL AS TIMESTAMP), {k})"
    for _ in range(k):
        expr = body.format(init=expr)
    fold = F.expr(expr)
    out = seq.select("user", fold.alias("prog"))
    cols = [F.col("user").alias(user_col)]
    for i in range(k):
        cols.append(F.col("prog")[i].alias(f"step_{i + 1}_ts"))
    completed = F.aggregate(
        F.col("prog"),
        F.lit(0),
        lambda acc, x: acc + F.when(x.isNotNull(), 1).otherwise(0),
    )
    return out.select(*cols, completed.alias("steps_completed"))


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """The summary funnel: one row per step with the number of users
    who reached it in order and the step-over-step conversion rate.
    Monotone non-increasing by construction. The final stack/window
    runs over a ONE-ROW aggregate — driver-cheap by definition."""
    per_user = funnel_users(events, steps, user_col, ts_col, event_col, within)
    k = len(steps)
    counts = per_user.agg(
        *[F.count(F.col(f"step_{i + 1}_ts")).alias(f"__c{i}") for i in range(k)]
    )
    stack = "stack({}, {}) AS (step_index, step, n_users)".format(
        k, ", ".join(f"{i + 1}, {_sql_str(steps[i])}, __c{i}" for i in range(k))
    )
    rows = counts.select(F.expr(stack))
    prev = F.lag("n_users").over(Window.orderBy("step_index"))
    return rows.withColumn(
        "conversion",
        F.when(prev.isNull(), F.lit(1.0)).otherwise(
            F.when(prev > 0, F.col("n_users") / prev).otherwise(F.lit(0.0))
        ),
    )
