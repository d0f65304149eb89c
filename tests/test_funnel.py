"""Funnel analysis (operators/funnel.py): planted sequences + a
DuckDB step-chained min-aggregate oracle (a different algorithm than
the array fold) on the events fixture."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.funnel import funnel_counts, funnel_users
from tests.oracle_harness import compare, duckdb_connection

T0 = dt.datetime(2022, 1, 1)


def _t(h: int) -> dt.datetime:
    return T0 + dt.timedelta(hours=h)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


STEPS = ["view", "click", "buy"]


def test_ordered_progression(spark):
    ev = _ev(
        spark,
        [
            (1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "buy"),   # full
            (2, _t(0), "view"), (2, _t(1), "buy"),                        # skipped click
            (3, _t(0), "click"), (3, _t(1), "view"),                      # wrong order
            (4, _t(5), "buy"), (4, _t(6), "view"), (4, _t(7), "click"),   # late start
        ],
    )
    got = {r.user_id: r.steps_completed for r in funnel_users(ev, STEPS).collect()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 2}
    u1 = funnel_users(ev, STEPS).where("user_id = 1").collect()[0]
    assert (u1.step_1_ts, u1.step_2_ts, u1.step_3_ts) == (_t(0), _t(1), _t(2))


def test_first_qualifying_occurrence_wins(spark):
    ev = _ev(
        spark,
        [
            (1, _t(0), "view"),
            (1, _t(1), "view"),    # later views irrelevant
            (1, _t(2), "click"),
            (1, _t(3), "click"),   # later clicks irrelevant
        ],
    )
    u = funnel_users(ev, STEPS).collect()[0]
    assert (u.step_1_ts, u.step_2_ts, u.step_3_ts) == (_t(0), _t(2), None)


def test_repeated_step_name(spark):
    """A->B->A: the second A slot needs a NEW occurrence at/after B —
    one event can't fill two slots."""
    steps = ["view", "click", "view"]
    one_view = _ev(spark, [(1, _t(0), "view"), (1, _t(1), "click")])
    u = funnel_users(one_view, steps).collect()[0]
    assert u.steps_completed == 2
    again = _ev(
        spark, [(1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "view")]
    )
    u = funnel_users(again, steps).collect()[0]
    assert u.steps_completed == 3 and u.step_3_ts == _t(2)


def test_same_timestamp_counts_in_order(spark):
    """Events at the identical timestamp can satisfy consecutive steps
    (>= comparison — the batch-grain tie rule, pinned here)."""
    ev = _ev(spark, [(1, _t(0), "view"), (1, _t(0), "click")])
    u = funnel_users(ev, STEPS).collect()[0]
    assert u.steps_completed == 2


def test_within_deadline(spark):
    ev = _ev(
        spark,
        [
            (1, _t(0), "view"), (1, _t(1), "click"), (1, _t(100), "buy"),
            (2, _t(0), "view"), (2, _t(1), "click"), (2, _t(10), "buy"),
        ],
    )
    got = {
        r.user_id: r.steps_completed
        for r in funnel_users(ev, STEPS, within="1 DAY").collect()
    }
    assert got == {1: 2, 2: 3}  # user 1's buy fell outside 24h of view


def test_counts_monotone_and_conversion(spark):
    ev = _ev(
        spark,
        [
            (u, _t(i), s)
            for u in range(10)
            for i, s in enumerate(STEPS[: 1 + (u % 3)])
        ],
    )
    rows = funnel_counts(ev, STEPS).orderBy("step_index").collect()
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert rows[0].conversion == 1.0
    assert rows[1].conversion == pytest.approx(ns[1] / ns[0])


def test_events_fixture_vs_duckdb(spark, sf_dir):
    """view -> click -> purchase on the real events table vs a
    step-chained min-aggregate SQL oracle."""
    ev = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    out = funnel_users(ev, steps).select(
        "user_id", "step_1_ts", "step_2_ts", "step_3_ts", "steps_completed"
    )
    con = duckdb_connection(sf_dir)
    sql = """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s1 AS (
      SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view'
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
      GROUP BY e.user_id
    )
    SELECT u.user_id, s1.t1 AS step_1_ts, s2.t2 AS step_2_ts, s3.t3 AS step_3_ts,
           (s1.user_id IS NOT NULL)::INT + (s2.user_id IS NOT NULL)::INT
             + (s3.user_id IS NOT NULL)::INT AS steps_completed
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """
    assert compare(out, con, sql) == []


def test_single_shuffle_plan(spark, sf_dir):
    import re

    ev = load_table(spark, sf_dir, "events")
    plan = (
        funnel_users(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_timestamp_tie_repair_lowers_filled_slot(spark):
    """ADVICE r4: click@t0, view@t0, click@t5 with steps [view, click]
    must yield step_2_ts = t0 (chained-min semantics). Pass 1 fills
    the click slot with t5 — the t0 click sorts BEFORE the view that
    finalizes slot 1 — so the re-fold pass must LOWER the filled slot
    to the tied earlier click, not keep it sticky."""
    ev = _ev(
        spark, [(1, _t(0), "click"), (1, _t(0), "view"), (1, _t(5), "click")]
    )
    u = funnel_users(ev, ["view", "click"]).collect()[0]
    assert (u.step_1_ts, u.step_2_ts) == (_t(0), _t(0))
    # a deadline between t0 and t5 must not flip completion either
    u = funnel_users(ev, ["view", "click"], within="2 hours").collect()[0]
    assert u.steps_completed == 2 and u.step_2_ts == _t(0)


def test_duplicate_events_collapse_in_aggregation(spark):
    """Per-user state is the user's DISTINCT (ts, event) set: a bot
    replaying one event 50x contributes one array element, and the
    funnel result is unchanged."""
    rows = [(1, _t(0), "view")] * 50 + [(1, _t(1), "click"), (1, _t(2), "buy")]
    u = funnel_users(_ev(spark, rows), STEPS).collect()[0]
    assert u.steps_completed == 3
    assert (u.step_1_ts, u.step_2_ts, u.step_3_ts) == (_t(0), _t(1), _t(2))


def test_max_events_per_user_truncation_contract(spark):
    """max_events_per_user keeps only the EARLIEST n funnel events per
    user (ts, then event name): a generous cap changes nothing; a
    tight cap truncates later steps — the documented trade for a hard
    per-user working-set bound."""
    rows = [(1, _t(h), "view") for h in range(10)] + [
        (1, _t(20), "click"),
        (1, _t(21), "buy"),
    ]
    ev = _ev(spark, rows)
    assert funnel_users(ev, STEPS, max_events_per_user=100).collect()[0].steps_completed == 3
    u = funnel_users(ev, STEPS, max_events_per_user=11).collect()[0]
    assert u.steps_completed == 2 and u.step_3_ts is None


def test_cap_counts_distinct_events_not_replays(spark):
    """ADVICE r5: exact replays must NOT consume the cap budget. 50
    replays of one view + click + buy under cap=3 still completes the
    funnel — the cap ranks DISTINCT (ts, event) pairs, preserving the
    duplicates-cannot-change-any-slot guarantee in capped mode."""
    rows = [(1, _t(0), "view")] * 50 + [(1, _t(1), "click"), (1, _t(2), "buy")]
    u = funnel_users(_ev(spark, rows), STEPS, max_events_per_user=3).collect()[0]
    assert u.steps_completed == 3
    assert (u.step_1_ts, u.step_2_ts, u.step_3_ts) == (_t(0), _t(1), _t(2))


# --- property: fold == sequential chained-min oracle ------------------------


def _chained_min_oracle(events, steps, within_hours=None):
    """Pure-Python chained-min: T_i = min ts of a steps[i] event with
    ts >= T_{i-1} (and <= T_0 + within). The definition the fold must
    realize under ANY tie/ordering structure."""
    slots = []
    prev = None
    t0 = None
    for i, s in enumerate(steps):
        if i > 0 and prev is None:
            slots.append(None)
            continue
        cand = [
            t
            for (t, e) in events
            if e == s
            and (i == 0 or t >= prev)
            and (
                i == 0
                or within_hours is None
                or t <= t0 + dt.timedelta(hours=within_hours)
            )
        ]
        v = min(cand) if cand else None
        slots.append(v)
        prev = v
        if i == 0:
            t0 = v
    return slots


def test_fold_matches_oracle_under_ties(spark):
    """Exhaustive small-case sweep (cheaper and denser than hypothesis
    round-tripping Spark per example): EVERY multiset of up to 4 events
    over 3 timestamps x 2 event names, against funnels ['a','b'] and
    ['a','b','a'], with and without a deadline that bisects the
    timestamp range. This space contains the r4 ADVICE tie repro and
    every same-shape variant."""
    import itertools

    universe = [(_t(h), e) for h in (0, 1, 2) for e in ("a", "b")]
    cases = []
    for n in (2, 3, 4):
        cases.extend(itertools.combinations_with_replacement(universe, n))
    rows, expected = [], {}
    for uid, evs in enumerate(cases):
        for ts, e in evs:
            rows.append((uid, ts, e))
        for steps_key, steps in (("ab", ["a", "b"]), ("aba", ["a", "b", "a"])):
            for wh in (None, 1):
                expected[(uid, steps_key, wh)] = _chained_min_oracle(
                    list(evs), steps, within_hours=wh
                )
    ev = _ev(spark, rows)
    for steps_key, steps in (("ab", ["a", "b"]), ("aba", ["a", "b", "a"])):
        for wh in (None, 1):
            got = funnel_users(
                ev, steps, within=None if wh is None else f"{wh} hours"
            ).collect()
            assert len(got) == len(cases)
            for r in got:
                want = expected[(r.user_id, steps_key, wh)]
                have = [getattr(r, f"step_{i + 1}_ts") for i in range(len(steps))]
                assert have == want, (
                    f"user {r.user_id} steps={steps} within={wh}: "
                    f"fold={have} oracle={want} events="
                    f"{[x for x in rows if x[0] == r.user_id]}"
                )
