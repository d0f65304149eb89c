"""Scale-path join machinery: bucketed co-located joins (no shuffle in
the plan) and salted joins for extreme key skew (same results as the
plain join)."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import Zone
from etl_zero_spark.operators.joins import salted_join


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    must sort-merge-join with ZERO exchanges — the write-time shuffle
    replaces every join-time shuffle."""
    zone = Zone(str(tmp_path), "silver")
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    t1 = zone.write_bucketed(facts, "facts", "k", n_buckets=8)
    t2 = zone.write_bucketed(dims, "dims", "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = zone.read_bucketed(spark, "facts").join(
            zone.read_bucketed(spark, "dims"), "k"
        )
        assert joined.count() == 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_bucketed_groupby_has_no_shuffle(spark, tmp_path):
    zone = Zone(str(tmp_path), "silver")
    facts = spark.range(5_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    t1 = zone.write_bucketed(facts, "gfacts", "k", n_buckets=8)
    try:
        agg = zone.read_bucketed(spark, "gfacts").groupBy("k").agg(F.sum("v"))
        assert agg.count() == 50
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, how):
    """Salting must not change results: a 90%-hot-key big side joined to
    a small dim gives identical rows to the unsalted join."""
    big = spark.createDataFrame(
        [(7 if i % 10 else i, i) for i in range(2_000)], "k long, payload long"
    )
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 2_000, 100)] + [(7, "dim_7")],
        "k long, label string",
    )
    want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
    got = sorted(tuple(r) for r in salted_join(big, small, "k", n_salts=8, how=how).collect())
    assert got == want
    assert len(got) > 0


def test_salted_join_rejects_right_joins(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(df, df, "k", how="right")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames(spark):
    from datetime import datetime

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [
            (1, "u1", t(10), 1.0),
            (2, "u1", t(20), 2.0),
            (3, "u1", t(5), 3.0),   # before any right row
            (4, "u2", t(30), 4.0),  # key with no right rows at all
            (5, "u3", t(15), 5.0),  # equal-timestamp case
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("u1", t(8), 100.0),
            ("u1", t(18), 200.0),
            ("u3", t(15), 300.0),  # exactly equal to left ts -> inclusive
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_asof_backward_semantics(spark, asof_frames):
    from etl_zero_spark.operators.joins import asof_join

    left, right = asof_frames
    got = {
        r.event_id: (r.ts_right, r.price)
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert got[1][1] == 100.0   # t=10 -> right t=8
    assert got[2][1] == 200.0   # t=20 -> right t=18
    assert got[3] == (None, None)  # nothing at or before t=5
    assert got[4] == (None, None)  # key never on the right
    assert got[5][1] == 300.0   # equal ts matches (inclusive)


def test_asof_forward_semantics(spark, asof_frames):
    from etl_zero_spark.operators.joins import asof_join

    left, right = asof_frames
    got = {
        r.event_id: r.price
        for r in asof_join(
            left, right, on="ts", by="user_id", direction="forward"
        ).collect()
    }
    assert got[1] == 200.0      # t=10 -> next right t=18
    assert got[2] is None       # nothing at or after t=20
    assert got[3] == 100.0      # t=5 -> next right t=8
    assert got[4] is None
    assert got[5] == 300.0      # equal ts inclusive forward too


def test_asof_tolerance_nulls_far_matches(spark, asof_frames):
    from etl_zero_spark.operators.joins import asof_join

    left, right = asof_frames
    at2 = {
        r.event_id: r.price
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance_seconds=2
        ).collect()
    }
    assert at2[1] == 100.0      # gap exactly 2s -> kept (inclusive bound)
    assert at2[2] == 200.0      # gap exactly 2s -> kept
    assert at2[5] == 300.0      # gap 0
    at1 = {
        r.event_id: r.price
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance_seconds=1
        ).collect()
    }
    assert at1[1] is None       # 2s gap exceeds 1s tolerance -> nulled
    assert at1[2] is None
    assert at1[5] == 300.0      # gap 0 survives any tolerance


def test_asof_duplicate_right_rows_deterministic(spark):
    """Duplicate (by, on) right rows: the greatest payload struct wins,
    and two runs agree."""
    from datetime import datetime

    from etl_zero_spark.operators.joins import asof_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", t0, 0.0)], "event_id long, user_id string, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [("u", t0, 1.0), ("u", t0, 2.0), ("u", t0, 3.0)],
        "user_id string, ts timestamp, price double",
    )
    a = asof_join(left, right, on="ts", by="user_id").collect()
    b = asof_join(left, right, on="ts", by="user_id").collect()
    assert a == b
    assert a[0].price == 3.0  # greatest struct


def test_asof_single_shuffle_plan(spark, asof_frames):
    """The whole as-of join must cost ONE exchange (the window's hash
    partition on the by key) — no cartesian/nested-loop anywhere."""
    from etl_zero_spark.operators.joins import asof_join

    left, right = asof_frames
    plan = asof_join(left, right, on="ts", by="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# range (point-in-interval) join
# ---------------------------------------------------------------------------


def _range_fixtures(spark):
    points = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, "a", 25.0), (4, "b", 5.0), (5, "a", 100.0)],
        "pid long, k string, v double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0.0, 10.0, "i1"),    # catches p1
            ("a", 4.0, 16.0, "i2"),    # catches p1 AND p2 (overlap)
            ("a", 20.0, 25.0, "i3"),   # inclusive end catches p3
            ("b", 0.0, 10.0, "i4"),    # other key catches p4 only
            ("a", 50.0, 60.0, "i5"),   # catches nothing
        ],
        "k string, s double, e double, tag string",
    )
    return points, intervals


def test_range_join_matches_duckdb_ie_join(spark):
    """Bucketized equi-join + exact filter must reproduce DuckDB's
    native range join (IEJoin) row-for-row, including multiplicity."""
    import duckdb

    from etl_zero_spark.operators.joins import range_join

    points, intervals = _range_fixtures(spark)
    got = {
        (r.pid, r.tag)
        for r in range_join(points, intervals, "v", "s", "e", by="k").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid BIGINT, k VARCHAR, v DOUBLE)")
    con.execute("CREATE TABLE i(k VARCHAR, s DOUBLE, e DOUBLE, tag VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", [tuple(r) for r in points.collect()])
    con.executemany("INSERT INTO i VALUES (?,?,?,?)", [tuple(r) for r in intervals.collect()])
    want = set(
        con.execute(
            "SELECT pid, tag FROM p JOIN i ON p.k = i.k AND p.v BETWEEN i.s AND i.e"
        ).fetchall()
    )
    assert got == want
    assert got == {(1, "i1"), (1, "i2"), (2, "i2"), (3, "i3"), (4, "i4")}


def test_range_join_left_pads_unmatched(spark):
    from etl_zero_spark.operators.joins import range_join

    points, intervals = _range_fixtures(spark)
    out = range_join(points, intervals, "v", "s", "e", by="k", how="left")
    rows = out.collect()
    assert len(rows) == 6  # 5 matches + the unmatched p5
    p5 = [r for r in rows if r.pid == 5]
    assert len(p5) == 1 and p5[0].tag is None and p5[0].s is None


def test_range_join_bucket_width_irrelevant_to_result(spark):
    """The width tunes replication, never semantics: extreme widths in
    both directions must return identical rows."""
    from etl_zero_spark.operators.joins import range_join

    points, intervals = _range_fixtures(spark)
    base = {
        tuple(r)
        for r in range_join(points, intervals, "v", "s", "e", by="k").collect()
    }
    for width in (0.5, 3.0, 1000.0):
        got = {
            tuple(r)
            for r in range_join(
                points, intervals, "v", "s", "e", by="k", bucket_width=width
            ).collect()
        }
        assert got == base, f"width={width}"


def test_range_join_timestamps(spark):
    from datetime import datetime

    from etl_zero_spark.operators.joins import range_join

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    points = spark.createDataFrame(
        [(1, t(5)), (2, t(30))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(t(0), t(10), "w1"), (t(20), t(25), "w2")],
        "s timestamp, e timestamp, tag string",
    )
    got = {(r.pid, r.tag) for r in range_join(points, iv, "ts", "s", "e").collect()}
    assert got == {(1, "w1")}


def test_range_join_plan_has_no_nested_loop(spark):
    from etl_zero_spark.operators.joins import range_join

    points, intervals = _range_fixtures(spark)
    plan = (
        range_join(points, intervals, "v", "s", "e", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_matches_sequential_oracle_exhaustively(spark):
    """Exhaustive small-case sweep (completing the funnel/SCD2 trilogy
    of window-composition operators): every multiset of up to 3 right
    rows over 3 timestamps x 2 payloads, probed by left rows at each
    timestamp, both directions, with and without a tolerance that
    bisects the range — against a pure-Python oracle of the documented
    semantics (backward: max rts <= lts; forward: min rts >= lts;
    equal-rts ties to the greatest payload struct; |gap| <= tol)."""
    import itertools
    from datetime import datetime, timedelta

    from etl_zero_spark.operators.joins import asof_join

    T0 = datetime(2024, 1, 1)

    def t(h):
        return T0 + timedelta(hours=h)

    universe = [(h, p) for h in (0, 1, 2) for p in (10.0, 20.0)]
    cases = [()]
    for n in (1, 2, 3):
        cases.extend(itertools.combinations_with_replacement(universe, n))

    def oracle(rights, lh, direction, tol_h):
        if direction == "backward":
            cand = [(rh, p) for rh, p in rights if rh <= lh]
            if not cand:
                return (None, None)
            best_h = max(rh for rh, _ in cand)
        else:
            cand = [(rh, p) for rh, p in rights if rh >= lh]
            if not cand:
                return (None, None)
            best_h = min(rh for rh, _ in cand)
        best_p = max(p for rh, p in cand if rh == best_h)
        if tol_h is not None and abs(lh - best_h) > tol_h:
            return (None, None)
        return (best_h, best_p)

    l_rows, r_rows = [], []
    for k, rights in enumerate(cases):
        for lh in (0, 1, 2):
            l_rows.append((k * 10 + lh, k, t(lh)))
        for rh, p in rights:
            r_rows.append((k, t(rh), p))
    left = spark.createDataFrame(l_rows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(r_rows, "k long, ts timestamp, price double")
    for direction in ("backward", "forward"):
        for tol_h in (None, 1):
            got = asof_join(
                left,
                right,
                on="ts",
                by="k",
                direction=direction,
                tolerance_seconds=None if tol_h is None else tol_h * 3600,
            ).collect()
            assert len(got) == len(l_rows)
            for r in got:
                k, lh = r.k, (r.ts - T0).total_seconds() / 3600
                want_h, want_p = oracle(cases[k], lh, direction, tol_h)
                have = (
                    None if r.ts_right is None else (r.ts_right - T0).total_seconds() / 3600,
                    r.price,
                )
                assert have == (want_h, want_p), (
                    f"case {k} {direction} tol={tol_h} left@{lh}: "
                    f"join={have} oracle=({want_h}, {want_p}) rights={cases[k]}"
                )
