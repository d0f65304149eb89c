"""SCD Type-2 dimension maintenance (sources/scd.py).

Semantics pinned two ways: hand-built expectations on small planted
chains, and a DuckDB window-SQL oracle replaying the identical merge
over a fixture-derived update feed (same linearize / change-detect /
interval-chain rules expressed independently in SQL).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.sources.scd import scd2_asof, scd2_init, scd2_merge
from tests.oracle_harness import compare

T0 = dt.datetime(2020, 1, 1)


def _t(days: int) -> dt.datetime:
    return T0 + dt.timedelta(days=days)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, city string, tier string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean"
    )


def _ups(spark, rows):
    return spark.createDataFrame(rows, "k long, city string, tier string, ts timestamp")


def _merge(dim, ups, **kw):
    return scd2_merge(dim, ups, key="k", tracked=["city", "tier"], **kw)


def test_init_opens_chains(spark):
    src = spark.createDataFrame([(1, "rome", "gold")], "k long, city string, tier string")
    d = scd2_init(src, _t(0))
    r = d.collect()[0]
    assert r.is_current and r.effective_to is None and r.effective_from == _t(0)


def test_new_version_closes_current(spark):
    dim = _dim(spark, [(1, "rome", "gold", _t(0), None, True)])
    out = _merge(dim, _ups(spark, [(1, "oslo", "gold", _t(10))])).collect()
    by_from = {r.effective_from: r for r in out}
    assert len(out) == 2
    old, new = by_from[_t(0)], by_from[_t(10)]
    assert (old.effective_to, old.is_current) == (_t(10), False)
    assert (new.city, new.effective_to, new.is_current) == ("oslo", None, True)


def test_noop_update_creates_nothing(spark):
    dim = _dim(spark, [(1, "rome", "gold", _t(0), None, True)])
    out = _merge(dim, _ups(spark, [(1, "rome", "gold", _t(10))])).collect()
    assert len(out) == 1
    assert out[0].effective_from == _t(0) and out[0].is_current


def test_batch_chain_and_run_collapse(spark):
    """Three updates in one batch: A->B->B->A chains to 3 versions (the
    middle duplicate collapses; the re-change to A is a NEW version)."""
    dim = _dim(spark, [(1, "a", "g", _t(0), None, True)])
    ups = _ups(
        spark,
        [
            (1, "b", "g", _t(1)),
            (1, "b", "g", _t(2)),  # same as predecessor -> collapsed
            (1, "a", "g", _t(3)),  # back to an old value -> new version
        ],
    )
    out = sorted(_merge(dim, ups).collect(), key=lambda r: r.effective_from)
    assert [(r.city, r.effective_from, r.effective_to) for r in out] == [
        ("a", _t(0), _t(1)),
        ("b", _t(1), _t(3)),
        ("a", _t(3), None),
    ]
    assert [r.is_current for r in out] == [False, False, True]


def test_new_key_opens_chain(spark):
    dim = _dim(spark, [(1, "rome", "gold", _t(0), None, True)])
    out = _merge(dim, _ups(spark, [(2, "lima", "tin", _t(5))]))
    r2 = out.where(F.col("k") == 2).collect()
    assert len(r2) == 1 and r2[0].is_current and r2[0].effective_from == _t(5)
    assert out.count() == 2


def test_history_rows_untouched(spark):
    dim = _dim(
        spark,
        [
            (1, "rome", "gold", _t(0), _t(5), False),
            (1, "oslo", "gold", _t(5), None, True),
        ],
    )
    out = _merge(dim, _ups(spark, [(1, "lima", "gold", _t(9))]))
    hist = out.where(~F.col("is_current")).collect()
    assert {(r.city, r.effective_from, r.effective_to) for r in hist} == {
        ("rome", _t(0), _t(5)),
        ("oslo", _t(5), _t(9)),
    }
    assert out.where(F.col("is_current")).collect()[0].city == "lima"


def test_late_update_dropped_not_spliced(spark):
    dim = _dim(
        spark,
        [
            (1, "rome", "gold", _t(0), _t(5), False),
            (1, "oslo", "gold", _t(5), None, True),
        ],
    )
    out = _merge(dim, _ups(spark, [(1, "ghost", "gold", _t(3))]))
    assert out.count() == 2
    assert out.where(F.col("city") == "ghost").count() == 0


def test_late_update_error_mode(spark):
    dim = _dim(spark, [(1, "rome", "gold", _t(5), None, True)])
    with pytest.raises(Exception, match="late update"):
        _merge(dim, _ups(spark, [(1, "x", "g", _t(1))]), on_late="error").collect()


def test_same_ts_dedupe_deterministic(spark):
    """Duplicate (key, ts) rows: greatest tracked struct wins, however
    the batch is ordered/partitioned."""
    dim = _dim(spark, [(1, "a", "g", _t(0), None, True)])
    rows = [(1, "b", "g", _t(1)), (1, "z", "g", _t(1)), (1, "m", "g", _t(1))]
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        out = _merge(dim, _ups(spark, perm).repartition(5))
        cur = out.where(F.col("is_current")).collect()
        assert [(r.city, r.effective_from) for r in cur] == [("z", _t(1))]


def test_exactly_one_current_per_key(spark, sf_dir):
    """Fixture-scale merge: customer dim + synthetic re-segmentations;
    invariant: every key ends with exactly one open row, intervals chain
    without gaps."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("city"),
        F.col("c_nationkey").cast("string").alias("tier"),
    )
    dim = scd2_init(cust, _t(0))
    ups = cust.withColumn("city", F.lower("city")).withColumn(
        "ts", F.lit(_t(30))
    ).select("k", "city", "tier", "ts")
    out = _merge(dim, ups).cache()
    per_key = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_key.where(F.col("n_cur") != 1).count() == 0
    assert per_key.where(F.col("n") != 2).count() == 0  # every row changed
    # chains: old closes exactly where new opens
    bad = (
        out.where(~F.col("is_current"))
        .select("k", F.col("effective_to").alias("t"))
        .join(out.where(F.col("is_current")).select("k", "effective_from"), "k")
        .where(F.col("t") != F.col("effective_from"))
    )
    assert bad.count() == 0
    out.unpersist()


def test_scd2_asof(spark):
    dim = _dim(
        spark,
        [
            (1, "rome", "gold", _t(0), _t(5), False),
            (1, "oslo", "gold", _t(5), None, True),
            (2, "lima", "tin", _t(3), None, True),
        ],
    )
    at4 = {(r.k, r.city) for r in scd2_asof(dim, _t(4)).collect()}
    assert at4 == {(1, "rome"), (2, "lima")}
    at9 = {(r.k, r.city) for r in scd2_asof(dim, _t(9)).collect()}
    assert at9 == {(1, "oslo"), (2, "lima")}
    at_minus = scd2_asof(dim, T0 - dt.timedelta(days=1)).count()
    assert at_minus == 0


def test_duckdb_oracle_replay(spark, sf_dir):
    """The full merge replayed in DuckDB window SQL over a
    fixture-derived multi-wave update feed (3 waves: segment flip,
    no-op wave, tier change) — independent formulation, identical
    output."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("city"),
        F.col("c_nationkey").cast("string").alias("tier"),
    )
    dim = scd2_init(cust, _t(0))
    w1 = cust.where(F.col("k") % 3 == 0).withColumn("city", F.lower("city")).withColumn("ts", F.lit(_t(10)))
    w2 = cust.where(F.col("k") % 3 == 0).withColumn("city", F.lower("city")).withColumn("ts", F.lit(_t(20)))  # no-op
    w3 = cust.where(F.col("k") % 5 == 0).withColumn("tier", F.concat(F.col("tier"), F.lit("+"))).withColumn("ts", F.lit(_t(30)))
    ups = w1.unionByName(w2).unionByName(w3).select("k", "city", "tier", "ts")
    out = _merge(dim, ups)

    con = duckdb.connect()
    con.register("cust", cust.toPandas())
    con.register("ups", ups.toPandas())
    sql = f"""
    WITH cur AS (
      SELECT k, city, tier, TIMESTAMP '2020-01-01' AS effective_from, 0 AS src
      FROM cust
    ), u AS (
      SELECT k, city, tier, ts AS effective_from, 1 AS src,
             row_number() OVER (PARTITION BY k, ts ORDER BY (city, tier) DESC) rn
      FROM ups
    ), unioned AS (
      SELECT k, city, tier, effective_from, src FROM cur
      UNION ALL SELECT k, city, tier, effective_from, src FROM u WHERE rn = 1
    ), flagged AS (
      SELECT *,
             lag((city, tier)) OVER w IS DISTINCT FROM (city, tier) AS keep
      FROM unioned
      WINDOW w AS (PARTITION BY k ORDER BY effective_from, src)
    ), kept AS (SELECT * FROM flagged WHERE keep)
    SELECT k, city, tier, effective_from,
           lead(effective_from) OVER w2 AS effective_to,
           lead(effective_from) OVER w2 IS NULL AS is_current
    FROM kept
    WINDOW w2 AS (PARTITION BY k ORDER BY effective_from, src)
    """
    problems = compare(out, con, sql)
    assert problems == [], problems


def test_single_exchange_plan(spark):
    """All of the merge's windows (dedupe, late guard, change-detect,
    interval chain) share one by-key hash exchange — the 100 TB shape
    claimed in the module docstring."""
    import re

    dim = _dim(spark, [(1, "a", "g", _t(0), None, True)])
    ups = _ups(spark, [(1, "b", "g", _t(1))])
    plan = _merge(dim, ups)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_nullifying_update_is_a_real_version(spark):
    """Setting a tracked attribute to NULL is a change, and a NULL->NULL
    update is a no-op: struct equality in Spark is NULL-SAFE (null ==
    null inside a struct), which is exactly the semantics change
    detection needs — pinned here because row-level `col = col` would
    NOT behave this way."""
    dim = _dim(spark, [(1, "rome", "gold", _t(0), None, True)])
    out = _merge(dim, _ups(spark, [(1, None, "gold", _t(5))]))
    rows = sorted(out.collect(), key=lambda r: r.effective_from)
    assert [(r.city, r.is_current) for r in rows] == [("rome", False), (None, True)]
    # null -> null: collapses as a no-op
    again = _merge(out, _ups(spark, [(1, None, "gold", _t(9))]))
    assert again.count() == 2


def test_update_at_exact_current_effective_from(spark):
    """An update timestamped EXACTLY at the current row's
    effective_from is not late (>= comparison): the superseded version
    closes to the zero-length interval [T, T) — which contains no
    instant, so every as-of read (including as-of T itself) sees
    exactly one version per key, the new one. Pinned so the half-open
    convention can't drift."""
    dim = _dim(spark, [(1, "paris", "gold", T0, None, True)])
    ups = _ups(spark, [(1, "lyon", "gold", T0)])
    out = _merge(dim, ups).collect()
    assert len(out) == 2
    by_city = {r.city: r for r in out}
    old, new = by_city["paris"], by_city["lyon"]
    assert (old.effective_from, old.effective_to, old.is_current) == (T0, T0, False)
    assert (new.effective_from, new.effective_to, new.is_current) == (T0, None, True)
    at_t0 = scd2_asof(_merge(dim, ups), T0).collect()
    assert len(at_t0) == 1 and at_t0[0].city == "lyon"


def test_merge_matches_sequential_oracle_exhaustively(spark):
    """Exhaustive small-case sweep: every multiset of up to 2 updates
    over 3 timestamps (one LATE) x 2 attribute values, merged into a
    one-row dimension, against a pure-Python oracle of the documented
    semantics — same-(key,ts) dedupe by greatest struct, late drop,
    transitive run-collapse change detection, half-open chaining."""
    import itertools

    cur_from = _t(1)

    def oracle(updates):  # updates: [(ts, city)]
        best = {}
        for ts, c in updates:  # dedupe same-ts: greatest struct wins
            if ts not in best or c > best[ts]:
                best[ts] = c
        seq = [(ts, c) for ts, c in sorted(best.items()) if ts >= cur_from]
        rows = [("paris", cur_from)] + [(c, ts) for ts, c in seq]
        kept = [rows[0]]
        for c, ts in rows[1:]:  # collapse consecutive equal-attr runs
            if c != kept[-1][0]:
                kept.append((c, ts))
        out = []
        for i, (c, ts) in enumerate(kept):
            to = kept[i + 1][1] if i + 1 < len(kept) else None
            out.append((c, ts, to, to is None))
        return sorted(out, key=lambda r: (r[1], r[0]))

    universe = [(_t(d), c) for d in (0, 1, 2) for c in ("lyon", "nice")]
    cases = [()]
    for n in (1, 2):
        cases.extend(itertools.combinations_with_replacement(universe, n))
    dim_rows, up_rows, want = [], [], {}
    for k, ups in enumerate(cases):
        dim_rows.append((k, "paris", "gold", cur_from, None, True))
        for ts, c in ups:
            up_rows.append((k, c, "gold", ts))
        want[k] = oracle(list(ups))
    dim = _dim(spark, dim_rows)
    ups_df = _ups(spark, up_rows) if up_rows else _ups(spark, [])
    got = _merge(dim, ups_df).collect()
    by_key: dict[int, list] = {}
    for r in got:
        by_key.setdefault(r.k, []).append(
            (r.city, r.effective_from, r.effective_to, r.is_current)
        )
    assert set(by_key) == set(want)
    for k in want:
        have = sorted(by_key[k], key=lambda r: (r[1], r[0]))
        assert have == want[k], (
            f"key {k}: merge={have} oracle={want[k]} "
            f"updates={[u for u in up_rows if u[0] == k]}"
        )
