"""Property tests (hypothesis) for the table-maintenance tier's
invariants on RANDOM inputs: SCD2's chain algebra and matview's
partial-merge algebra have edge shapes a fixed fixture never produces
(equal timestamps, all-no-op batches, single-key floods, adversarial
split points).

Strategy note mirrors test_corpus_properties: few examples, each
batched into one DataFrame — properties range over the space across
runs, not within one."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_zero_spark.operators.matview import finalize, merge_partials, partial_agg
from etl_zero_spark.sources.scd import scd2_init, scd2_merge

T0 = dt.datetime(2020, 1, 1)

# (key, day-offset, attr-value): small domains on purpose — collisions
# in key AND timestamp are the interesting cases.
_UPDATES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=1, max_value=8),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(ups=_UPDATES)
def test_scd2_chain_invariants(spark, ups):
    """For ANY update batch: (1) exactly one open row per key present
    in the dim, (2) per key, intervals chain with no gaps/overlaps,
    (3) no two consecutive versions carry identical tracked attrs."""
    dim_src = spark.createDataFrame(
        [(k, "init") for k in range(3)], "k long, attr string"
    )
    dim = scd2_init(dim_src, T0)
    ups_df = spark.createDataFrame(
        [(k, d and T0 + dt.timedelta(days=d), a) for k, d, a in ups],
        "k long, ts timestamp, attr string",
    ).where(F.col("ts").isNotNull())
    out = scd2_merge(dim, ups_df, key="k", tracked=["attr"]).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.effective_from)
        open_rows = [r for r in rows if r.is_current]
        assert len(open_rows) == 1, (k, rows)
        assert open_rows[0] is rows[-1]
        for prev, cur in zip(rows, rows[1:]):
            assert prev.effective_to == cur.effective_from, (k, rows)
            assert prev.attr != cur.attr, ("consecutive dup version", k, rows)
        assert rows[-1].effective_to is None


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g", "h", "i"]),
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=0,
        max_size=30,
    ),
    split=st.integers(min_value=0, max_value=30),
)
def test_matview_merge_associativity(spark, rows, split):
    """merge(partial(A), partial(B)) == partial(A ∪ B) at ANY split
    point, including empty sides — the algebra incremental refresh
    rests on."""
    split = min(split, len(rows))
    a_rows, b_rows = rows[:split], rows[split:]
    schema = "grp string, v double"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    aggs = {"v": ["sum", "count", "min", "max", "avg"]}
    merged = finalize(
        merge_partials(
            partial_agg(a, ["grp"], aggs), partial_agg(b, ["grp"], aggs), ["grp"], aggs
        ),
        ["grp"],
        aggs,
    )
    direct = finalize(partial_agg(a.unionByName(b), ["grp"], aggs), ["grp"], aggs)

    def norm(df):
        return {
            r.grp: (
                round(r.v_sum, 6),
                r.v_count,
                r.v_min,
                r.v_max,
                round(r.v_avg, 6) if r.v_avg is not None else None,
            )
            for r in df.collect()
        }

    assert norm(merged) == norm(direct)


# --- model-based snapshot-table test ----------------------------------------

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 20), max_size=6)),
        st.tuples(st.just("append"), st.lists(st.integers(0, 20), max_size=6)),
        st.tuples(st.just("upsert"), st.lists(st.integers(0, 20), min_size=1, max_size=4)),
        st.tuples(st.just("delete"), st.tuples(st.integers(0, 20), st.integers(0, 20))),
        st.tuples(st.just("rollback"), st.integers(0, 10)),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(ops=_OPS)
def test_snapshot_table_matches_model(spark, tmp_path_factory, ops):
    """Random op sequences against a plain-Python MULTISET model
    (Counter of (id, tag) pairs — appends may legitimately duplicate):
    after every op the current read, the manifest row count, and at
    the end every historical version all agree with the model."""
    from collections import Counter

    from etl_zero_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path_factory.mktemp("snapmodel") / "t"))
    versions: list[Counter] = []  # model per committed version

    def df_of(pairs):
        if not pairs:
            return spark.createDataFrame([], "id long, tag string")
        return spark.createDataFrame(pairs, "id long, tag string")

    step = 0
    for op, arg in ops:
        step += 1
        cur = Counter(versions[-1]) if versions else Counter()
        if op == "overwrite":
            pairs = [(i, f"s{step}") for i in arg]
            tbl.commit(df_of(pairs))
            versions.append(Counter(pairs))
        elif op == "append":
            pairs = [(i, f"s{step}") for i in arg]
            tbl.commit(df_of(pairs), mode="append")
            versions.append(cur + Counter(pairs))
        elif op == "upsert":
            ups = {i: f"s{step}" for i in arg}
            tbl.upsert(spark, df_of(list(ups.items())), key="id")
            kept = Counter({p: n for p, n in cur.items() if p[0] not in ups})
            versions.append(kept + Counter(ups.items()))
        elif op == "delete":
            if not versions:
                continue
            lo, hi = min(arg), max(arg)
            tbl.delete_where(spark, "id", lo, hi)
            versions.append(
                Counter({p: n for p, n in cur.items() if not (lo <= p[0] <= hi)})
            )
        elif op == "rollback":
            if not versions:
                continue
            v = arg % len(versions)
            tbl.rollback(v)
            versions.append(Counter(versions[v]))
        assert tbl.current_version() == len(versions) - 1
        assert tbl.rows() == sum(versions[-1].values())
        got = Counter((r.id, r.tag) for r in tbl.read(spark).collect())
        assert got == versions[-1], (op, arg)
    # full history replay, every version byte-stable after later ops
    for v, model in enumerate(versions):
        got = Counter((r.id, r.tag) for r in tbl.read(spark, version=v).collect())
        assert got == model, f"version {v}"
