"""Incremental aggregate maintenance (materialized-view refresh).

The reference's golden zone is recomputed from scratch on every
pipeline run (transformations_code.py:190-196 rebuilds the aggregate
and overwrites golden_db) — correct, and hopeless at 100 TB where the
day's delta is 0.1% of the table. The scalable refresh recomputes
NOTHING it already knows: keep the view's aggregates in a mergeable
PARTIAL form, aggregate only the appended rows, and merge partials by
group key — cost O(delta + |view|), independent of the base table's
history.

Which aggregates can do this is a closed, well-known set — the
self-mergeable ("algebraic") ones:

    count, sum, min, max        merge = sum / sum / min / max
    avg                         carried as (sum, count), finalized late
    approx count-distinct       carried as an HLL sketch (hll_sketch_agg
                                partials, hll_union_agg merge)

Non-decomposable aggregates (exact distinct counts, exact medians)
are rejected at spec time, not silently miscomputed: their partials
are the data itself, which is exactly the full recompute this module
exists to avoid — route those through percentile/HLL sketches or a
full refresh.

``MaterializedAgg`` binds the spec to TWO snapshot tables
(sources/snapshots.py): the base feed it consumes via
``read_changes`` (paying only the new files) and the view state it
commits atomically with the consumed base version recorded in the
SAME manifest — so refresh is exactly-once: a crashed refresh leaves
the old state + old cursor, a replayed refresh sees the cursor already
advanced and no-ops. On non-append base history (overwrite/rollback)
``read_changes`` refuses and ``refresh`` falls back to a full
recompute — automatically, because a wrong delta is worse than a slow
refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import SnapshotTable

#: fn name -> (partial exprs builder, merge exprs builder, finalize builder).
#: Partial columns are named ``{col}__p_{fn}{i}``; the finalize step
#: projects them to the user-facing ``{col}_{fn}`` (the reference's
#: ``{col}_{fn}`` naming, transformations_code.py:150-164).
_DECOMPOSABLE = {"count", "sum", "min", "max", "avg", "approx_count_distinct"}


def _partial_cols(col: str, fn: str) -> list[str]:
    if fn == "avg":
        return [f"{col}__p_avg_sum", f"{col}__p_avg_cnt"]
    if fn == "approx_count_distinct":
        return [f"{col}__p_hll"]
    return [f"{col}__p_{fn}"]


def _partial_exprs(col: str, fn: str) -> list:
    if fn == "count":
        return [F.count(col).alias(f"{col}__p_count")]
    if fn == "sum":
        return [F.sum(col).alias(f"{col}__p_sum")]
    if fn == "min":
        return [F.min(col).alias(f"{col}__p_min")]
    if fn == "max":
        return [F.max(col).alias(f"{col}__p_max")]
    if fn == "avg":
        return [
            F.sum(col).alias(f"{col}__p_avg_sum"),
            F.count(col).alias(f"{col}__p_avg_cnt"),
        ]
    if fn == "approx_count_distinct":
        return [F.hll_sketch_agg(col).alias(f"{col}__p_hll")]
    raise ValueError(f"unsupported aggregate {fn!r}")


def _merge_expr(pcol: str):
    if pcol.endswith("__p_min"):
        return F.min(pcol).alias(pcol)
    if pcol.endswith("__p_max"):
        return F.max(pcol).alias(pcol)
    if pcol.endswith("__p_hll"):
        return F.hll_union_agg(pcol).alias(pcol)
    return F.sum(pcol).alias(pcol)  # count/sum/avg partials all merge by sum


def _finalize_expr(col: str, fn: str):
    if fn == "avg":
        return (F.col(f"{col}__p_avg_sum") / F.col(f"{col}__p_avg_cnt")).alias(
            f"{col}_avg"
        )
    if fn == "approx_count_distinct":
        return F.hll_sketch_estimate(f"{col}__p_hll").alias(
            f"{col}_approx_count_distinct"
        )
    return F.col(f"{col}__p_{fn}").alias(f"{col}_{fn}")


def validate_spec(aggs: dict[str, list[str]]) -> None:
    """Reject non-decomposable aggregates at definition time."""
    for col, fns in aggs.items():
        for fn in fns:
            if fn not in _DECOMPOSABLE:
                raise ValueError(
                    f"aggregate {fn!r} on {col!r} is not incrementally "
                    f"maintainable (decomposable set: "
                    f"{sorted(_DECOMPOSABLE)}); use a sketch form or a "
                    "full refresh"
                )


def partial_agg(df: DataFrame, keys: list[str], aggs: dict[str, list[str]]) -> DataFrame:
    """One shuffle: group ``df`` by ``keys`` into PARTIAL aggregate
    columns (map-side combine applies — partials are small)."""
    exprs = [e for col, fns in aggs.items() for fn in fns for e in _partial_exprs(col, fn)]
    return df.groupBy(*keys).agg(*exprs)


def merge_partials(
    state: DataFrame, delta: DataFrame, keys: list[str], aggs: dict[str, list[str]]
) -> DataFrame:
    """Merge two partial-form tables by key: union + re-aggregate with
    each partial's merge function. One shuffle of O(|state| + |delta
    groups|) rows — never the base table."""
    pcols = [p for col, fns in aggs.items() for fn in fns for p in _partial_cols(col, fn)]
    merged = state.select(*keys, *pcols).unionByName(delta.select(*keys, *pcols))
    return merged.groupBy(*keys).agg(*[_merge_expr(p) for p in pcols])


def finalize(state: DataFrame, keys: list[str], aggs: dict[str, list[str]]) -> DataFrame:
    """Project partial columns to the user-facing ``{col}_{fn}`` view."""
    exprs = [_finalize_expr(col, fn) for col, fns in aggs.items() for fn in fns]
    return state.select(*keys, *exprs)


class MaterializedAgg:
    """An incrementally-maintained grouped aggregate over a snapshot
    table.

    ``refresh`` advances the view to the base table's current version:
    reads only the files appended since the last consumed version,
    partial-aggregates them, merges into the stored partial state, and
    commits state + new cursor atomically (the cursor rides the state
    table's manifest). ``read`` serves the finalized view.
    """

    def __init__(
        self,
        base: SnapshotTable,
        state: SnapshotTable,
        keys: list[str],
        aggs: dict[str, list[str]],
    ):
        validate_spec(aggs)
        self.base, self.state, self.keys, self.aggs = base, state, keys, aggs

    def _cursor(self) -> int | None:
        v = self.state.current_version()
        if v is None:
            return None
        # cursor rides the manifest's operation field: "refresh@<base_v>"
        op = self.state.manifest(v)["operation"]
        if op.startswith("refresh@"):
            return int(op.split("@", 1)[1])
        return None

    def refresh(self, spark: SparkSession) -> dict:
        """Advance the view to the base's current version. Returns what
        happened: mode (noop / incremental / full), versions moved."""
        base_v = self.base.current_version()
        if base_v is None:
            return {"mode": "noop", "reason": "base table has no commits"}
        cur = self._cursor()
        if cur == base_v:
            return {"mode": "noop", "reason": f"already at base v{base_v}"}
        state_v = self.state.current_version()
        # Every base read below PINS base_v: an unpinned read resolves
        # the current version AT READ TIME, so a writer landing between
        # the cursor capture and the read would feed the view rows the
        # cursor doesn't account for — the next incremental refresh
        # then re-reads those files and double-counts them (same
        # read-pin discipline as SnapshotTable.compact).
        if cur is None:
            new_state = partial_agg(
                self.base.read(spark, version=base_v), self.keys, self.aggs
            )
            mode = "full"
        else:
            try:
                delta = self.base.read_changes(spark, cur, base_v)
                dpart = partial_agg(delta, self.keys, self.aggs)
                new_state = merge_partials(
                    self.state.read(spark), dpart, self.keys, self.aggs
                )
                mode = "incremental"
            except ValueError:
                # overwrite/rollback in the base's history: a file-diff
                # delta would be wrong, recompute from the snapshot
                new_state = partial_agg(
                    self.base.read(spark, version=base_v), self.keys, self.aggs
                )
                mode = "full"
        v = self._commit_state(new_state, base_v, expected=state_v)
        return {"mode": mode, "base_version": base_v, "state_version": v}

    def _commit_state(self, df: DataFrame, base_v: int, expected) -> int:
        """Commit new state with the consumed base version recorded in
        the manifest's operation field — state and cursor move in ONE
        atomic publish, which is what makes refresh exactly-once."""
        files, rows, schema_json, stats = self.state._stage(df)
        parent = self.state.current_version()
        if parent != expected:
            raise RuntimeError(
                f"concurrent refresh detected (state moved {expected} -> {parent})"
            )
        import time as _time

        manifest = {
            "version": (parent + 1) if parent is not None else 0,
            "parent": parent,
            "operation": f"refresh@{base_v}",
            "files": files,
            "added_files": files,
            "rows": rows,
            "schema": schema_json,
            "stats": stats,
            "committed_at": _time.time(),
        }
        return self.state._publish(manifest, manifest["version"])

    def read(self, spark: SparkSession) -> DataFrame:
        """The finalized view at its last refreshed state."""
        return finalize(self.state.read(spark), self.keys, self.aggs)
