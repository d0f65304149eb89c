"""Slowly-changing-dimension maintenance (SCD Type 2).

The reference's incremental load is strictly additive on a
monotonically increasing key (data_extraction.py:59-107): when a
SOURCE ROW CHANGES — a customer moves nation, a part is re-priced —
it either keeps the stale row forever or (full refresh,
data_extraction.py:28-56) overwrites it and destroys the history every
as-of query needs. SCD Type 2 is the standard warehouse answer: each
key carries a chain of versioned rows, ``[effective_from,
effective_to)`` half-open intervals with exactly one open
(``is_current``) row per key. This module maintains that chain with
set-based DataFrame ops — the dimension-table twin of
incremental.merge_latest (which keeps ONLY the latest version; SCD2
keeps them all, queryable as-of any time, e.g. by
``operators/joins.asof_join`` on ``effective_from``).

Plan shape (the 100 TB read): historical (closed) rows pass through
untouched — the working set is current rows + the update batch, ONE
hash shuffle on the key; both window passes and the late-row guard
share that single partitioning, so Catalyst plans one exchange.
No driver materialization anywhere.

Semantics, pinned by tests/test_scd.py against a DuckDB window oracle:

* an update whose tracked attributes equal the key's current row is a
  NO-OP (no new version — the classic checksum-compare short-circuit);
* several updates to one key in one batch chain in timestamp order,
  each closing its predecessor;
* duplicate (key, ts) rows in one batch dedupe deterministically
  (greatest tracked-attribute struct wins — order-independent);
* an update whose timestamp precedes the key's current
  ``effective_from`` is LATE: history is immutable here, so it is
  dropped (``on_late='drop'``, counted) or the merge raises
  (``on_late='error'``) — never silently spliced into closed
  intervals;
* brand-new keys open their chain at their first update's timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: SCD2 bookkeeping columns added to the caller's schema.
SCD2_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(source: DataFrame, effective_from) -> DataFrame:
    """Bootstrap a Type-2 dimension from a current-state snapshot:
    every row becomes its key's first (open) version. ``effective_from``
    is a Column or literal for the initial validity start."""
    ef = effective_from if isinstance(effective_from, Column) else F.lit(effective_from)
    return (
        source.withColumn("effective_from", ef.cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    tracked: list[str],
    ts_col: str = "ts",
    on_late: str = "drop",
) -> DataFrame:
    """Merge an update batch into a Type-2 dimension; returns the full
    new dimension (history rows unchanged, chains extended/closed).

    ``dim``: key + tracked + SCD2_COLS. ``updates``: key + tracked +
    ``ts_col`` (the change time; becomes the new version's
    ``effective_from``). Output column order matches ``dim``.
    """
    if on_late not in ("drop", "error"):
        raise ValueError(f"on_late {on_late!r}: use 'drop' or 'error'")
    keys = [key] if isinstance(key, str) else list(key)
    attrs = F.struct(*[F.col(c) for c in tracked])

    hist = dim.where(~F.col("is_current"))
    cur = dim.where(F.col("is_current")).select(
        *keys, *tracked, "effective_from", F.lit(0).alias("__src")
    )
    ups = updates.select(
        *keys,
        *tracked,
        F.col(ts_col).cast("timestamp").alias("effective_from"),
        F.lit(1).alias("__src"),
    )

    u = cur.unionByName(ups)
    by_key = Window.partitionBy(*keys)
    # Deterministic same-(key, ts) dedupe: greatest attribute struct
    # wins, independent of batch row order / partitioning. Expressed on
    # the by-key partitioning (ordered so each (ts, src=1) run leads
    # with its winner; a dup is any src=1 row whose predecessor shares
    # its timestamp-and-src) rather than a (key, ts)-partitioned
    # row_number, so ALL the merge's windows share ONE hash exchange —
    # plan-asserted single-shuffle in tests/test_scd.py.
    dedupe_order = by_key.orderBy("effective_from", "__src", attrs.desc())
    is_dup = (
        (F.col("__src") == 1)
        & (F.lag("effective_from").over(dedupe_order) == F.col("effective_from"))
        & (F.lag("__src").over(dedupe_order) == 1)
    )
    u = (
        u.withColumn("__dup", F.coalesce(is_dup, F.lit(False)))
        .where(~F.col("__dup"))
        .drop("__dup")
    )
    # Late guard: the current row's effective_from, visible to every row
    # of the key via an unordered whole-partition window — no extra join,
    # same shuffle as the ordering windows below.
    cur_from = F.max(F.when(F.col("__src") == 0, F.col("effective_from"))).over(by_key)
    is_late = (F.col("__src") == 1) & (F.col("effective_from") < cur_from)
    if on_late == "error":
        u = u.withColumn(
            "effective_from",
            F.when(
                is_late,
                F.raise_error(
                    F.concat(
                        F.lit("scd2_merge: late update (ts precedes current "
                              "effective_from) for key "),
                        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]),
                    )
                ).cast("timestamp"),
            ).otherwise(F.col("effective_from")),
        )
    else:
        u = (
            u.withColumn("__late", F.coalesce(is_late, F.lit(False)))
            .where(~F.col("__late"))
            .drop("__late")
        )

    order = by_key.orderBy("effective_from", "__src")
    # Change detection: keep a row iff its tracked attributes differ
    # from the key's previous surviving state. lag() sees dropped
    # predecessors, so equal-to-lag is computed BEFORE filtering and a
    # run of identical updates collapses to its first row; a later
    # DIFFERENT row still compares against its true predecessor because
    # runs collapse transitively (A,A,B keeps A,B; A,B,A keeps all 3 —
    # re-change to an old value IS a new version, the SCD2 rule).
    changed = (
        F.lag(attrs).over(order).isNull() | (F.lag(attrs).over(order) != attrs)
    )
    kept = u.withColumn("__keep", changed).where(F.col("__keep"))
    reorder = by_key.orderBy("effective_from", "__src")
    chained = (
        kept.withColumn("effective_to", F.lead("effective_from").over(reorder))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("__src", "__keep")
    )
    return hist.select(*dim.columns).unionByName(chained.select(*dim.columns))


def scd2_asof(dim: DataFrame, at) -> DataFrame:
    """The dimension as of time ``at``: the version whose
    ``[effective_from, effective_to)`` interval contains it — one
    pushed-down filter, no window."""
    at_c = at if isinstance(at, Column) else F.lit(at)
    at_c = at_c.cast("timestamp")
    return dim.where(
        (F.col("effective_from") <= at_c)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > at_c))
    )
