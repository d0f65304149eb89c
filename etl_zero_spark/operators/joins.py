"""Join utilities for the scale cases Catalyst doesn't solve alone.

The reference's joins are MySQL-executed SQL strings
(ETL_Pipeline_Entire/mapping.py:126,162-165); the engine's everyday
joins are plain ``df.join`` — AQE picks broadcast vs sort-merge and
splits moderately skewed partitions (``spark.sql.adaptive.skewJoin``,
on in session.py). This module covers what's left:

* ``salted_join`` — EXTREME key skew: one hot key whose rows exceed a
  single task's memory. AQE's skew-join splits oversized *partitions of
  the already-shuffled build side*, but both sides of one key still
  meet in one task; salting splits the hot key itself across
  ``n_salts`` tasks by widening the join key to (key, salt).
* bucketed co-located joins live on the write side — see
  ``catalog.Zone.write_bucketed`` (pay the fact table's shuffle once at
  write time, never at join time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-mitigating equi-join on a same-named ``key`` column.

    The big (skewed) side gains a uniform random salt in [0, n_salts);
    the small side replicates once per salt value. Joining on
    (key, salt) spreads a hot key's rows over ``n_salts`` tasks at the
    cost of an ``n_salts``-fold blow-up of the SMALL side only — the
    classic trade when the small side is broadcast-sized but the hot
    key is not.

    Correct for inner/left/left_semi/left_anti with ``big`` on the
    left: every (key, salt) the big side can produce exists on the
    replicated small side exactly when the key exists at all, so match
    semantics are unchanged. Row multiplicity is also unchanged: each
    big row carries ONE salt, so it meets each matching small row
    exactly once.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins, not {how!r} "
            "(a right/full join would need the salt on the other side)"
        )
    b = big.withColumn(_SALT, F.floor(F.rand(seed) * n_salts).cast("int"))
    # sequence of int literals explodes to int — matching the big side's
    # cast (a cast around a generator expression is not allowed)
    s = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, on=[key, _SALT], how=how).drop(_SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time (as-of) left join — the time-series operator Spark
    has no built-in for, composed from a union + one window pass.

    For each left row, attach the single right row with the same ``by``
    keys and the greatest ``on`` <= left ``on`` (``backward``; think
    "latest price at or before the trade") or the smallest
    ``on`` >= left ``on`` (``forward``). Left rows with no match keep
    nulls (left-outer semantics). Matches DuckDB's native
    ``ASOF [LEFT] JOIN`` (the correctness oracle for the declared
    query) when (by, on) is unique on the right; with duplicates the
    greatest payload struct wins deterministically here, where DuckDB
    leaves the pick unspecified.

    Spark-first shape — NOT a per-key loop and NOT a range cross-join:
    both sides union into one stream tagged by side, a single window
    (partitionBy ``by``, orderBy (``on``, side, payload)) carries the
    last non-null right payload forward (``F.last(ignorenulls=True)``),
    and left rows then read their match off that column. Cost is ONE
    shuffle of |L|+|R| rows on ``by`` plus a sort — the same exchange a
    sort-merge equi-join would pay, with none of the candidate blow-up
    of the interval-join formulation (l.ts BETWEEN r.ts AND r.ts+tol),
    which Catalyst can only plan as a broadcast-nested-loop. At equal
    timestamps the right row sorts before the left row, making the
    match inclusive on both directions — DuckDB's convention.

    ``tolerance_seconds`` nulls out matches farther than the bound
    (timestamp ``on``) — applied AFTER the window pass, so it is a
    projection, not a plan change. Skew note: one window partition per
    ``by`` key — a pathologically hot key serializes into one task;
    pre-split such keys with a coarse time-bucket added to ``by`` (the
    salting trade from ``salted_join`` does not compose with windows).

    Output: every left column, then each right payload column named
    ``{c}{suffix}`` when it collides with a left column (``on`` always
    collides -> ``{on}{suffix}``).
    """
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, not {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if not by:
        raise ValueError("asof_join requires at least one `by` equality key")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    r_fields = [on, *right_cols]

    l_type = StructType([StructField(f.name, f.dataType, True) for f in left.schema])
    r_schema = {f.name: f.dataType for f in right.schema}
    r_type = StructType([StructField(c, r_schema[c], True) for c in r_fields])

    l2 = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
        F.lit(1).alias("__side"),
    )
    r2 = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit(None).cast(l_type).alias("__l"),
        F.struct(*[F.col(c) for c in r_fields]).alias("__r"),
        F.lit(0).alias("__side"),
    )
    u = l2.unionByName(r2)

    order = (
        [F.col("__ts").asc(), F.col("__side").asc(), F.col("__r").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__side").asc(), F.col("__r").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    matched = F.col("__m")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(matched.getField(on))
        )
        matched = F.when(gap <= F.lit(int(tolerance_seconds * 1_000_000)), matched)

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    lset = set(left.columns)
    out_cols += [
        matched.getField(c).alias(f"{c}{suffix}" if c in lset else c)
        for c in r_fields
    ]
    return u.where(F.col("__side") == 1).select(*out_cols)
