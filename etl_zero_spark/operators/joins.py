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
        # cast("timestamp") no-ops on TimestampType; makes NTZ inputs safe.
        gap = F.abs(
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(matched.getField(on).cast("timestamp"))
        )
        matched = F.when(gap <= F.lit(int(tolerance_seconds * 1_000_000)), matched)

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    lset = set(left.columns)
    out_cols += [
        matched.getField(c).alias(f"{c}{suffix}" if c in lset else c)
        for c in r_fields
    ]
    return u.where(F.col("__side") == 1).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-interval join (``start <= point <= end``, plus optional
    ``by`` equality keys) without the nested loop.

    Catalyst can only plan a raw BETWEEN predicate as
    BroadcastNestedLoopJoin — O(|P| x |I|) comparisons and a broadcast
    of one whole side. This bucketizes instead: every interval explodes
    to the fixed-width buckets it overlaps, every point maps to its ONE
    bucket, and the two sides meet in a plain shuffled equi-join on
    (by, bucket) followed by the exact BETWEEN filter. Each qualifying
    (point, interval) pair meets in exactly one bucket — the point's —
    so no dedup pass is needed and row multiplicity is exact.

    Cost: |I| replicates by ceil(len/width)+1 (about 2x at the default
    width) and one shuffle of both sides — the sort-merge-join shape,
    scale-safe at any corpus size. ``bucket_width`` defaults to the
    mean interval length (one tiny agg; a driver scalar like
    ``_n_blocks``) — the classic balance between interval replication
    (narrow buckets) and false candidates (wide buckets). Degenerate
    all-zero-length inputs fall back to width 1.

    ``point_col``/``start_col``/``end_col`` may be numeric or
    timestamp (timestamps bucket on microseconds). Bounds are
    INCLUSIVE on both ends (DuckDB BETWEEN convention — its native
    IEJoin range join is the test oracle). ``how``: "inner" or "left"
    (unmatched points keep nulls).

    Interval columns are carried whole; a column name colliding with a
    point column gains ``suffix``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, not {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])

    def to_num(c: F.Column, dt: str) -> F.Column:
        # cast("timestamp") is a no-op on TimestampType and makes NTZ
        # inputs safe for unix_micros (session TZ pinned UTC).
        if dt.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double")

    p_dt = dict(points.dtypes)[point_col]
    s_dt = dict(intervals.dtypes)[start_col]
    e_dt = dict(intervals.dtypes)[end_col]
    p_num = to_num(F.col(point_col), p_dt)
    s_num = to_num(F.col(start_col), s_dt)
    e_num = to_num(F.col(end_col), e_dt)

    if bucket_width is None:
        row = intervals.select(
            F.avg(to_num(F.col(end_col), e_dt) - to_num(F.col(start_col), s_dt))
        ).first()
        bucket_width = float(row[0]) if row and row[0] else 1.0
        bucket_width = max(bucket_width, 1.0)

    w = F.lit(float(bucket_width))
    pset = set(points.columns)
    i_cols = [
        (c, f"{c}{suffix}" if c in pset else c)
        for c in intervals.columns
        if c not in by
    ]
    i2 = intervals.select(
        *by,
        *[F.col(c).alias(a) for c, a in i_cols],
        F.explode(
            F.sequence(
                F.floor(s_num / w).cast("long"), F.floor(e_num / w).cast("long")
            )
        ).alias("__bucket"),
    )
    p2 = points.withColumn("__bucket", F.floor(p_num / w).cast("long"))

    s_out = next(a for c, a in i_cols if c == start_col)
    e_out = next(a for c, a in i_cols if c == end_col)
    cond = [p2["__bucket"] == i2["__bucket"], *[p2[k] == i2[k] for k in by]]
    joined = p2.join(i2, cond, "inner").where(
        to_num(p2[point_col], p_dt).between(
            to_num(i2[s_out], s_dt), to_num(i2[e_out], e_dt)
        )
    )
    out = joined.select(
        *[p2[c] for c in points.columns], *[i2[a] for _, a in i_cols]
    )
    if how == "left":
        matched_keys = out.select(*[F.col(c) for c in points.columns])
        unmatched = points.exceptAll(matched_keys)
        pad = unmatched.select(
            "*", *[F.lit(None).cast(dict(intervals.dtypes)[c]).alias(a) for c, a in i_cols]
        )
        out = out.unionByName(pad)
    return out


def edit_similarity_expr(a, b):
    """Normalized edit similarity ``1 - lev(a,b)/max(|a|,|b|)`` as a
    native Column expression (JVM levenshtein, no UDF). Two empty
    strings are identical (similarity 1)."""
    denom = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.round(F.lit(1.0) - F.levenshtein(a, b) / denom, 6)
    )


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    threshold: float = 0.8,
    q: int = 3,
    df_cap: int | None = 10_000,
    normalize: bool = True,
) -> DataFrame:
    """Data-level fuzzy equi-join: all (left, right) pairs whose
    strings have edit similarity >= ``threshold`` — entity resolution
    over names/titles, the data-scale version of the reference's
    column-NAME fuzzy matching (transformations_code.py:11-21).

    Spark-first shape (Ed-Join/q-gram blocking, Xiao et al., VLDB'08):
    pad each string with q-1 boundary markers, explode its q-gram SET
    into an inverted index, candidates meet in ONE shuffled equi-join
    on the q-gram, then rescore exactly with the native
    ``levenshtein`` expression — no cross join, no UDF.

    Recall contract (the q-gram count lemma): d edits destroy at most
    q*d of a padded string's |s|+q-1 q-grams, so a qualifying pair
    still shares a q-gram whenever ``(1-t)*maxlen < (maxlen+q-2)/q``
    — with q=3 that holds for every threshold >= 2/3 at any string
    length. Below that, pairs whose every shared gram was destroyed
    can be missed — use dedup.ngram_jaccard_pairs for low-threshold
    regimes.

    ``df_cap`` drops q-grams occurring in more than that many index
    rows from DISCOVERY (stop-gram bound, as in dd2): a gram shared
    by m rows emits m^2 candidates, so boilerplate grams must not fan
    out at corpus scale. Reported similarity stays exact; only
    discovery through capped grams is lost.

    Output: all left columns + all right columns (renamed ``*_r`` on
    collision) + ``similarity``.
    """
    lid, rid = "__fz_lid", "__fz_rid"
    lnorm, rnorm = "__fz_lval", "__fz_rval"
    pad_str = "\u0001" * (q - 1)  # boundary marker outside normal text

    def prep(df: DataFrame, col: str, idc: str, vc: str) -> DataFrame:
        v = F.col(col)
        if normalize:
            v = F.lower(F.trim(v))
        return df.withColumn(idc, F.monotonically_increasing_id()).withColumn(vc, v)

    L = prep(left, left_col, lid, lnorm)
    R = prep(right, right_col, rid, rnorm)

    def grams(df: DataFrame, idc: str, vc: str) -> DataFrame:
        padded = F.concat(F.lit(pad_str), F.col(vc), F.lit(pad_str))
        idx = F.sequence(F.lit(1), F.length(padded) - (q - 1))
        gs = F.array_distinct(F.transform(idx, lambda i: padded.substr(i, F.lit(q))))
        out = df.where(F.col(vc).isNotNull()).select(
            idc, F.explode(gs).alias("__gram")
        )
        if df_cap is not None:
            hot = (
                out.groupBy("__gram")
                .agg(F.count(F.lit(1)).alias("__df"))
                .where(F.col("__df") > df_cap)
                .select("__gram")
            )
            out = out.join(F.broadcast(hot), "__gram", "left_anti")
        return out

    cand = (
        grams(L, lid, lnorm)
        .join(grams(R, rid, rnorm), "__gram")
        .select(lid, rid)
        .dropDuplicates()
    )
    sim = (
        cand.join(L.select(lid, lnorm), lid)
        .join(R.select(rid, rnorm), rid)
        .withColumn("similarity", edit_similarity_expr(F.col(lnorm), F.col(rnorm)))
        .where(F.col("similarity") >= F.lit(float(threshold)))
        .select(lid, rid, "similarity")
    )
    # re-attach full rows; suffix right-side collisions
    rcols = {c: (c if c not in left.columns else f"{c}_r") for c in right.columns}
    r_full = R.select(rid, *[F.col(c).alias(a) for c, a in rcols.items()])
    return (
        sim.join(L.drop(lnorm), lid)
        .join(r_full, rid)
        .drop(lid, rid, lnorm, rnorm)
    )
