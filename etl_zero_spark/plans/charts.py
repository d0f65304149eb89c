"""Visualization layer: chart-data preparation (distributed) + SVG
rendering (driver-side, dependency-free).

The reference's visualization page (front_end.py:726-824) reads a
golden table into pandas and hands raw columns to Streamlit: bar /
line / scatter plot ``df.set_index(x)[y]`` as-is, histogram plots
``value_counts(bins=n)``, pie aggregates ``groupby(cat)[val].sum()``.
That shape collapses at scale — you cannot ship 100 TB of points to a
chart. The engine split is therefore:

* ``*_data`` functions — Spark DataFrame programs that reduce the
  table to a BOUNDED chart-ready aggregate (top-N categories, fixed
  bin counts, capped point samples). These are the distributed part
  and each is oracle-tested (pandas parity for the reference's exact
  semantics where it has any — see ``histogram_data``'s
  ``value_counts(bins=N)`` edge convention).
* ``render_svg`` — a deterministic, stdlib-only SVG renderer over the
  collected (bounded) rows. Rendering is inherently a driver/UI
  concern; the reference delegates it to Streamlit, this engine emits
  portable SVG so it has no UI dependency at all.
"""

from __future__ import annotations

import math
from html import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hard ceiling on rows any chart-prep may return — charts are for
#: humans; anything larger is a data export, not a chart.
MAX_CHART_ROWS = 10_000


def bar_data(
    df: DataFrame, x: str, y: str, agg: str = "sum", max_categories: int = 50
) -> DataFrame:
    """Bar-chart prep: ``y`` aggregated per ``x`` category, largest
    ``max_categories`` kept (deterministic (value desc, key) order so
    the chart is stable run-to-run). The reference plots raw rows
    (front_end.py:793); at scale the aggregate IS the chart."""
    agg_fn = getattr(F, agg)
    out = df.groupBy(F.col(x).cast("string").alias("key")).agg(
        agg_fn(F.col(y)).cast("double").alias("value")
    )
    return out.orderBy(F.desc("value"), "key").limit(
        min(max_categories, MAX_CHART_ROWS)
    )


def line_data(df: DataFrame, x: str, y: str, max_points: int = 1000) -> DataFrame:
    """Line-chart prep: mean of ``y`` per x-PIXEL — ``x`` (numeric or
    timestamp) bucketed into at most ``max_points`` equal-width
    buckets, one output point per non-empty bucket at its center.
    This is pixel-width decimation: a chart ``max_points`` wide cannot
    show more detail than one value per pixel, so the reduction is
    lossless for the rendered artifact while costing one scan + a
    2-scalar broadcast + one bounded shuffle — no global window, no
    per-key state, any input size."""
    xv = F.col(x)
    if dict(df.dtypes)[x].startswith("timestamp"):
        xv = xv.cast("timestamp")
    xv = xv.cast("double")
    pts = df.select(xv.alias("xv"), F.col(y).cast("double").alias("yv")).where(
        F.col("xv").isNotNull() & F.col("yv").isNotNull()
    )
    stats = pts.agg(F.min("xv").alias("mn"), F.max("xv").alias("mx"))
    bucket = F.when(F.col("mn") == F.col("mx"), F.lit(1)).otherwise(
        F.least(
            F.expr(f"width_bucket(xv, mn, mx, {max_points})"), F.lit(max_points)
        )
    )
    span = F.col("mx") - F.col("mn")
    return (
        pts.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("__b"), "mn", "mx")
        .agg(F.avg("yv").alias("value"))
        .select(
            (F.col("mn") + (F.col("__b") - 0.5) * span / max_points).alias("key"),
            "value",
        )
        .orderBy("key")
    )


def scatter_data(
    df: DataFrame, x: str, y: str, max_points: int = 2000, seed: int = 42
) -> DataFrame:
    """Scatter prep: deterministic hash-ordered cap at ``max_points``
    (NOT ``.sample``, whose row set shifts with partitioning — the
    xxhash order is a pure function of the data, so the same rows
    render on every run and every cluster layout)."""
    pts = df.select(
        F.col(x).cast("double").alias("x"), F.col(y).cast("double").alias("y")
    ).where(F.col(x).isNotNull() & F.col(y).isNotNull())
    return (
        pts.orderBy(F.xxhash64("x", "y", F.lit(seed)), "x", "y")
        .limit(min(max_points, MAX_CHART_ROWS))
    )


def histogram_data(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Histogram prep with the REFERENCE's exact bin convention —
    pandas ``value_counts(bins=N)`` / ``pd.cut`` (front_end.py:806):
    N equal-width intervals over [min, max], RIGHT-closed (a value on
    an interior edge belongs to the bin that ends there), with the
    first edge stretched 0.1% left so the minimum lands in bin 0.
    (Spark's ``width_bucket`` and the a3 histogram tranche use right-OPEN bins —
    the conventions differ exactly on edge values.)

    Right-closed via negation: ``width_bucket`` is right-open, so
    bucketing ``-x`` over [-max, -min] makes each NEGATED interval
    left-closed — i.e. the original interval right-closed, with every
    interior edge at its exact linspace position (only bin 1's left
    edge is conceptually stretched, realized here as clamping the
    minimum — which falls just out of range after negation — into
    bin 1). Empty bins are kept (count 0), matching
    ``value_counts(bins=)``. Known deviations: edge values disagree
    with pandas only in the last ulp of the edge arithmetic, and an
    all-constant column lands in bin 1 (pandas centers it).

    Output: (bin bigint, lo double, hi double, count bigint), one row
    per bin, ordered — bounded by construction.
    """
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    stats = vals.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    bucket = F.when(F.col("mn") == F.col("mx"), F.lit(1)).otherwise(
        F.greatest(
            F.lit(1),
            F.lit(bins + 1) - F.expr(f"width_bucket(-v, -mx, -mn, {bins})"),
        )
    )
    counted = (
        vals.crossJoin(F.broadcast(stats))
        .select(bucket.cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    # Dense bin spine so empty bins render as 0-height bars.
    spine = stats.select(
        F.explode(F.sequence(F.lit(1), F.lit(bins))).alias("bin"), "mn", "mx"
    ).select(
        "bin",
        (F.col("mn") + (F.col("bin") - 1) * (F.col("mx") - F.col("mn")) / bins).alias(
            "lo"
        ),
        (F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn")) / bins).alias("hi"),
    )
    return (
        spine.join(counted, "bin", "left")
        .select("bin", "lo", "hi", F.coalesce("count", F.lit(0)).alias("count"))
        .orderBy("bin")
    )


def pie_data(
    df: DataFrame, category: str, value: str, max_slices: int = 24
) -> DataFrame:
    """Pie prep — the reference's ``groupby(category)[value].sum()``
    (front_end.py:819) with a top-N guard: slices beyond
    ``max_slices - 1`` fold into an '(other)' slice instead of
    vanishing, so the total is preserved at any cardinality."""
    agg = df.groupBy(F.col(category).cast("string").alias("key")).agg(
        F.sum(F.col(value)).cast("double").alias("value")
    )
    # Top-N via TakeOrderedAndProject (distributed partial top-k, no
    # global window over the category set); the residual becomes one
    # '(other)' slice computed from two 1-row aggregates.
    top = agg.orderBy(F.desc("value"), "key").limit(max_slices - 1)
    totals = agg.agg(
        F.sum("value").alias("__t"), F.count(F.lit(1)).alias("__n")
    )
    kept = top.agg(F.sum("value").alias("__ts"), F.count(F.lit(1)).alias("__k"))
    other = (
        totals.crossJoin(kept)
        .where(F.col("__n") > F.col("__k"))
        .select(
            F.lit("(other)").alias("key"),
            (F.col("__t") - F.coalesce(F.col("__ts"), F.lit(0.0))).alias("value"),
        )
    )
    return top.unionByName(other)


# ---------------------------------------------------------------------------
# SVG rendering (driver-side, stdlib-only, deterministic)
# ---------------------------------------------------------------------------

_W, _H = 640, 400
_MARGIN = 48
_PALETTE = [
    "#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f", "#edc948",
    "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac",
]


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


def _header(title: str | None) -> list[str]:
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
    ]
    if title:
        parts.append(
            f'<text x="{_W // 2}" y="20" text-anchor="middle" '
            f'font-size="14">{escape(str(title))}</text>'
        )
    return parts


def _axes(y_max: float) -> list[str]:
    x0, y0, x1, y1 = _MARGIN, _H - _MARGIN, _W - _MARGIN, _MARGIN
    parts = [
        f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="black"/>',
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="black"/>',
    ]
    for i in range(5):
        frac = i / 4
        y = y0 - frac * (y0 - y1)
        parts.append(
            f'<text x="{x0 - 6}" y="{_fmt(y + 4)}" text-anchor="end" '
            f'font-size="10">{_fmt(y_max * frac)}</text>'
        )
    return parts


def render_svg(
    kind: str,
    rows: list[dict],
    title: str | None = None,
) -> str:
    """Render collected chart rows to an SVG string.

    ``rows``: list of dicts — bar/pie/line: {key, value}; histogram:
    {bin, lo, hi, count}; scatter: {x, y}. Deterministic output (fixed
    canvas, 2-decimal coordinates, data-order preserved); raises on
    unknown kind, empty input, or row counts no chart should have
    (> MAX_CHART_ROWS — chart-prep should have bounded it).
    """
    if not rows:
        raise ValueError("render_svg: empty input — nothing to draw")
    if len(rows) > MAX_CHART_ROWS:
        raise ValueError(
            f"render_svg: {len(rows)} rows — chart-prep must bound the "
            f"input to <= {MAX_CHART_ROWS}"
        )
    if kind == "histogram":
        rows = [
            {"key": f"[{_fmt(r['lo'])},{_fmt(r['hi'])}]", "value": float(r["count"])}
            for r in rows
        ]
        kind = "bar"
    if kind == "bar":
        return _render_bar(rows, title)
    if kind == "line":
        return _render_line(rows, title)
    if kind == "scatter":
        return _render_scatter(rows, title)
    if kind == "pie":
        return _render_pie(rows, title)
    if kind == "funnel":
        return _render_funnel(rows, title)
    if kind == "retention":
        return _render_retention(rows, title)
    raise ValueError(f"render_svg: unknown kind {kind!r}")


def _render_bar(rows: list[dict], title: str | None) -> str:
    y_max = max(float(r["value"]) for r in rows)
    y_max = y_max if y_max > 0 else 1.0
    parts = _header(title) + _axes(y_max)
    x0, y0 = _MARGIN, _H - _MARGIN
    plot_w, plot_h = _W - 2 * _MARGIN, _H - 2 * _MARGIN
    slot = plot_w / len(rows)
    bar_w = slot * 0.8
    for i, r in enumerate(rows):
        h = max(float(r["value"]), 0.0) / y_max * plot_h
        x = x0 + i * slot + slot * 0.1
        parts.append(
            f'<rect x="{_fmt(x)}" y="{_fmt(y0 - h)}" width="{_fmt(bar_w)}" '
            f'height="{_fmt(h)}" fill="{_PALETTE[i % len(_PALETTE)]}">'
            f"<title>{escape(str(r['key']))}: {_fmt(float(r['value']))}</title></rect>"
        )
        if len(rows) <= 30:
            parts.append(
                f'<text x="{_fmt(x + bar_w / 2)}" y="{y0 + 14}" '
                f'text-anchor="middle" font-size="9">'
                f"{escape(str(r['key'])[:12])}</text>"
            )
    parts.append("</svg>")
    return "".join(parts)


def _render_line(rows: list[dict], title: str | None) -> str:
    y_max = max(float(r["value"]) for r in rows)
    y_max = y_max if y_max > 0 else 1.0
    parts = _header(title) + _axes(y_max)
    x0, y0 = _MARGIN, _H - _MARGIN
    plot_w, plot_h = _W - 2 * _MARGIN, _H - 2 * _MARGIN
    n = len(rows)
    pts = []
    for i, r in enumerate(rows):
        px = x0 + (i / max(n - 1, 1)) * plot_w
        py = y0 - max(float(r["value"]), 0.0) / y_max * plot_h
        pts.append(f"{_fmt(px)},{_fmt(py)}")
    parts.append(
        f'<polyline points="{" ".join(pts)}" fill="none" '
        f'stroke="{_PALETTE[0]}" stroke-width="1.5"/>'
    )
    parts.append("</svg>")
    return "".join(parts)


def _render_scatter(rows: list[dict], title: str | None) -> str:
    xs = [float(r["x"]) for r in rows]
    ys = [float(r["y"]) for r in rows]
    x_min, x_max = min(xs), max(xs)
    y_min, y_max = min(ys), max(ys)
    x_span = (x_max - x_min) or 1.0
    y_span = (y_max - y_min) or 1.0
    parts = _header(title) + _axes(y_max)
    x0, y0 = _MARGIN, _H - _MARGIN
    plot_w, plot_h = _W - 2 * _MARGIN, _H - 2 * _MARGIN
    for r in rows:
        px = x0 + (float(r["x"]) - x_min) / x_span * plot_w
        py = y0 - (float(r["y"]) - y_min) / y_span * plot_h
        parts.append(
            f'<circle cx="{_fmt(px)}" cy="{_fmt(py)}" r="2.5" '
            f'fill="{_PALETTE[0]}" fill-opacity="0.6"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _render_pie(rows: list[dict], title: str | None) -> str:
    total = sum(max(float(r["value"]), 0.0) for r in rows)
    if total <= 0:
        raise ValueError("render_svg: pie requires a positive total")
    cx, cy = _W / 2, _H / 2 + 10
    radius = min(_W, _H) / 2 - _MARGIN
    parts = _header(title)
    angle = -math.pi / 2  # 12 o'clock start, clockwise
    for i, r in enumerate(rows):
        frac = max(float(r["value"]), 0.0) / total
        a0, a1 = angle, angle + frac * 2 * math.pi
        angle = a1
        if frac >= 1.0 - 1e-9:  # single-slice pie: a full circle
            parts.append(
                f'<circle cx="{_fmt(cx)}" cy="{_fmt(cy)}" r="{_fmt(radius)}" '
                f'fill="{_PALETTE[i % len(_PALETTE)]}">'
                f"<title>{escape(str(r['key']))}: 100%</title></circle>"
            )
            continue
        x0_, y0_ = cx + radius * math.cos(a0), cy + radius * math.sin(a0)
        x1_, y1_ = cx + radius * math.cos(a1), cy + radius * math.sin(a1)
        large = 1 if (a1 - a0) > math.pi else 0
        parts.append(
            f'<path d="M {_fmt(cx)} {_fmt(cy)} L {_fmt(x0_)} {_fmt(y0_)} '
            f'A {_fmt(radius)} {_fmt(radius)} 0 {large} 1 {_fmt(x1_)} {_fmt(y1_)} Z" '
            f'fill="{_PALETTE[i % len(_PALETTE)]}">'
            f"<title>{escape(str(r['key']))}: {_fmt(frac * 100)}%</title></path>"
        )
    parts.append("</svg>")
    return "".join(parts)


def chart_svg(
    df: DataFrame,
    kind: str,
    x: str | None = None,
    y: str | None = None,
    bins: int = 20,
    title: str | None = None,
    **kwargs,
) -> str:
    """One-call convenience mirroring the reference page's flow: prep
    (distributed) then render (driver). ``x``/``y`` follow the
    reference's selectors — histogram needs only ``x`` (the value
    column), everything else needs both."""
    if kind == "bar":
        prepped = bar_data(df, x, y, **kwargs)
    elif kind == "line":
        prepped = line_data(df, x, y, **kwargs)
    elif kind == "scatter":
        prepped = scatter_data(df, x, y, **kwargs)
    elif kind == "histogram":
        prepped = histogram_data(df, x, bins=bins, **kwargs)
    elif kind == "pie":
        prepped = pie_data(df, x, y, **kwargs)
    else:
        raise ValueError(f"chart_svg: unknown kind {kind!r}")
    return render_svg(kind, [r.asDict() for r in prepped.collect()], title=title)


# ---------------------------------------------------------------------------
# product-analytics charts (R4): funnel + retention heatmap
# ---------------------------------------------------------------------------


def funnel_data(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Chart prep for a conversion funnel: operators/funnel.
    funnel_counts bounded by construction (k rows, k <= funnel
    length)."""
    from etl_zero_spark.operators.funnel import funnel_counts

    return funnel_counts(df, steps, user_col, ts_col, event_col, within)


def retention_data(
    df: DataFrame,
    interval: str = "1 week",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_cohorts: int = 52,
    max_offsets: int = 52,
) -> DataFrame:
    """Chart prep for the retention heatmap: operators/cohorts.
    cohort_retention clipped to the newest ``max_cohorts`` cohorts x
    first ``max_offsets`` periods — a year-by-year triangle stays
    bounded however old the product is. Clipping is by RANK (newest
    cohorts), not silent truncation of arbitrary rows."""
    from pyspark.sql import Window

    from etl_zero_spark.operators.cohorts import cohort_retention

    tri = cohort_retention(df, interval, user_col, ts_col)
    newest = (
        tri.select("cohort")
        .distinct()
        .withColumn(
            "__r", F.row_number().over(Window.orderBy(F.col("cohort").desc()))
        )
        .where(F.col("__r") <= max_cohorts)
        .drop("__r")
    )
    return tri.join(F.broadcast(newest), "cohort").where(
        F.col("period_offset") < max_offsets
    )


def _render_funnel(rows: list[dict], title: str | None) -> str:
    """Horizontal funnel: one bar per step (width ∝ users), conversion
    label on each transition."""
    rows = sorted(rows, key=lambda r: r["step_index"])
    n_max = max(float(r["n_users"]) for r in rows) or 1.0
    parts = _header(title)
    x0 = _MARGIN
    plot_w = _W - 2 * _MARGIN
    slot_h = (_H - 2 * _MARGIN) / len(rows)
    bar_h = slot_h * 0.62
    for i, r in enumerate(rows):
        w = max(float(r["n_users"]), 0.0) / n_max * plot_w
        y = _MARGIN + i * slot_h
        x = x0 + (plot_w - w) / 2  # centered: the classic funnel shape
        parts.append(
            f'<rect x="{_fmt(x)}" y="{_fmt(y)}" width="{_fmt(w)}" '
            f'height="{_fmt(bar_h)}" fill="steelblue"/>'
        )
        label = f"{escape(str(r['step']))}: {int(r['n_users'])}"
        if i > 0:
            label += f" ({float(r['conversion']) * 100:.1f}%)"
        parts.append(
            f'<text x="{_W // 2}" y="{_fmt(y + bar_h / 2 + 4)}" '
            f'text-anchor="middle" font-size="11" fill="black">{label}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _render_retention(rows: list[dict], title: str | None) -> str:
    """Retention heatmap: cohorts down, period offsets across, cell
    opacity = retention fraction."""
    cohorts = sorted({str(r["cohort"]) for r in rows})
    offsets = sorted({int(r["period_offset"]) for r in rows})
    by_cell = {(str(r["cohort"]), int(r["period_offset"])): float(r["retention"]) for r in rows}
    parts = _header(title)
    x0, y0 = _MARGIN + 40, _MARGIN
    cw = (_W - x0 - _MARGIN) / max(1, len(offsets))
    ch = (_H - 2 * _MARGIN) / max(1, len(cohorts))
    for ci, cohort in enumerate(cohorts):
        parts.append(
            f'<text x="{x0 - 6}" y="{_fmt(y0 + ci * ch + ch / 2 + 3)}" '
            f'text-anchor="end" font-size="9">{escape(cohort[:10])}</text>'
        )
        for oi, off in enumerate(offsets):
            v = by_cell.get((cohort, off))
            if v is None:
                continue
            parts.append(
                f'<rect x="{_fmt(x0 + oi * cw)}" y="{_fmt(y0 + ci * ch)}" '
                f'width="{_fmt(cw * 0.94)}" height="{_fmt(ch * 0.94)}" '
                f'fill="steelblue" fill-opacity="{_fmt(max(0.06, v))}"/>'
            )
    for oi, off in enumerate(offsets):
        parts.append(
            f'<text x="{_fmt(x0 + oi * cw + cw / 2)}" y="{_fmt(y0 - 6)}" '
            f'text-anchor="middle" font-size="9">+{off}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)
