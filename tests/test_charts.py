"""Visualization layer (plans/charts.py): chart-data prep parity with
the reference's pandas semantics (front_end.py:726-824) and SVG
renderer structure. Prep runs distributed; rendering is driver-side
over bounded rows."""

import xml.etree.ElementTree as ET

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.plans import charts
from tests.conftest import SF_SMOKE

SVG_NS = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_SMOKE, "lineitem")


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMOKE, "orders")


# ---------------------------------------------------------------------------
# prep parity
# ---------------------------------------------------------------------------


def test_histogram_matches_pandas_value_counts(spark, lineitem):
    """The reference histogram is value_counts(bins=N) (front_end.py:
    806) — right-closed pd.cut bins. Bin populations must match pandas
    exactly on the fixture."""
    for col, bins in [("l_quantity", 20), ("l_extendedprice", 7)]:
        got = {
            r.bin: r["count"]
            for r in charts.histogram_data(lineitem, col, bins=bins).collect()
        }
        series = lineitem.select(col).toPandas()[col].dropna()
        want_counts = series.value_counts(bins=bins).sort_index()
        want = {
            i + 1: int(c) for i, c in enumerate(want_counts.values)
        }
        assert got == want, f"{col}/{bins}: {got} != {want}"


def test_histogram_keeps_empty_bins(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (10.0,)], "v double"
    )
    rows = charts.histogram_data(df, "v", bins=5).collect()
    assert [r.bin for r in rows] == [1, 2, 3, 4, 5]
    assert [r["count"] for r in rows] == [2, 0, 0, 0, 1]
    assert rows[0].lo == 0.0 and rows[-1].hi == 10.0


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([(7.0,)] * 5, "v double")
    rows = charts.histogram_data(df, "v", bins=3).collect()
    assert sum(r["count"] for r in rows) == 5
    assert rows[0]["count"] == 5  # documented deviation: bin 1, not centered


def test_pie_matches_pandas_groupby_sum(spark, orders):
    """Reference pie prep: groupby(category)[value].sum()
    (front_end.py:819)."""
    got = {
        r.key: r.value
        for r in charts.pie_data(orders, "o_orderstatus", "o_totalprice").collect()
    }
    pdf = orders.select("o_orderstatus", "o_totalprice").toPandas()
    want = pdf.groupby("o_orderstatus")["o_totalprice"].sum()
    assert set(got) == set(want.index)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_pie_folds_tail_into_other(spark, orders):
    rows = charts.pie_data(
        orders, "o_orderpriority", "o_totalprice", max_slices=3
    ).collect()
    assert len(rows) == 3
    assert rows[0].value >= rows[1].value  # top slices sorted desc
    keys = {r.key for r in rows}
    assert "(other)" in keys
    total = sum(r.value for r in rows)
    want_total = orders.agg(F.sum("o_totalprice")).first()[0]
    assert total == pytest.approx(want_total, rel=1e-9)  # nothing vanishes


def test_bar_data_topn_and_values(spark, orders):
    rows = charts.bar_data(
        orders, "o_orderpriority", "o_totalprice", max_categories=2
    ).collect()
    assert len(rows) == 2
    want = {
        r.o_orderpriority: r.s
        for r in orders.groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    }
    top2 = sorted(want.values(), reverse=True)[:2]
    assert sorted((r.value for r in rows), reverse=True) == pytest.approx(top2)


def test_line_data_bounded_and_ordered(spark, lineitem):
    rows = charts.line_data(
        lineitem, "l_shipdate", "l_extendedprice", max_points=50
    ).collect()
    assert 0 < len(rows) <= 50
    keys = [r.key for r in rows]
    assert keys == sorted(keys)
    lo = lineitem.agg(F.min("l_extendedprice")).first()[0]
    hi = lineitem.agg(F.max("l_extendedprice")).first()[0]
    assert all(lo <= r.value <= hi for r in rows)  # bucket means stay in range


def test_scatter_cap_is_deterministic(spark, lineitem):
    a = charts.scatter_data(lineitem, "l_quantity", "l_extendedprice", max_points=100)
    b = charts.scatter_data(
        lineitem.repartition(7), "l_quantity", "l_extendedprice", max_points=100
    )
    sa = {(r.x, r.y) for r in a.collect()}
    sb = {(r.x, r.y) for r in b.collect()}
    assert len(sa) == 100
    assert sa == sb  # partitioning-independent (hash order, not .sample)


def test_prep_plans_have_no_scale_killers(spark, lineitem, orders):
    """Chart prep runs on the full table — same gate as declared
    queries: no cartesian products (the 1-row stats broadcasts plan as
    BroadcastNestedLoop, which is allowed), no Python UDFs at all."""
    plans = [
        charts.bar_data(orders, "o_orderpriority", "o_totalprice"),
        charts.line_data(lineitem, "l_shipdate", "l_extendedprice"),
        charts.scatter_data(lineitem, "l_quantity", "l_extendedprice"),
        charts.histogram_data(lineitem, "l_quantity"),
        charts.pie_data(orders, "o_orderstatus", "o_totalprice"),
    ]
    for df in plans:
        s = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in s, s
        assert "EvalPython" not in s, s


# ---------------------------------------------------------------------------
# SVG rendering
# ---------------------------------------------------------------------------


def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)  # raises on malformed XML


def test_render_bar_svg_structure():
    rows = [{"key": "a<b&c", "value": 3.0}, {"key": "y", "value": 1.5}]
    root = _parse(charts.render_svg("bar", rows, title="T<1>"))
    rects = root.findall(f"{SVG_NS}rect")
    assert len(rects) == 1 + len(rows)  # background + one per bar
    bars = rects[1:]
    heights = [float(r.get("height")) for r in bars]
    assert heights[0] == pytest.approx(2 * heights[1], abs=0.1)  # 3.0 vs 1.5
    titles = [t.text for t in root.iter(f"{SVG_NS}title")]
    assert any("a<b&c" in t for t in titles)  # escaped, survives round-trip


def test_render_histogram_svg():
    rows = [
        {"bin": 1, "lo": 0.0, "hi": 1.0, "count": 4},
        {"bin": 2, "lo": 1.0, "hi": 2.0, "count": 0},
        {"bin": 3, "lo": 2.0, "hi": 3.0, "count": 2},
    ]
    root = _parse(charts.render_svg("histogram", rows))
    bars = root.findall(f"{SVG_NS}rect")[1:]
    assert len(bars) == 3
    assert float(bars[1].get("height")) == 0.0  # empty bin renders 0-height


def test_render_line_and_scatter_svg():
    line = charts.render_svg(
        "line", [{"key": 1.0, "value": 2.0}, {"key": 2.0, "value": 4.0}]
    )
    root = _parse(line)
    polys = root.findall(f"{SVG_NS}polyline")
    assert len(polys) == 1
    assert len(polys[0].get("points").split()) == 2
    scat = charts.render_svg("scatter", [{"x": 0.0, "y": 1.0}, {"x": 2.0, "y": 3.0}])
    assert len(_parse(scat).findall(f"{SVG_NS}circle")) == 2


def test_render_pie_svg_wedges_sum_to_circle():
    rows = [{"key": "a", "value": 1.0}, {"key": "b", "value": 3.0}]
    root = _parse(charts.render_svg("pie", rows))
    paths = root.findall(f"{SVG_NS}path")
    assert len(paths) == 2
    # 3/4 wedge must set the large-arc flag, the 1/4 wedge must not
    flags = sorted(p.get("d").split()[-5] for p in paths)
    assert flags == ["0", "1"]
    single = _parse(charts.render_svg("pie", [{"key": "a", "value": 2.0}]))
    assert len(single.findall(f"{SVG_NS}circle")) == 1  # full-circle case


def test_render_rejects_bad_input():
    with pytest.raises(ValueError, match="empty"):
        charts.render_svg("bar", [])
    with pytest.raises(ValueError, match="unknown kind"):
        charts.render_svg("sankey", [{"key": "a", "value": 1.0}])
    with pytest.raises(ValueError, match="bound"):
        charts.render_svg(
            "bar", [{"key": str(i), "value": 1.0} for i in range(10_001)]
        )


def test_chart_svg_end_to_end(spark, orders):
    """The reference page's full flow: pick table, pick chart type,
    render — here as one call, Spark prep + SVG out."""
    for kind, x, y in [
        ("bar", "o_orderpriority", "o_totalprice"),
        ("pie", "o_orderstatus", "o_totalprice"),
        ("histogram", "o_totalprice", None),
        ("line", "o_orderdate", "o_totalprice"),
        ("scatter", "o_custkey", "o_totalprice"),
    ]:
        svg = charts.chart_svg(orders, kind, x=x, y=y, title=f"{kind} demo")
        root = _parse(svg)
        assert root.tag == f"{SVG_NS}svg"
        assert len(svg) < 2_000_000


# --- funnel + retention charts (R4) ------------------------------------------


def test_funnel_chart_end_to_end(spark, sf_dir):
    from etl_zero_spark.plans.charts import funnel_data, render_svg

    ev = load_table(spark, sf_dir, "events")
    rows = [r.asDict() for r in funnel_data(ev, ["view", "click", "purchase"]).collect()]
    assert len(rows) == 3
    svg = render_svg("funnel", rows, title="conversion")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "view" in svg and "%" in svg
    # deterministic
    assert svg == render_svg("funnel", rows, title="conversion")


def test_retention_chart_bounded_and_rendered(spark, sf_dir):
    from etl_zero_spark.plans.charts import render_svg, retention_data

    ev = load_table(spark, sf_dir, "events")
    tri = retention_data(ev, "1 day", max_cohorts=3, max_offsets=5)
    rows = [r.asDict() for r in tri.collect()]
    assert 0 < len(rows) <= 15
    assert tri.select("cohort").distinct().count() <= 3
    svg = render_svg("retention", rows, title="retention")
    assert svg.count("<rect") >= len(rows)  # one cell per row (+bg)
    assert "+0" in svg
