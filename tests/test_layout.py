"""Storage layout & maintenance: compaction, sorted layout, Z-order
clustering, ORC sink. Pruning claims are verified against the parquet
footers themselves (pyarrow), not argued from the plan."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import Zone, load_table
from etl_zero_spark.operators.layout import (
    compact,
    file_prune_stats,
    table_file_stats,
    write_sorted,
    write_zordered,
)

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


# --------------------------------------------------------------------------
# compaction
# --------------------------------------------------------------------------


def test_compact_binpacks_small_files(spark, tmp_path):
    zone = Zone(str(tmp_path), "silver")
    li = load_table(spark, SF, "lineitem")
    # simulate a streaming sink's droppings: 64 tiny files
    zone.write(li.repartition(64), "lineitem")
    before = table_file_stats(zone.path("lineitem"))
    assert before["n_files"] == 64

    res = compact(spark, zone, "lineitem", target_file_bytes=128 << 20)
    assert res.compacted
    assert res.files_before == 64
    assert res.files_after < 8  # sf0.001 lineitem is far under one target file
    assert res.rows == li.count()

    # content identical (multiset equality both directions)
    back = zone.read(spark, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    assert _sorted_rows(back, key) == _sorted_rows(li, key)


def test_compact_noop_when_already_packed(spark, tmp_path):
    zone = Zone(str(tmp_path), "silver")
    li = load_table(spark, SF, "lineitem")
    zone.write(li.coalesce(1), "lineitem")
    res = compact(spark, zone, "lineitem", target_file_bytes=128 << 20)
    assert not res.compacted
    assert res.files_before == res.files_after == 1


# --------------------------------------------------------------------------
# sorted (range) layout
# --------------------------------------------------------------------------


def test_write_sorted_prunes_on_sort_key(spark, tmp_path):
    zone = Zone(str(tmp_path), "silver")
    li = load_table(spark, SF, "lineitem")

    # baseline: hash-shuffled layout -> every file spans the full date range
    zone.write(li.repartition(16), "li_hash")
    # range layout on l_shipdate
    write_sorted(zone, li, "li_sorted", "l_shipdate", n_files=16)

    back = zone.read(spark, "li_sorted")
    key = ["l_orderkey", "l_linenumber"]
    assert _sorted_rows(back, key) == _sorted_rows(li, key)

    lo, hi = datetime.date(1996, 1, 1), datetime.date(1996, 3, 31)
    pruned = file_prune_stats(zone.path("li_sorted"), "l_shipdate", lo, hi)
    unpruned = file_prune_stats(zone.path("li_hash"), "l_shipdate", lo, hi)
    # ~7 years of dates; a one-quarter predicate keeps a sliver of the
    # range layout and all of the hash layout
    assert unpruned["file_keep_fraction"] == 1.0
    assert pruned["file_keep_fraction"] <= 0.25


# --------------------------------------------------------------------------
# Z-order layout
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def xy_df(spark):
    # two independent uniform columns derived deterministically from id
    return (
        spark.range(200_000)
        .withColumn("x", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).cast("int"))
        .withColumn("y", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1024)).cast("int"))
    )


def test_zorder_prunes_on_both_columns(spark, tmp_path, xy_df):
    zone = Zone(str(tmp_path), "silver")
    write_sorted(zone, xy_df, "xy_linear", "x", n_files=16)
    write_zordered(zone, xy_df, "xy_z", ["x", "y"], bits=4, n_files=16)

    # content identical
    assert _sorted_rows(zone.read(spark, "xy_z"), ["id"]) == _sorted_rows(
        xy_df, ["id"]
    )

    # a 1/16-of-domain range on each column
    qx = (0, 63)
    qy = (0, 63)
    lin_x = file_prune_stats(zone.path("xy_linear"), "x", *qx)
    lin_y = file_prune_stats(zone.path("xy_linear"), "y", *qy)
    z_x = file_prune_stats(zone.path("xy_z"), "x", *qx)
    z_y = file_prune_stats(zone.path("xy_z"), "y", *qy)

    # linear layout: sharp on the sort key, useless on the other column
    assert lin_x["file_keep_fraction"] <= 0.25
    assert lin_y["file_keep_fraction"] >= 0.9
    # Z-order: prunes on BOTH columns (16 files / 2 cols -> ~4/16 kept;
    # allow slack for quantile-sketch boundary error)
    assert z_x["file_keep_fraction"] <= 0.5
    assert z_y["file_keep_fraction"] <= 0.5


def test_zorder_single_column_degenerates_to_sort(spark, tmp_path, xy_df):
    # k=1 Morton code == rank order: behaves like write_sorted
    zone = Zone(str(tmp_path), "silver")
    write_zordered(zone, xy_df, "x_only", ["x"], bits=4, n_files=16)
    st = file_prune_stats(zone.path("x_only"), "x", 0, 63)
    assert st["file_keep_fraction"] <= 0.25


def test_zorder_null_and_skew_safe(spark, tmp_path):
    # nulls bucket low; a hot key doesn't break the write
    zone = Zone(str(tmp_path), "silver")
    df = (
        spark.range(10_000)
        .withColumn("x", F.when(F.col("id") % 7 == 0, None).otherwise(F.lit(5)))
        .withColumn("y", F.pmod(F.xxhash64("id"), F.lit(100)).cast("int"))
    )
    write_zordered(zone, df, "skewed", ["x", "y"], bits=3, n_files=4)
    back = zone.read(spark, "skewed")
    assert back.count() == 10_000
    assert back.where(F.col("x").isNull()).count() == df.where(F.col("x").isNull()).count()


# --------------------------------------------------------------------------
# ORC sink
# --------------------------------------------------------------------------


def test_orc_roundtrip(spark, tmp_path):
    zone = Zone(str(tmp_path), "golden")
    li = load_table(spark, SF, "lineitem")
    zone.write_orc(li, "lineitem")
    back = zone.read_orc(spark, "lineitem")
    assert back.schema == li.schema
    key = ["l_orderkey", "l_linenumber"]
    assert _sorted_rows(back, key) == _sorted_rows(li, key)
