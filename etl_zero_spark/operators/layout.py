"""Storage layout & table maintenance: compaction, sorted layout,
Z-order clustering, and footer-stats introspection.

The reference never manages at-rest layout — MySQL owns its pages and
every write is a driver-side ``to_sql`` (reference:
ETL_Pipeline_Entire/data_extraction.py:40-51). At 100 TB, layout IS the
query optimizer's raw material: parquet footers carry per-file and
per-row-group min/max statistics, and the scan skips any unit whose
[min, max] range cannot satisfy the pushed predicate. These operators
arrange data so that skipping actually happens:

* ``compact`` — bin-pack the small files a streaming sink or an
  over-partitioned shuffle leaves behind into ~target-size files.
  Small files are the classic large-table killer: a 100 TB table in
  1 MB files is 100M scan tasks of pure open/seek overhead.
* ``write_sorted`` — global range layout (repartitionByRange +
  sortWithinPartitions): every output file covers a disjoint key
  range, so a range predicate on the sort key reads only the files it
  intersects.
* ``write_zordered`` — multi-dimensional clustering: per-column
  quantile buckets, bit-interleaved into a Z-value, range-laid-out on
  that Z-value. Queries on ANY prefix-free subset of the clustered
  columns prune (a linear sort only prunes on its leading column).
* ``file_prune_stats`` — reads parquet footers (pyarrow, no Spark job)
  and reports how many files / row groups a given range predicate
  would keep: the measurement that says whether a re-layout paid off.

All data movement is executor-side; the driver touches only file
metadata (listings + footers), never rows.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Zone


# --------------------------------------------------------------------------
# footer / file statistics (driver-side metadata, no Spark job)
# --------------------------------------------------------------------------


def _data_files(path: str) -> list[str]:
    """All parquet part files under ``path`` (recursive: partitioned
    layouts nest ``col=value`` dirs), excluding commit markers."""
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def table_file_stats(path: str) -> dict:
    """File-count / byte-size profile of a parquet table directory.

    The input to the compaction decision. Driver-side ``os.walk`` only —
    the same listing the Spark driver itself performs at planning time,
    O(files) metadata, zero data read.
    """
    files = _data_files(path)
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def _table_num_rows(path: str) -> int:
    """Total rows from parquet footers (pyarrow, no Spark job)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in _data_files(path))


def file_prune_stats(path: str, column: str, lo, hi) -> dict:
    """How much of the table a scan with ``column BETWEEN lo AND hi``
    must read, judged purely from parquet footer min/max statistics.

    Returns kept/total counts at both file and row-group granularity —
    exactly the skipping the parquet reader performs for a pushed
    predicate. Use it to verify a layout change (sorted/Z-ordered)
    actually turned a full scan into a pruned one before shipping the
    layout to a 100 TB table.
    """
    import datetime

    import pyarrow.parquet as pq

    def _norm(v):
        # pyarrow may surface date-typed stats as datetime.datetime;
        # compare everything date-like at date granularity when the
        # caller passed dates
        if isinstance(v, datetime.datetime) and isinstance(lo, datetime.date) and not isinstance(lo, datetime.datetime):
            return v.date()
        return v

    files = _data_files(path)
    files_kept = 0
    rg_total = 0
    rg_kept = 0
    for fpath in files:
        md = pq.ParquetFile(fpath).metadata
        col_idx = None
        for i in range(md.num_columns):
            if md.schema.column(i).name == column:
                col_idx = i
                break
        if col_idx is None:
            raise KeyError(f"column {column!r} not in parquet schema at {fpath}")
        file_overlaps = False
        for g in range(md.num_row_groups):
            rg_total += 1
            stats = md.row_group(g).column(col_idx).statistics
            if stats is None or not stats.has_min_max:
                rg_kept += 1  # no stats -> reader must read it
                file_overlaps = True
                continue
            if not (_norm(stats.max) < lo or _norm(stats.min) > hi):
                rg_kept += 1
                file_overlaps = True
        if file_overlaps:
            files_kept += 1
    return {
        "files_total": len(files),
        "files_kept": files_kept,
        "rowgroups_total": rg_total,
        "rowgroups_kept": rg_kept,
        "file_keep_fraction": files_kept / len(files) if files else 0.0,
        "rowgroup_keep_fraction": rg_kept / rg_total if rg_total else 0.0,
    }


# --------------------------------------------------------------------------
# compaction
# --------------------------------------------------------------------------


@dataclass
class CompactResult:
    compacted: bool
    files_before: int
    files_after: int
    total_bytes: int
    rows: int


def compact(
    spark: SparkSession,
    zone: Zone,
    table: str,
    target_file_bytes: int = 128 << 20,
) -> CompactResult:
    """Bin-pack a parquet table's small files into ~``target_file_bytes``
    files. No-op when the table already has few enough files.

    The rewrite is a ``coalesce`` (a scan-side merge, NO shuffle — each
    output task reads several input files sequentially), so compacting
    a 100 TB table moves each byte exactly twice (read + write) with no
    exchange in between. Row order within files may change; parquet
    tables carry no ordering contract (use ``write_sorted`` /
    ``write_zordered`` when layout order matters — and re-run those,
    not ``compact``, to maintain such tables).

    Swap protocol: write to a sibling temp dir, verify the footer row
    count matches the source exactly (pyarrow, no job), then rename
    into place. On a local/HDFS filesystem the rename is atomic; on an
    object store, front this with a metadata-pointer commit (the same
    place a table format like Iceberg/Delta would hook in).
    """
    path = zone.path(table)
    before = table_file_stats(path)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    if before["n_files"] <= n_out:
        return CompactResult(
            compacted=False,
            files_before=before["n_files"],
            files_after=before["n_files"],
            total_bytes=before["total_bytes"],
            rows=_table_num_rows(path),
        )

    src_rows = _table_num_rows(path)
    tmp = path + "__compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    new_rows = _table_num_rows(tmp)
    if new_rows != src_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch on {path}: {src_rows} -> {new_rows}; "
            "source left untouched"
        )
    old = path + "__compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = table_file_stats(path)
    return CompactResult(
        compacted=True,
        files_before=before["n_files"],
        files_after=after["n_files"],
        total_bytes=after["total_bytes"],
        rows=new_rows,
    )


# --------------------------------------------------------------------------
# sorted (range) layout
# --------------------------------------------------------------------------


def write_sorted(
    zone: Zone,
    df: DataFrame,
    table: str,
    sort_cols: list[str] | str,
    n_files: int | None = None,
) -> str:
    """Write ``df`` in global range layout on ``sort_cols``: range-
    partition rows across ``n_files`` output files and sort within each.

    Every file then covers a disjoint ``sort_cols`` range and its footer
    min/max is tight, so a range predicate on the leading sort column
    reads only the files it intersects (verify with
    ``file_prune_stats``). This is the layout for the one column most
    queries filter on — time, tenant, id range. For pruning on SEVERAL
    columns at once use ``write_zordered``.

    ``repartitionByRange`` samples the key distribution, so skewed keys
    still land in balanced files (unlike hash layouts, where a hot key
    overloads one file).
    """
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    path = zone.path(table)
    out.write.mode("overwrite").parquet(path)
    return path


# --------------------------------------------------------------------------
# Z-order layout
# --------------------------------------------------------------------------


def _quantile_bounds(
    df: DataFrame, cols: list[str], bits: int
) -> dict[str, list[float]]:
    """Per-column interior quantile boundaries (2^bits - 1 values).

    One aggregation pass with ``percentile_approx`` — a mergeable
    sketch with fixed state, so the pass costs one map-side-combined
    shuffle of sketch blobs regardless of table size. The collected
    boundaries are metadata (cols x 2^bits doubles on the driver).
    """
    n_bounds = (1 << bits) - 1
    fracs = F.array(
        *[F.lit((i + 1) / (1 << bits)) for i in range(n_bounds)]
    )
    row = df.select(
        *[
            F.percentile_approx(F.col(c).cast("double"), fracs, F.lit(10_000)).alias(c)
            for c in cols
        ]
    ).first()
    return {c: [float(v) for v in (row[c] or [])] for c in cols}


def _bucket_expr(col: str, bounds: list[float]) -> Column:
    """Rank bucket of ``col`` = number of boundaries <= value, as a pure
    Column expression (codegen'd; the boundary array is a literal).
    Nulls bucket to 0 (they cluster at the low end of the Z-curve)."""
    arr = F.array(*[F.lit(b) for b in bounds])
    v = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda b: b <= v))


def zorder_key(bounds: dict[str, list[float]], bits: int) -> Column:
    """Bit-interleaved Z-value over the bucketed columns.

    For columns c0..c{k-1} with ``bits``-bit rank buckets b0..b{k-1},
    bit i of bj lands at Z bit ``i*k + j`` — the classic Morton code.
    Quantile (rank) bucketing, not min/max scaling, so skewed value
    distributions still fill the curve evenly.
    """
    cols = list(bounds)
    buckets = [_bucket_expr(c, bounds[c]) for c in cols]
    z: Column = F.lit(0)
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def write_zordered(
    zone: Zone,
    df: DataFrame,
    table: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> str:
    """Write ``df`` clustered on the Z-order curve over ``cols``.

    Two passes over the data (quantile sketch, then the laid-out
    write), one range shuffle. After the write, a range predicate on
    ANY of the clustered columns prunes files: with k columns and the
    top h bits of the curve deciding file boundaries, a point query on
    one column keeps ~2^-floor(h/k) of the files — vs a linear sort,
    which prunes only on its leading column and scans everything for
    the rest. ``bits`` = 8 gives 256 rank buckets per column; raising
    it sharpens pruning until file count, not bucket width, is the
    binding constraint.
    """
    n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bounds = _quantile_bounds(df, cols, bits)
    zcol = "__zorder_key"
    out = (
        df.withColumn(zcol, zorder_key(bounds, bits))
        .repartitionByRange(n, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)  # projection keeps both the partitioning and the order
    )
    path = zone.path(table)
    out.write.mode("overwrite").parquet(path)
    return path
