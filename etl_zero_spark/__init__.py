"""etl_zero_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vxshnu/ETL-Zero (reference surveyed in
SURVEY.md), redesigned Spark-first.

The reference is a single-node pandas+MySQL medallion pipeline
(extract -> map -> transform -> query). This engine re-expresses every
operator in that surface as lazy DataFrame / Spark SQL plans so that
Catalyst + AQE plan the physical execution, and extends the surface
with large-scale training-data-pipeline operators (deduplication,
vector similarity search, text analysis, multimodal columns) and
Structured Streaming ingestion.

Layout:
    session    — SparkSession factory tuned for the 100 TB design point
    catalog    — zone model (raw/silver/gold) + table registry over parquet
    sources/   — scans, incremental (watermark) loads, sinks, JDBC parity
    operators/ — cleaning transforms, aggregation, schema mapper,
                 dedup family, similarity search, text analysis, multimodal
    functions/ — reusable Column expression builders (dates, vectors, fuzzy)
    plans/     — job-spec interpreter (scheduler analog) + SQL query surface
    streaming/ — Structured Streaming ports of the incremental semantics
"""

from etl_zero_spark.session import get_spark

#: The user-facing front door. Heavier surfaces stay behind their
#: modules (importing the package must not drag numpy/pandas/ml in),
#: but the names a notebook reaches for first are importable flat —
#: lazily, via PEP 562 module __getattr__.
_LAZY = {
    "Zone": ("etl_zero_spark.catalog", "Zone"),
    "Warehouse": ("etl_zero_spark.catalog", "Warehouse"),
    "load_table": ("etl_zero_spark.catalog", "load_table"),
    "register_views": ("etl_zero_spark.catalog", "register_views"),
    "SnapshotTable": ("etl_zero_spark.sources.snapshots", "SnapshotTable"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'etl_zero_spark' has no attribute {name!r}")


__all__ = ["get_spark", *_LAZY]
__version__ = "0.1.0"
