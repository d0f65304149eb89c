"""SparkSession factory.

The reference has no execution engine of its own — it materializes every
table in driver RAM with pandas and ships SQL strings to MySQL
(reference: ETL_Pipeline_Entire/transformations_code.py:69,
front_end.py:215-225). Here the session IS the engine, so the factory
encodes the design-for-scale decisions once:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  so plans written against sf0.01 survive a 1000-executor 100 TB run.
* Arrow transfers on — every driver<->python boundary is columnar.
* ANSI mode off — Spark 4 defaults it on; the reference's semantics are
  permissive (pandas coerces, MySQL truncates), and our cleaning
  transforms rely on null-on-failure casts (try_* style behavior).
* Session timezone pinned to UTC so timestamp results are stable across
  environments (the test parquet stores naive timestamps).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Runtime (session-settable) confs every entry point applies. Kept as a
#: dict so `queries()` callables can re-apply them to a driver-owned
#: session they did not create.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Write timestamps as INT64 micros, not the deprecated INT96: INT96
    # columns carry NO min/max footer statistics, which silently
    # disables every stats-based pruning tier (parquet row-group skip,
    # layout.file_prune_stats, snapshot manifest data skipping and
    # metadata-only range deletes) for time columns — the columns
    # retention passes filter on most.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Compatibility shim: SOME events fixtures have shipped TIMESTAMP(NANOS)
    # parquet, which Spark 4 refuses by default; with this on they read as
    # long and catalog.load_table normalizes on the OBSERVED dtype (current
    # fixtures are timestamp[us] → TIMESTAMP_NTZ and never hit this path).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Used by the driver-contract entry points, which receive a session
    they did not build.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable in this deployment; builder path sets it
    return spark


def get_spark(
    app_name: str = "etl-zero-spark",
    master: str = "local[*]",
    shuffle_partitions: int = 32,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    ``shuffle_partitions`` defaults to 32 to match the local[32] test
    harness; on a real cluster set it ~2-3x total cores (or leave AQE's
    coalescing to shrink an intentionally high value).
    """
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 128 MiB split targets: good parquet scan granularity at any scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # local[N] runs every executor thread inside the driver JVM — size
        # it for N concurrent tasks or later queries in a session pay GC.
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    return apply_runtime_confs(spark)
