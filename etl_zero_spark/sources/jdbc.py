"""JDBC source/sink parity (S1/S5/S6 over a database).

The reference's only at-rest store is MySQL (data_extraction.py:13-26).
The engine's canonical store is parquet, but the same operators work
over JDBC when a driver jar + URL are supplied. Kept thin and
import-safe: nothing here touches a database until called.

Scale notes baked into the API: reads are range-partitioned
(numPartitions/partitionColumn/lowerBound/upperBound) so a 100 TB-ish
extraction fans out across executors instead of the reference's single
driver connection pulling every row (data_extraction.py:46), and
predicates land in the remote query via Spark's JDBC pushdown rather
than string-formatted SQL (data_extraction.py:95-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S1 over JDBC. With a partition column, Spark issues
    ``num_partitions`` parallel range queries."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """S5/S6 over JDBC. ``batchsize`` replaces the reference's 1,000-row
    driver-side chunking (data_extraction.py:51) with per-executor
    batched inserts."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
