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

MySQL dialect parity (document-only in this sandbox — no MySQL server
ships here; the JDBC path itself is integration-tested for real
against embedded Derby in tests/test_jdbc.py). Semantics pinned
against the reference's pandas/SQLAlchemy load (data_extraction.py:
32-43) for when a MySQL URL + Connector/J jar are supplied:

* **DECIMAL(p,s)** arrives as Spark ``DecimalType(p,s)`` — exact,
  unlike the reference's pandas path which coerces to float64 (lossy
  past 2^53). Downstream numeric operators accept DecimalType; cast
  explicitly where float math is intended.
* **Zero dates** (``0000-00-00``): Connector/J rejects them by
  default; append ``?zeroDateTimeBehavior=CONVERT_TO_NULL`` to the
  URL to map them to NULL, matching what the reference's pandas read
  silently yields (NaT). ``EXCEPTION`` (the driver default) fails the
  extraction.
* **TINYINT(1)** maps to BooleanType (``tinyInt1isBit=true`` default);
  add ``tinyInt1isBit=false`` to keep the reference's 0/1 integers.
* **Unsigned BIGINT** widens to DecimalType(20,0) (no unsigned 64-bit
  in the JVM); the reference's pandas path overflows to float.
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
