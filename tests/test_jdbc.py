"""JDBC source/sink smoke test (S1/S5/S6 over a database).

No external database ships in this container, but Spark's distribution
bundles the embedded Derby driver (used by the Hive metastore), so the
round-trip is exercised for real: write_jdbc -> Derby in-memory table ->
read_jdbc, plus a range-partitioned parallel read. In-memory Derby is
per-JVM, which is exactly the local[N] test topology (executors share
the driver JVM); against a networked database the same code paths fan
out per-executor.
"""

import glob
import os

import pytest

from etl_zero_spark.sources.jdbc import read_jdbc, write_jdbc

_SPARK_JARS = os.path.join(
    os.path.dirname(pytest.importorskip("pyspark").__file__), "jars"
)
_HAVE_DERBY = bool(glob.glob(os.path.join(_SPARK_JARS, "derby-*.jar")))

pytestmark = pytest.mark.skipif(
    not _HAVE_DERBY,
    reason="no JDBC driver jar in the Spark distribution (SURVEY §2.1: "
    "JDBC paths are API-complete but need a driver to exercise)",
)

_URL = "jdbc:derby:memory:etlzero_jdbc;create=true"
_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_round_trip(spark):
    df = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, score double",
    )
    write_jdbc(df, _URL, "roundtrip", mode="overwrite", properties=_PROPS)
    back = read_jdbc(spark, _URL, "roundtrip", properties=_PROPS)
    assert back.count() == 100
    assert {f.name.lower() for f in back.schema.fields} == {"id", "name", "score"}
    got = {tuple(r) for r in back.select("id", "name", "score").collect()}
    want = {(i, f"name_{i}", float(i) * 1.5) for i in range(100)}
    assert got == want


def test_jdbc_partitioned_read(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "id bigint, bucket bigint"
    )
    write_jdbc(df, _URL, "parts", mode="overwrite", properties=_PROPS)
    back = read_jdbc(
        spark,
        _URL,
        "parts",
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
        properties=_PROPS,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
    assert back.agg({"id": "sum"}).first()[0] == sum(range(200))


def test_jdbc_append_mode(spark):
    df = spark.createDataFrame([(1,), (2,)], "id bigint")
    write_jdbc(df, _URL, "appends", mode="overwrite", properties=_PROPS)
    write_jdbc(df, _URL, "appends", mode="append", properties=_PROPS)
    back = read_jdbc(spark, _URL, "appends", properties=_PROPS)
    assert back.count() == 4
