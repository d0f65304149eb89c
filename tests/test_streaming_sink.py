"""Idempotent exactly-once streaming sink: replay no-ops, crashed
partial writes invisible until committed, checkpoint restart processes
only new data."""

import os

from pyspark.sql import functions as F

from etl_zero_spark.catalog import Zone, load_table
from etl_zero_spark.streaming.sink import IdempotentZoneSink

SF = "/root/testdata/sf0.001"


def _run_stream(spark, src_dir, schema, sink, checkpoint):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sink_exactly_once_and_restart(spark, tmp_path):
    ev = load_table(spark, SF, "events").limit(3000)
    total = ev.count()

    # source directory of 3 files -> 3 micro-batches
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    zone = Zone(str(tmp_path), "raw")
    sink = IdempotentZoneSink(zone, "events_stream")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, src, schema, sink, ckpt)

    assert len(sink.committed_ids()) == 3
    got = sink.read_committed(spark)
    assert got.count() == total

    # 1) replaying a committed batch id is a no-op
    sink(ev.limit(50), sink.committed_ids()[0])
    assert sink.read_committed(spark).count() == total

    # 2) a crashed partial write (data, no ledger entry) is invisible...
    partial = ev.limit(10)
    partial.write.mode("overwrite").parquet(os.path.join(sink.table_dir, "_batch=99"))
    assert sink.read_committed(spark).count() == total
    # ...and the replay of that batch commits it exactly once, replacing
    # the partial output
    sink(ev.limit(40), 99)
    assert sink.read_committed(spark).count() == total + 40

    # 3) restart from the same checkpoint with one NEW source file:
    # only the new file becomes a batch; nothing is double-written
    extra = load_table(spark, SF, "events").orderBy(F.desc("event_id")).limit(500)
    extra.coalesce(1).write.mode("append").parquet(src)
    before_ids = set(sink.committed_ids())
    _run_stream(spark, src, schema, sink, ckpt)
    new_ids = set(sink.committed_ids()) - before_ids
    assert len(new_ids) == 1
    assert sink.read_committed(spark).count() == total + 40 + 500


def test_finalize_materializes_plain_table(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").limit(100)
    zone = Zone(str(tmp_path), "raw")
    sink = IdempotentZoneSink(zone, "li_stream")
    sink(li, 0)
    sink(li, 1)
    sink.finalize(spark, "li_final")
    final = zone.read(spark, "li_final")
    assert final.count() == 200
