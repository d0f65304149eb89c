"""Idempotent (effectively exactly-once) streaming sink into a Zone.

Structured Streaming's contract is at-least-once per micro-batch: after
a failure the SAME batch id is replayed against the sink. End-to-end
exactly-once therefore lives in the sink — it must make a replayed
batch a no-op. The file sink Spark ships does this with its own commit
log, but writes a format readers must treat specially; this sink does
it with two primitives any filesystem offers:

* each micro-batch writes to its own subdirectory
  ``<table>/_batch=<id>/`` with ``mode("overwrite")`` — a replay of a
  half-written batch OVERWRITES the partial output instead of
  appending duplicates;
* a commit ledger ``<table>__ledger/<id>.json`` is written (tmp +
  atomic rename) only AFTER the batch's data write completes; a batch
  id already in the ledger short-circuits to a no-op.

Readers go through ``read_committed``, which lists the ledger and reads
only committed batch directories — an uncommitted (crashed) batch is
invisible until its replay commits it. The ledger is O(batches) tiny
JSON files of driver-side metadata; the data path is the ordinary
executor-parallel parquet writer.

This is the same commit-protocol shape a table format (Delta/Iceberg)
implements with a metadata log; on such a sink the ledger becomes the
format's atomic commit and this class collapses to ``MERGE``/append.
Pair a long-running instance with ``operators.layout.compact`` on a
FINALIZED copy (``finalize``) — compacting the live batch dirs would
break replay accounting.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Zone


@dataclass
class IdempotentZoneSink:
    """``foreachBatch`` target writing micro-batches into
    ``zone/<table>/_batch=<id>`` with a commit ledger.

    Use: ``stream.writeStream.foreachBatch(sink).start()`` — the
    instance is the callback. Safe against batch replays (same id) and
    against partial writes from a crashed attempt.
    """

    zone: Zone
    table: str

    @property
    def table_dir(self) -> str:
        return self.zone.path(self.table)

    @property
    def ledger_dir(self) -> str:
        return self.zone.path(self.table) + "__ledger"

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.table_dir, f"_batch={batch_id}")

    def _ledger_entry(self, batch_id: int) -> str:
        return os.path.join(self.ledger_dir, f"{batch_id}.json")

    def committed_ids(self) -> list[int]:
        if not os.path.isdir(self.ledger_dir):
            return []
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.ledger_dir)
            if f.endswith(".json")
        )

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._ledger_entry(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            # replay of an already-committed batch: exactly-once no-op
            return
        target = self._batch_dir(batch_id)
        # overwrite, not append: a second attempt at the same batch id
        # replaces whatever the crashed first attempt left behind
        batch_df.write.mode("overwrite").parquet(target)
        os.makedirs(self.ledger_dir, exist_ok=True)
        entry = {
            "batch_id": batch_id,
            "committed_at": time.time(),
            "path": target,
        }
        tmp = self._ledger_entry(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.rename(tmp, self._ledger_entry(batch_id))  # atomic commit point

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """All rows from COMMITTED batches only. A crashed batch's
        partial directory (data present, no ledger entry) is invisible
        until its replay commits."""
        ids = self.committed_ids()
        if not ids:
            raise FileNotFoundError(f"no committed batches under {self.table_dir}")
        return spark.read.parquet(*[self._batch_dir(i) for i in ids])

    def finalize(self, spark: SparkSession, out_table: str | None = None) -> str:
        """Materialize the committed batches as a plain Zone table
        (e.g. to compact or re-layout it without touching the live
        sink's replay accounting). Returns the written path."""
        out = out_table or f"{self.table}_final"
        self.zone.write(self.read_committed(spark), out)
        return self.zone.path(out)
