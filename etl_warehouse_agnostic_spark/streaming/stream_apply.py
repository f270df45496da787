"""Structured-Streaming front-end for the CDC engine.

The reference's extraction loop is pull-based micro-batching
(watermark → fetch delta → append → advance watermark,
extractors/repsly/extractor.py:580-621,1406-1475). The batch engine
(CdcEngine.run) reproduces that directly; this module is the
push-based variant: ``readStream`` over the change-log directory →
``foreachBatch`` → the same exactly-once epoch apply.

Design notes (scale):
- ``foreachBatch`` is the idiomatic Spark pattern for MERGE-style
  sinks (Structured Streaming has no native upsert sink); each
  micro-batch becomes one engine epoch, so exactly-once holds even
  though foreachBatch itself is at-least-once: a replayed batch id is
  detected via the epoch-id idempotence check and skipped.
- ``trigger(availableNow=True)`` drains the backlog in bounded
  batches then stops — the streaming analog of the batch tail loop;
  drop it for a continuous tail.
- The epoch id is ``batch_id + epoch_base + 1`` — monotone across
  restarts because Spark's own streaming checkpoint persists batch
  ids; our manifest store remains the source of truth for offsets.
- LWW ordering is (lsn, ts) within the batch, same as batch mode; no
  event-time watermark is needed because key-dedup + MERGE make late
  or re-delivered events idempotent (reference P6 lookback semantics).
- **Ordering contract**: micro-batches must arrive in LSN order, the
  same contract the batch tail loop provides and that binlog/WAL
  shippers (Kafka per-partition, Debezium) guarantee. For file
  streams Spark orders discovery by file mtime — an appended change
  log satisfies this naturally; bulk-written test fixtures must stamp
  mtimes (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_warehouse_agnostic_spark.engine import CdcEngine


class StreamingCdcApply:
    def __init__(
        self,
        engine: CdcEngine,
        changes_path: str,
        checkpoint_location: str,
        max_files_per_trigger: int | None = None,
        epoch_base: int | None = None,
    ):
        self.engine = engine
        self.changes_path = changes_path
        self.checkpoint_location = checkpoint_location
        self.max_files_per_trigger = max_files_per_trigger
        # Offset epoch ids past whatever the batch path already applied.
        self.epoch_base = (
            epoch_base if epoch_base is not None
            else (engine.checkpoints.last_epoch() or 0)
        )

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.engine.apply_epoch(batch_df, epoch=self.epoch_base + batch_id + 1)

    def start(self, available_now: bool = True, schema=None):
        reader = self.engine.spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        else:
            # File streams need a fixed schema; default to the static dir's.
            reader = reader.schema(
                self.engine.spark.read.parquet(self.changes_path).schema
            )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.changes_path)

        writer = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_location)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self) -> None:
        """Drain the current backlog and return (availableNow)."""
        q = self.start(available_now=True)
        q.awaitTermination()
