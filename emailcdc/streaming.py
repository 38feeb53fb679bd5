"""Structured-Streaming front end: tail a change-event source with
``readStream`` and drive the CDC engine through ``foreachBatch``.

The binlog/WAL analog (SURVEY.md §2.1 S1/S2): NiFi's FlowFile queue
becomes a streaming file source over the events directory (a Kafka source
drops in by swapping ``readStream`` options — the ``foreachBatch`` body is
source-agnostic).

Exactly-once composition: Spark's streaming checkpoint gives *replayable*
micro-batches with stable ``epoch_id``s; the engine's manifest protocol
(snapshot_id == batch_id, skip if ≤ CURRENT) makes each epoch idempotent.
Batch id = epoch_id + 1, so a restart that re-delivers the last epoch hits
the already-committed manifest and is skipped — the combination is
end-to-end exactly-once regardless of which side crashed
(``maxFilesPerTrigger`` is the ``FLOWFILE_COUNT`` micro-batching analog,
ExtractEMLFile.java:34-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .engine import CdcEngine


def stream_events(spark: SparkSession, source_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a parquet events directory (CHANGE_EVENTS schema)."""
    reader = spark.readStream.schema(schemas.CHANGE_EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def run_stream(engine: CdcEngine, events: DataFrame, checkpoint_dir: str,
               *, available_now: bool = True,
               processing_time: str | None = None):
    """Drive the engine from a streaming DataFrame.

    ``available_now=True`` (default) processes everything currently in the
    source then stops — the testable drain mode; pass
    ``processing_time='10 seconds'`` instead for a long-running tail.
    Returns the StreamingQuery (caller awaits/stops it).
    """

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        engine.apply_batch(batch_df, batch_id=int(epoch_id) + 1)

    writer = events.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
