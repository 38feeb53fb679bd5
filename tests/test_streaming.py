"""Structured-Streaming front-end tests: drain a file-source event stream
through foreachBatch into the engine; verify final-state parity, restart
idempotence, and incremental arrival."""

import os

from emailcdc import schemas
from emailcdc.engine import CdcEngine
from emailcdc.fixtures import expected_final_state, make_change_events
from emailcdc.sink import SnapshotParquetSink
from emailcdc.streaming import run_stream, stream_events

EVENTS = make_change_events(24)
EXPECTED = expected_final_state(EVENTS)


def _write_chunk(spark, events, path):
    spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS) \
        .coalesce(1).write.mode("append").parquet(path)


def _snap_keys(engine):
    return {(r["repo"], r["path"]) for r in engine.table("snapshot").collect()}


class TestStreaming:
    def test_drain_and_parity(self, spark, tmp_path):
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        sink_dir = str(tmp_path / "sink")
        half = len(EVENTS) // 2
        _write_chunk(spark, EVENTS[:half], src)
        _write_chunk(spark, EVENTS[half:], src)
        engine = CdcEngine(spark, SnapshotParquetSink(spark, sink_dir, n_buckets=8))
        q = run_stream(engine, stream_events(spark, src, max_files_per_trigger=1),
                       ckpt)
        q.awaitTermination(180)
        assert _snap_keys(engine) == set(EXPECTED)
        manifest = engine.sink.read_manifest()
        assert manifest.batch_id >= 2  # maxFilesPerTrigger=1 → ≥2 epochs

    def test_restart_is_idempotent(self, spark, tmp_path):
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        sink_dir = str(tmp_path / "sink")
        _write_chunk(spark, EVENTS, src)
        engine = CdcEngine(spark, SnapshotParquetSink(spark, sink_dir, n_buckets=8))
        run_stream(engine, stream_events(spark, src), ckpt).awaitTermination(180)
        before = _snap_keys(engine)
        msg_before = engine.table("messages").count()
        # restart with the same checkpoint: no new data → no new commits
        run_stream(engine, stream_events(spark, src), ckpt).awaitTermination(180)
        assert _snap_keys(engine) == before
        assert engine.table("messages").count() == msg_before

    def test_incremental_arrival(self, spark, tmp_path):
        src = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        sink_dir = str(tmp_path / "sink")
        half = len(EVENTS) // 2
        _write_chunk(spark, EVENTS[:half], src)
        engine = CdcEngine(spark, SnapshotParquetSink(spark, sink_dir, n_buckets=8))
        run_stream(engine, stream_events(spark, src), ckpt).awaitTermination(180)
        partial = expected_final_state(EVENTS[:half])
        assert _snap_keys(engine) == set(partial)
        # second tranche arrives; a new drain picks up only the delta
        _write_chunk(spark, EVENTS[half:], src)
        run_stream(engine, stream_events(spark, src), ckpt).awaitTermination(180)
        assert _snap_keys(engine) == set(EXPECTED)
