"""Engine-level schema evolution (mid-replay additive column — north rule)
and the control-table surface."""

from pyspark.sql import functions as F

from emailcdc import schemas
from emailcdc.engine import CdcEngine
from emailcdc.fixtures import expected_final_state, make_change_events
from emailcdc.sink import SnapshotParquetSink

EVENTS = make_change_events(24)
EXPECTED = expected_final_state(EVENTS)


class _EngineV2(CdcEngine):
    """Simulates an engine upgrade that enriches the snapshot schema with a
    new column mid-stream (additive evolution against the sink schema)."""

    def apply_batch(self, batch, batch_id, offset_lo=None, offset_hi=None):
        # patch the snapshot rows AFTER the stock pipeline builds them by
        # intercepting the sink commit
        orig_commit = self.sink.commit

        def commit_with_extra(**kw):
            snap = kw["upserts"]["snapshot"]
            if not hasattr(snap, "withColumn"):
                # r3: the stock engine ships snapshot rows zero-copy inside
                # the envelope (EnvelopedDir); a v2 adding a column
                # materializes them back into a DataFrame upsert — the
                # sink's generic evolution path
                snap = self.sink._read_dirs(
                    [{"dir": snap.dir, "field": snap.field}]).drop("_seq")
            kw["upserts"]["snapshot"] = snap.withColumn(
                "content_length", F.lit(batch_id * 1000).cast("long"))
            return orig_commit(**kw)

        self.sink.commit = commit_with_extra
        try:
            return super().apply_batch(batch, batch_id, offset_lo, offset_hi)
        finally:
            self.sink.commit = orig_commit


class TestEngineSchemaEvolution:
    def test_additive_column_mid_replay(self, spark, sink_dir):
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=8)
        edf = spark.createDataFrame(EVENTS, schema=schemas.CHANGE_EVENTS)
        # v1 engine applies the first half of the stream
        v1 = CdcEngine(spark, sink)
        v1.replay(edf, batch_size=30, max_batches=1)
        # v2 engine (new snapshot column) resumes from the checkpoint
        v2 = _EngineV2(spark, sink)
        v2.replay(edf, batch_size=30)
        snap = v2.table("snapshot")
        assert "content_length" in snap.columns
        rows = {(r["repo"], r["path"]): r for r in snap.collect()}
        assert set(rows) == set(EXPECTED)
        # keys last written by v1 read the new column as null; v2 keys have it
        v1_nulls = [r for r in rows.values() if r["content_length"] is None]
        v2_filled = [r for r in rows.values() if r["content_length"] is not None]
        assert v1_nulls and v2_filled

    def test_evolution_survives_compaction(self, spark, sink_dir):
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=8, compact_every=2)
        edf = spark.createDataFrame(EVENTS, schema=schemas.CHANGE_EVENTS)
        CdcEngine(spark, sink).replay(edf, batch_size=20, max_batches=1)
        _EngineV2(spark, sink).replay(edf, batch_size=20)  # triggers folds
        snap = sink.read_table("snapshot")
        assert "content_length" in snap.columns
        assert {(r["repo"], r["path"]) for r in snap.collect()} == set(EXPECTED)


class TestControlTable:
    def test_manifests_df(self, spark, sink_dir):
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=8)
        eng = CdcEngine(spark, sink)
        eng.replay(spark.createDataFrame(EVENTS, schema=schemas.CHANGE_EVENTS),
                   batch_size=25)
        ctl = sink.manifests_df().orderBy("batch_id").collect()
        assert len(ctl) >= 2
        assert sum(r["event_count"] for r in ctl) == len(EVENTS)
        # offset ranges tile the stream
        assert ctl[0]["offset_lo"] == 0
        for prev, cur in zip(ctl, ctl[1:]):
            assert cur["offset_lo"] == prev["offset_hi"] + 1
