"""CDC engine semantics tests (pytest, Spark local).

Covers the north-rule contract (SURVEY.md §5 "CDC semantics"):
replay-twice idempotence, kill/resume from checkpoint, I/U/D LWW,
per-row sha256 invariant, additive schema evolution, failure routing,
hot-key salting, lineage/metrics emission.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from emailcdc import schemas
from emailcdc.engine import CdcEngine
from emailcdc.fixtures import make_change_events, make_eml, expected_final_state
from emailcdc.sink import SnapshotParquetSink


EVENTS = make_change_events(30)
EXPECTED = expected_final_state(EVENTS)


def _engine(spark, sink_dir, **kw):
    return CdcEngine(spark, SnapshotParquetSink(spark, sink_dir, n_buckets=8), **kw)


def _events_df(spark, events=EVENTS):
    return spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS)


def _snap_keys(eng):
    return {(r["repo"], r["path"]) for r in eng.table("snapshot").collect()}


class TestReplay:
    def test_final_state_parity_and_sha256(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        results = eng.replay(_events_df(spark), batch_size=25)
        assert sum(r.event_count for r in results) == len(EVENTS)
        rows = {(r["repo"], r["path"]): r for r in eng.table("snapshot").collect()}
        assert set(rows) == set(EXPECTED)
        for key, ev in EXPECTED.items():
            want = hashlib.sha256(ev["content"].encode()).hexdigest()
            assert rows[key]["content_sha256"] == want
            assert rows[key]["commit"] == ev["commit"]
            assert rows[key]["last_offset"] == ev["offset"]

    def test_replay_twice_idempotent(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=25)
        before = _snap_keys(eng)
        msg_before = eng.table("messages").count()
        again = eng.replay(_events_df(spark), batch_size=25)
        assert again == []  # checkpoint says everything is applied
        assert _snap_keys(eng) == before
        assert eng.table("messages").count() == msg_before

    def test_reapply_committed_batch_skipped(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=25)
        batch = _events_df(spark).filter("offset < 25")
        res = eng.apply_batch(batch, batch_id=1, offset_lo=0, offset_hi=24)
        assert res.skipped

    def test_kill_and_resume(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=20, max_batches=1)  # "crash"
        eng2 = _engine(spark, sink_dir)
        assert eng2.next_offset() == 20
        eng2.replay(_events_df(spark), batch_size=20)
        assert _snap_keys(eng2) == set(EXPECTED)

    def test_lww_within_single_batch(self, spark, sink_dir):
        key = {"repo": "r1", "path": "p1", "lang": "txt"}
        events = [
            {"offset": 0, "op": "I", "ts": None, **key, "commit": "c0", "content": "v0"},
            {"offset": 1, "op": "U", "ts": None, **key, "commit": "c1", "content": "v1"},
            {"offset": 2, "op": "U", "ts": None, **key, "commit": "c2", "content": "v2"},
        ]
        eng = _engine(spark, sink_dir)
        eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                   batch_size=100)
        rows = eng.table("snapshot").collect()
        assert len(rows) == 1
        assert rows[0]["commit"] == "c2"
        assert rows[0]["content_sha256"] == hashlib.sha256(b"v2").hexdigest()

    def test_delete_then_reinsert(self, spark, sink_dir):
        key = {"repo": "r1", "path": "p1", "lang": "txt"}
        events = [
            {"offset": 0, "op": "I", "ts": None, **key, "commit": "c0", "content": "v0"},
            {"offset": 1, "op": "D", "ts": None, **key, "commit": None, "content": None},
            {"offset": 2, "op": "I", "ts": None, **key, "commit": "c2", "content": "v2"},
        ]
        eng = _engine(spark, sink_dir)
        # one event per batch → exercises cross-batch delete + reinsert
        eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                   batch_size=1)
        rows = eng.table("snapshot").collect()
        assert len(rows) == 1 and rows[0]["commit"] == "c2"

    def test_update_replaces_message_rows(self, spark, sink_dir):
        key = {"repo": "r1", "path": "a.eml", "lang": "eml"}
        events = [
            {"offset": 0, "op": "I", "ts": None, **key, "commit": "c0",
             "content": make_eml(1)},
            {"offset": 1, "op": "U", "ts": None, **key, "commit": "c1",
             "content": make_eml(2)},
        ]
        eng = _engine(spark, sink_dir)
        eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                   batch_size=1)
        msgs = eng.table("messages").collect()
        assert len(msgs) == 1  # old extraction replaced, not appended
        assert msgs[0]["subject"] == "report 2"
        atts = eng.table("attachments").collect()
        assert len(atts) == 3  # from message 2 only

    def test_attachment_binary_content_and_b64_view(self, spark, sink_dir):
        """The sink's attachments table carries raw BinaryType content;
        attachments_b64_view yields exactly Python's unchunked base64 of
        those bytes (the oracle-facing string contract)."""
        import base64

        from emailcdc.udfs import attachments_b64_view

        key = {"repo": "r1", "path": "a.eml", "lang": "eml"}
        events = [{"offset": 0, "op": "I", "ts": None, **key,
                   "commit": "c0", "content": make_eml(1)}]
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark, events), batch_size=1)
        att_tbl = eng.table("attachments")
        assert dict(att_tbl.dtypes)["content"] == "binary"
        rows = att_tbl.collect()
        assert rows and all(
            isinstance(bytes(r["content"]), bytes)
            and hashlib.sha256(bytes(r["content"])).hexdigest() == r["sha256"]
            for r in rows)
        view_df = attachments_b64_view(att_tbl)
        assert "content" not in view_df.columns
        view = {r["sha256"]: r["content_b64"] for r in view_df.collect()}
        assert all(
            view[r["sha256"]]
            == base64.b64encode(bytes(r["content"])).decode("ascii")
            for r in rows)

    def test_terminal_delete_removes_all_key_rows(self, spark, sink_dir):
        key = {"repo": "r1", "path": "a.eml", "lang": "eml"}
        events = [
            {"offset": 0, "op": "I", "ts": None, **key, "commit": "c0",
             "content": make_eml(1)},
            {"offset": 1, "op": "D", "ts": None, **key, "commit": None, "content": None},
        ]
        eng = _engine(spark, sink_dir)
        eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                   batch_size=1)
        assert eng.table("snapshot").count() == 0
        assert eng.table("messages").count() == 0
        assert eng.table("attachments").count() == 0

    def test_lineage_rows_cover_batch(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=25)
        lineage = eng.table("lineage")
        agg = lineage.agg(F.sum("rows").alias("n"),
                          F.min("min_offset").alias("lo"),
                          F.max("max_offset").alias("hi")).collect()[0]
        assert agg["n"] == len(EVENTS)
        assert agg["lo"] == 0
        assert agg["hi"] == max(e["offset"] for e in EVENTS)

    def test_manifest_stats_recorded(self, spark, sink_dir):
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=1000)
        manifest = eng.sink.read_manifest()
        assert manifest.stats["event_count"] == len(EVENTS)
        assert manifest.offset_lo == 0

    def test_failure_rows_routed(self, spark, sink_dir):
        events = [
            {"offset": 0, "op": "I", "ts": None, "repo": "r", "path": "bad.mbox",
             "lang": "mbox", "commit": "c", "content": make_eml(1)},  # parses fine
        ]
        # force a failure by monkey-free means: an mbox whose sole message is
        # unparseable is hard to fabricate with the stdlib (it accepts almost
        # anything), so instead verify the failures table stays empty on good
        # input and the dead-letter path is covered by unit tests.
        eng = _engine(spark, sink_dir)
        eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                   batch_size=10)
        assert eng.table("failures").count() == 0


class TestSchemaEvolution:
    def test_additive_column_mid_replay(self, spark, sink_dir):
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=4)
        base = spark.createDataFrame(
            [("r1", "p1", "c", "txt", "sha", 0)],
            "repo string, path string, commit string, lang string,"
            " content_sha256 string, last_offset long",
        )
        sink.commit(1, 0, 0, {"snapshot": base}, None)
        evolved = spark.createDataFrame(
            [("r1", "p2", "c", "txt", "sha2", 1, "new")],
            "repo string, path string, commit string, lang string,"
            " content_sha256 string, last_offset long, extra_col string",
        )
        sink.commit(2, 1, 1, {"snapshot": evolved}, None)
        df = sink.read_table("snapshot")
        assert "extra_col" in df.columns
        rows = {r["path"]: r for r in df.collect()}
        assert rows["p1"]["extra_col"] is None  # old rows null-filled
        assert rows["p2"]["extra_col"] == "new"

    def test_type_change_rejected(self, spark, sink_dir):
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=4)
        base = spark.createDataFrame([("r1", "p1", 1)],
                                     "repo string, path string, v long")
        sink.commit(1, 0, 0, {"snapshot": base}, None)
        bad = spark.createDataFrame([("r1", "p1", "oops")],
                                    "repo string, path string, v string")
        with pytest.raises(Exception, match="unsafe schema evolution"):
            sink.commit(2, 1, 1, {"snapshot": bad}, None)


class TestSkew:
    def test_hot_repo_detected_and_salted(self, spark, sink_dir):
        events = []
        for i in range(200):  # one scorching repo
            events.append({"offset": i, "op": "I", "ts": None, "repo": "hot/repo",
                           "path": f"p{i}.txt", "lang": "txt", "commit": "c",
                           "content": f"v{i}"})
        for i in range(20):
            events.append({"offset": 200 + i, "op": "I", "ts": None,
                           "repo": f"cold/r{i}", "path": "p.txt", "lang": "txt",
                           "commit": "c", "content": "v"})
        eng = _engine(spark, sink_dir, hot_key_min=50, hot_key_fraction=0.2)
        results = eng.replay(spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
                             batch_size=1000)
        assert results[0].hot_repos == ("hot/repo",)
        assert eng.table("snapshot").count() == 220

    def test_stats_collect_bounded_by_hot_repos(self, spark, sink_dir,
                                                monkeypatch):
        """VERDICT r2: a batch with 10k distinct repos must not ship its
        per-repo long tail to the driver — the stats job collects only
        partition-level rows, and hot-repo detection filters to
        above-threshold repos EXECUTOR-side."""
        events = [{"offset": i, "op": "I", "ts": None, "repo": f"tail/r{i}",
                   "path": "p.txt", "lang": "txt", "commit": "c",
                   "content": "v"} for i in range(10_000)]
        for i in range(10_000, 13_000):  # one repo above the 20% threshold
            events.append({"offset": i, "op": "I", "ts": None,
                           "repo": "hot/repo", "path": f"p{i}.txt",
                           "lang": "txt", "commit": "c", "content": "v"})
        sizes = []
        cls = type(spark.range(1))  # the concrete DataFrame implementation
        orig = cls.collect

        def spy(self):
            rows = orig(self)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(cls, "collect", spy)
        eng = _engine(spark, sink_dir, hot_key_min=64, hot_key_fraction=0.2)
        results = eng.replay(
            spark.createDataFrame(events, schema=schemas.CHANGE_EVENTS),
            batch_size=100_000)
        assert results[0].hot_repos == ("hot/repo",)
        assert results[0].event_count == 13_000
        # partition-level stats (≤ partitions × ops) + 1 hot repo — never
        # the 10k-repo tail
        assert max(sizes) < 1_000, sizes


class TestVacuumAndCrash:
    def test_crash_before_flip_recovers(self, spark, sink_dir, tmp_path):
        import os
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=20, max_batches=2)
        os.remove(os.path.join(sink_dir, "CURRENT"))  # crash before any flip
        eng2 = _engine(spark, sink_dir)
        assert eng2.next_offset() == 0
        eng2.replay(_events_df(spark), batch_size=20)
        assert _snap_keys(eng2) == set(EXPECTED)
        eng2.sink.vacuum()
        assert _snap_keys(eng2) == set(EXPECTED)  # reads intact post-vacuum

    def test_orphan_envelope_dir_vacuumed(self, spark, sink_dir, tmp_path):
        # crash AFTER the envelope write but BEFORE the manifest: the
        # orphan batch dir is above CURRENT, so only a QUIESCED vacuum may
        # collect it (to a concurrent vacuum it is indistinguishable from
        # an in-flight commit — ADVICE r2)
        import os
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=10_000)
        orphan = os.path.join(sink_dir, "data", "_envelope", "batch-999")
        os.makedirs(os.path.join(orphan, "record_type=message"))
        assert eng.sink.vacuum() == 0  # default: in-flight dirs are skipped
        assert os.path.isdir(orphan)
        removed = eng.sink.vacuum(quiesced=True)
        assert removed >= 1
        assert not os.path.isdir(orphan)
        assert _snap_keys(eng) == set(EXPECTED)
        assert eng.table("messages").count() > 0

    def test_vacuum_skips_in_flight_commit_dirs(self, spark, sink_dir):
        """ADVICE r2: a vacuum racing an active replay must not delete the
        envelope/snap dirs of the commit being written (id > CURRENT) —
        the commit would register deleted data."""
        import os
        eng = _engine(spark, sink_dir)
        eng.replay(_events_df(spark), batch_size=10_000)
        current = eng.sink.current_snapshot_id()
        inflight = [
            os.path.join(sink_dir, "data", "_envelope",
                         f"batch-{current + 1}", "record_type=message"),
            os.path.join(sink_dir, "data", "snapshot", f"snap-{current + 1}"),
            os.path.join(sink_dir, "data", "_marks", f"snap-{current + 1}"),
        ]
        for d in inflight:
            os.makedirs(d, exist_ok=True)
        eng.sink.vacuum()
        for d in inflight:
            assert os.path.isdir(d), d


class TestBroadcastGuard:
    """VERDICT r1: past broadcast_key_limit the LWW semi-join and the
    compaction folds must fall back to shuffle joins — same results,
    no driver-sized broadcast of a 10^7-key frame."""

    def test_parity_with_guard_forced(self, spark, tmp_path):
        sink = SnapshotParquetSink(spark, str(tmp_path / "sink"), n_buckets=8,
                                   compact_every=2)  # force folds mid-replay
        eng = CdcEngine(spark, sink, broadcast_key_limit=1)
        eng.replay(_events_df(spark), batch_size=20)
        assert _snap_keys(eng) == set(EXPECTED)
        # sha parity spot check (content survived the shuffle path)
        rows = {(r["repo"], r["path"]): r["content_sha256"]
                for r in eng.table("snapshot").collect()}
        for key, ev in EXPECTED.items():
            assert rows[key] == hashlib.sha256(ev["content"].encode()).hexdigest()

    def test_guard_threads_into_sink(self, spark, tmp_path):
        eng = _engine(spark, str(tmp_path / "sink"), broadcast_key_limit=7)
        assert eng.sink.broadcast_key_limit == 7

    def test_engine_default_adopts_sink_limit(self, spark, tmp_path):
        """ADVICE r2: a limit configured on the sink constructor must not
        be clobbered by the engine's default — the engine adopts it."""
        sink = SnapshotParquetSink(spark, str(tmp_path / "sink"),
                                   broadcast_key_limit=123)
        eng = CdcEngine(spark, sink)
        assert sink.broadcast_key_limit == 123
        assert eng.broadcast_key_limit == 123


class TestFolderExpression:
    """FOLDER_IDENTIFIER as a Spark SQL expression, evaluated JVM-side
    before the Arrow boundary (AbstractJavaMailProcessor.java:58-67)."""

    def test_custom_expression_reaches_messages(self, spark):
        from emailcdc.fixtures import make_mbox
        from emailcdc.udfs import extract_envelope, split_envelope
        df = spark.createDataFrame(
            [("org/r", "in/a.mbox", "c", "mbox", make_mbox(3))],
            "repo string, path string, commit string, lang string, content string",
        ).withColumn("offset", F.lit(0).cast("long"))
        outs = split_envelope(extract_envelope(
            df, folder_expression="concat(repo, ':', path)"))
        folders = {r["folder"] for r in outs["messages"].collect()}
        assert folders == {"org/r:in/a.mbox"}

    def test_engine_threads_expression(self, spark, tmp_path):
        eng = _engine(spark, str(tmp_path / "sink"),
                      folder_expression="upper(path)")
        edf = _events_df(spark)
        eng.replay(edf.filter(F.col("offset") < 10), batch_size=100)
        msgs = eng.table("messages")
        if msgs.count():
            assert all(r["folder"] == r["folder"].upper()
                       for r in msgs.select("folder").collect())


class TestEnvelopeDeltas:
    """Zero-copy envelope registration: the parse output IS the delta;
    compaction folds dereference the envelope dirs and vacuum collects
    them."""

    def test_fold_then_vacuum_collects_envelope_dirs(self, spark, tmp_path):
        import os
        sink_dir = str(tmp_path / "sink")
        sink = SnapshotParquetSink(spark, sink_dir, n_buckets=8,
                                   compact_every=2)
        eng = CdcEngine(spark, sink)
        eng.replay(_events_df(spark), batch_size=15)  # several batches → folds
        assert _snap_keys(eng) == set(EXPECTED)
        env_root = os.path.join(sink_dir, "data", "_envelope")
        before = len(os.listdir(env_root)) if os.path.isdir(env_root) else 0
        removed = sink.vacuum()
        # at least the pre-fold batches' envelope dirs are dereferenced
        assert removed > 0 or before == 0
        # reads still intact after vacuum
        assert _snap_keys(eng) == set(EXPECTED)
        assert eng.table("messages").count() > 0

    def test_messages_readable_from_envelope_entry(self, spark, tmp_path):
        eng = _engine(spark, str(tmp_path / "sink"))
        eng.replay(_events_df(spark), batch_size=10_000)  # single delta, no fold
        manifest = eng.sink.read_manifest()
        entries = manifest.tables["messages"]
        assert any(isinstance(e, dict) and e.get("field") == "message"
                   for e in entries)
        msgs = eng.table("messages")
        assert msgs.count() > 0
        assert "_seq" not in msgs.columns
