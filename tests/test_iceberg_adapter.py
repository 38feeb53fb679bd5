"""IcebergSink contract tests with recorded fakes — no Iceberg runtime in
this sandbox, so these pin the CALL SEQUENCE the adapter issues: committed
batches are skipped, upserts run delete-by-key THEN append, and the append
carries the emailcdc.batch_id snapshot property (ADVICE r1 regression)."""

import pytest

from emailcdc import iceberg
from emailcdc.iceberg import BATCH_PROP, IcebergSink


class FakeRow(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class FakeWriter:
    def __init__(self, log, table):
        self.log = log
        self.table = table
        self.options = {}

    def option(self, k, v):
        self.options[k] = v
        return self

    def append(self):
        self.log.append(("append", self.table, dict(self.options)))


class FakeDF:
    def __init__(self, log, name="df"):
        self.log = log
        self.name = name

    def select(self, *cols):
        return self

    def distinct(self):
        return self

    def createOrReplaceTempView(self, name):
        self.log.append(("view", name))

    def writeTo(self, table):
        return FakeWriter(self.log, table)


class FakeSpark:
    def __init__(self, committed_ids=()):
        self.log = []
        self.committed = committed_ids

    def sql(self, q):
        self.log.append(("sql", " ".join(q.split())))

        class R:
            def collect(_self):
                return [FakeRow({"b": str(b)}) for b in self.committed]
        return R()


@pytest.fixture
def sink(monkeypatch):
    monkeypatch.setattr(iceberg, "iceberg_available", lambda spark: True)

    def make(committed=()):
        spark = FakeSpark(committed)
        return IcebergSink(spark, "lake", "emailcdc"), spark
    return make


class TestIcebergSink:
    def test_upsert_deletes_then_appends_with_batch_property(self, sink):
        s, spark = sink()
        s.merge_upserts("messages", FakeDF(spark.log), batch_id=7)
        kinds = [e[0] for e in spark.log]
        # snapshot check (sql), delete view+merge (view+sql), append last
        assert kinds[-1] == "append"
        append = spark.log[-1]
        assert append[1] == "lake.emailcdc.messages"
        assert append[2] == {f"snapshot-property.{BATCH_PROP}": "7"}
        merge_sqls = [e[1] for e in spark.log if e[0] == "sql" and "MERGE" in e[1]]
        assert any("WHEN MATCHED THEN DELETE" in q for q in merge_sqls)
        assert not any("UPDATE SET" in q for q in merge_sqls)  # multi-row keys

    def test_committed_batch_skipped(self, sink):
        s, spark = sink(committed=(7,))
        s.merge_upserts("messages", FakeDF(spark.log), batch_id=7)
        assert not any(e[0] == "append" for e in spark.log)

    def test_append_idempotent_with_batch_id(self, sink):
        s, spark = sink(committed=(3,))
        s.append("failures", FakeDF(spark.log), batch_id=3)
        assert not any(e[0] == "append" for e in spark.log)
        s.append("failures", FakeDF(spark.log), batch_id=4)
        appends = [e for e in spark.log if e[0] == "append"]
        assert appends and appends[0][2][f"snapshot-property.{BATCH_PROP}"] == "4"

    def test_plain_append_without_batch_id(self, sink):
        s, spark = sink()
        s.append("lineage", FakeDF(spark.log))
        appends = [e for e in spark.log if e[0] == "append"]
        assert appends == [("append", "lake.emailcdc.lineage", {})]

    def test_missing_runtime_fails_loudly(self):
        class NoIceberg:
            class _jvm:  # attribute access raises
                pass
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            IcebergSink(NoIceberg(), "lake", "ns")
