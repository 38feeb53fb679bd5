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


class TestRealIcebergSmoke:
    """Probe-gated smoke test against a REAL iceberg-spark-runtime
    (VERDICT r4 task 8).  The sandbox has no network (Maven Central
    unreachable) and ships no iceberg jar, so this skips here with the
    probe's reason; on a cluster with the jar present it exercises the
    adapter's upsert/skip contract end-to-end.  Set ICEBERG_JAR to a
    local iceberg-spark-runtime jar to force the attempt."""

    def _probe_jar(self):
        import glob
        import os
        cand = os.environ.get("ICEBERG_JAR")
        if cand and os.path.isfile(cand):
            return cand
        import pyspark
        jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jar_dir, "iceberg-spark-runtime*.jar"))
        return hits[0] if hits else None

    def test_real_runtime_upsert_and_skip(self, tmp_path):
        jar = self._probe_jar()
        if jar is None:
            pytest.skip("no iceberg-spark-runtime jar on this host and no "
                        "network to fetch one — adapter is emulation-"
                        "verified only (tests above mock the SQL surface)")
        from pyspark.sql import SparkSession

        from emailcdc.iceberg import IcebergSink
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("iceberg-smoke")
            .config("spark.jars", jar)
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions."
                    "IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.lake",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.lake.type", "hadoop")
            .config("spark.sql.catalog.lake.warehouse",
                    str(tmp_path / "warehouse"))
            .getOrCreate()
        )
        try:
            spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ns")
            spark.sql("CREATE TABLE lake.ns.snapshot (repo string, "
                      "path string, commit string) USING iceberg")
            sink = IcebergSink(spark, "lake", "ns")
            df1 = spark.createDataFrame(
                [("r", "a", "c1"), ("r", "b", "c1")],
                "repo string, path string, commit string")
            sink.merge_upserts("snapshot", df1, batch_id=1)
            assert spark.table("lake.ns.snapshot").count() == 2
            # replayed batch: property present -> caller should skip
            assert 1 in sink.committed_batch_ids("snapshot")
            # upsert replaces, not appends
            df2 = spark.createDataFrame(
                [("r", "a", "c2")], "repo string, path string, commit string")
            sink.merge_upserts("snapshot", df2, batch_id=2)
            rows = {(r.repo, r.path): r.commit
                    for r in spark.table("lake.ns.snapshot").collect()}
            assert rows == {("r", "a"): "c2", ("r", "b"): "c1"}
        finally:
            spark.stop()
