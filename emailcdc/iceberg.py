"""Real-Iceberg sink adapter (drop-in for SnapshotParquetSink).

This sandbox ships no ``iceberg-spark-runtime`` jar, so the engine runs on
the MOR emulation in sink.py.  On a cluster with Iceberg configured
(``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12
--conf spark.sql.extensions=org.apache.iceberg.spark.extensions
.IcebergSparkSessionExtensions --conf spark.sql.catalog.lake=...``), this
adapter maps the same commit contract onto native Iceberg:

- keyed tables → delete-by-key (``MERGE … WHEN MATCHED THEN DELETE``) +
  append.  NOT ``MERGE … UPDATE SET *``: the detail tables (messages,
  attachments, calendar_entries) hold SEVERAL rows per (repo, path), and
  Iceberg MERGE fails on multiple matching source rows (ADVICE r1).
- append tables → ``INSERT INTO``
- idempotence → the engine's batch_id is WRITTEN as the Iceberg snapshot
  summary property ``emailcdc.batch_id`` on the append (the
  ``snapshot-property.*`` write option), and ``committed_batch_ids``
  reads it back from the ``.snapshots`` metadata table; a replayed batch
  whose property exists is skipped.  A crash between the delete and the
  append leaves the property absent, so the replay redoes both steps and
  converges (delete of already-deleted keys is a no-op).
- schema evolution → Iceberg's native additive ALTER TABLE

Each method raises ``RuntimeError`` with setup instructions when the
Iceberg extensions are absent, so selecting this sink without the jar
fails loudly and early.

Verification status: EMULATION-VERIFIED ONLY.  The SQL this adapter
emits is contract-tested against a mocked session
(tests/test_iceberg_adapter.py) and a probe-gated smoke test
(TestRealIcebergSmoke) runs the real upsert/skip contract whenever an
``iceberg-spark-runtime`` jar is discoverable (ICEBERG_JAR env or the
pyspark jars dir) — this sandbox has no such jar and no network to
fetch one, so the smoke test self-skips with that reason here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KEY = ["repo", "path"]
BATCH_PROP = "emailcdc.batch_id"  # snapshot summary property (idempotence)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


class IcebergSink:
    """Same surface as SnapshotParquetSink, executed as native Iceberg DML."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath. Launch with\n"
                "  spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-3.5_2.12:<version> \\\n"
                "    --conf spark.sql.extensions=org.apache.iceberg.spark."
                "extensions.IcebergSparkSessionExtensions \\\n"
                f"    --conf spark.sql.catalog.{catalog}=org.apache.iceberg."
                "spark.SparkCatalog ...\n"
                "or use emailcdc.sink.SnapshotParquetSink (the built-in "
                "MOR emulation).")
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _fqn(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def committed_batch_ids(self, table: str) -> set[int]:
        rows = self.spark.sql(
            f"SELECT summary['{BATCH_PROP}'] AS b FROM "
            f"{self._fqn(table)}.snapshots").collect()
        return {int(r["b"]) for r in rows if r["b"] is not None}

    def merge_upserts(self, table: str, rows: DataFrame, batch_id: int) -> None:
        """Idempotent per-key replace: skip an already-committed batch, else
        delete every touched key's rows and append the new rows, stamping
        the append's snapshot with ``emailcdc.batch_id`` so the next replay
        of this batch is detected.  delete+append (not MERGE UPDATE SET *)
        because detail tables carry multiple rows per key."""
        if batch_id in self.committed_batch_ids(table):
            return  # replayed batch — already visible
        self.delete_keys(table, rows.select(*KEY).distinct())
        (
            rows.writeTo(self._fqn(table))
            .option(f"snapshot-property.{BATCH_PROP}", str(batch_id))
            .append()
        )

    def delete_keys(self, table: str, keys: DataFrame) -> None:
        view = f"_emailcdc_del_{table}"
        keys.createOrReplaceTempView(view)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in KEY)
        self.spark.sql(
            f"MERGE INTO {self._fqn(table)} t USING {view} s ON {cond} "
            "WHEN MATCHED THEN DELETE")

    def append(self, table: str, rows: DataFrame,
               batch_id: int | None = None) -> None:
        """Append rows; with a ``batch_id`` the write is idempotent the same
        way as merge_upserts (skip if the snapshot property already exists)."""
        writer = rows.writeTo(self._fqn(table))
        if batch_id is not None:
            if batch_id in self.committed_batch_ids(table):
                return
            writer = writer.option(f"snapshot-property.{BATCH_PROP}",
                                   str(batch_id))
        writer.append()
