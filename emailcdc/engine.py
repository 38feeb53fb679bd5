"""CdcEngine — micro-batch replay of a change-event log into the sink.

The Spark lifecycle (SURVEY.md §3, "Spark lifecycle equivalent"):

    events → [offset-range batch] → LWW dedup window → skew-aware salted
    repartition → mapInPandas extraction (Arrow) → MERGE commit (bucketed
    snapshot swap) → lineage/metrics rows

Exactly-once: ``snapshot_id == batch_id`` is monotone; a batch whose id is
≤ the sink's CURRENT pointer is skipped idempotently, and resume reads
``offset_hi + 1`` from the CURRENT manifest — so the engine can be killed
and restarted at any point (crash before the pointer flip leaves only
orphan files; the batch reruns deterministically).

Skew handling (north rule): hot repos are detected per batch with a cheap
``groupBy(repo).count()`` over the deduped winners; events of hot repos get
a salt derived from ``offset`` so one giant repo spreads over
``n_salts`` partitions during the (CPU-heavy) parse stage, then the salt is
dropped — the MERGE stays key-correct because bucketing is on (repo, path).

At 10^10-event scale nothing here is driver-bound: per-batch collects are
O(#hot repos + #touched buckets + #op kinds), constant-size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import schemas
from .sink import SnapshotParquetSink
from .udfs import extract_envelope, split_envelope

KEY = ["repo", "path"]


@dataclass
class BatchResult:
    batch_id: int
    offset_lo: int
    offset_hi: int
    event_count: int
    upsert_count: int
    delete_count: int
    skipped: bool = False
    hot_repos: tuple = ()


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        sink: SnapshotParquetSink,
        *,
        error_strategy: str = "continue",
        n_salts: int = 8,
        hot_key_fraction: float = 0.2,
        hot_key_min: int = 64,
        extract_partitions: int | None = None,
    ):
        self.spark = spark
        self.sink = sink
        self.error_strategy = error_strategy
        self.n_salts = n_salts
        self.hot_key_fraction = hot_key_fraction
        self.hot_key_min = hot_key_min
        self.extract_partitions = extract_partitions

    # --- checkpoint/resume ----------------------------------------------------

    def next_offset(self) -> int:
        manifest = self.sink.read_manifest()
        return (manifest.offset_hi + 1) if manifest else 0

    def next_batch_id(self) -> int:
        manifest = self.sink.read_manifest()
        return (manifest.batch_id + 1) if manifest else 1

    # --- one micro-batch --------------------------------------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    offset_lo: int, offset_hi: int) -> BatchResult:
        current = self.sink.current_snapshot_id()
        if current is not None and batch_id <= current:
            return BatchResult(batch_id, offset_lo, offset_hi, 0, 0, 0, skipped=True)

        # Per-partition lineage of the raw batch read (north rule: lineage +
        # metrics to a control table).
        lineage = (
            batch.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("offset").alias("min_offset"),
                F.max("offset").alias("max_offset"),
            )
            .withColumn("partition_id", F.col("partition_id").cast("int"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select("batch_id", "partition_id", "rows", "min_offset", "max_offset")
        )

        # LWW dedup: last event per key inside the batch wins
        # (Window.partitionBy(key).orderBy(desc(offset)) — SURVEY.md §2.2).
        w = Window.partitionBy(*KEY).orderBy(F.desc("offset"))
        winners = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        winners = winners.persist()
        try:
            op_counts = {r["op"]: r["cnt"] for r in
                         winners.groupBy("op").agg(F.count(F.lit(1)).alias("cnt")).collect()}
            event_count = batch.count()
            upsert_count = op_counts.get("I", 0) + op_counts.get("U", 0)
            delete_count = op_counts.get("D", 0)

            deletes = winners.filter(F.col("op") == "D").select(*KEY)
            upserts = winners.filter(F.col("op") != "D")

            # --- skew: detect hot repos, salt the parse stage ------------------
            hot_threshold = max(self.hot_key_min, int(upsert_count * self.hot_key_fraction))
            hot_repos = [
                r["repo"]
                for r in upserts.groupBy("repo").agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > hot_threshold)
                .collect()
            ]
            n_parts = self.extract_partitions or self.spark.sparkContext.defaultParallelism
            if hot_repos:
                salted = upserts.withColumn(
                    "_salt",
                    F.when(
                        F.col("repo").isin(hot_repos),
                        F.pmod(F.xxhash64("path", "offset"), F.lit(self.n_salts)),
                    ).otherwise(F.lit(0)),
                ).repartition(n_parts, "repo", "_salt").drop("_salt")
            else:
                salted = upserts.repartition(n_parts, *KEY)

            # --- extraction (the payload) ---------------------------------------
            envelope = extract_envelope(salted, self.error_strategy).persist()
            outs = split_envelope(envelope)

            # --- snapshot (MERGE target) rows ------------------------------------
            snapshot_rows = upserts.select(
                "repo", "path", "commit", "lang",
                F.sha2(F.col("content"), 256).alias("content_sha256"),
                F.col("offset").alias("last_offset"),
            )

            stats = {
                "event_count": event_count,
                "upsert_count": upsert_count,
                "delete_count": delete_count,
                "hot_repos": hot_repos,
            }
            self.sink.commit(
                batch_id=batch_id,
                offset_lo=offset_lo,
                offset_hi=offset_hi,
                upserts={
                    "snapshot": snapshot_rows,
                    "messages": outs["messages"],
                    "attachments": outs["attachments"],
                    "calendar_entries": outs["calendar_entries"],
                },
                delete_keys=deletes,
                appends={"failures": outs["failures"], "lineage": lineage},
                stats=stats,
            )
            envelope.unpersist()
            return BatchResult(batch_id, offset_lo, offset_hi,
                               event_count, upsert_count, delete_count,
                               hot_repos=tuple(hot_repos))
        finally:
            winners.unpersist()

    # --- full replay --------------------------------------------------------------

    def replay(self, events: DataFrame, *, batch_size: int = 10_000,
               max_batches: int | None = None) -> list[BatchResult]:
        """Replay an offset-ordered change log in micro-batches, resuming
        from the sink's checkpoint.  ``events`` must carry a dense-ish
        monotone ``offset`` column; batching is by offset range (the static
        analog of maxOffsetsPerTrigger)."""
        max_offset_row = events.agg(F.max("offset").alias("m")).collect()[0]
        max_offset = max_offset_row["m"]
        if max_offset is None:
            return []
        results: list[BatchResult] = []
        lo = self.next_offset()
        batch_id = self.next_batch_id()
        n = 0
        while lo <= max_offset:
            hi = lo + batch_size - 1
            batch = events.filter((F.col("offset") >= lo) & (F.col("offset") <= hi))
            results.append(self.apply_batch(batch, batch_id, lo, hi))
            lo = hi + 1
            batch_id += 1
            n += 1
            if max_batches is not None and n >= max_batches:
                break
        return results

    # --- convenience readers ---------------------------------------------------

    def table(self, name: str) -> DataFrame:
        df = self.sink.read_table(name)
        if df is None:
            schema = {
                "snapshot": "repo string, path string, commit string, lang string,"
                            " content_sha256 string, last_offset long",
            }.get(name)
            if schema:
                return self.spark.createDataFrame([], schema)
            mapping = {
                "messages": schemas.MESSAGES,
                "attachments": schemas.ATTACHMENTS,
                "calendar_entries": schemas.CALENDAR_ENTRIES,
                "failures": schemas.FAILURES,
                "lineage": schemas.LINEAGE,
            }
            return self.spark.createDataFrame([], mapping[name])
        return df.drop("_bucket") if "_bucket" in df.columns else df
