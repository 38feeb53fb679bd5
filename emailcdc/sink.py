"""SnapshotParquetSink — an Iceberg-style multi-table sink emulation.

No Iceberg runtime jar ships in this sandbox, so the engine implements the
same contract Iceberg's ``MERGE INTO`` + snapshot isolation gives, behind a
small interface a real ``iceberg-spark-runtime`` adapter can replace
(SURVEY.md §4 item 2):

- **Immutable bucketed data files.**  Every table is hash-bucketed on the
  upsert key ``(repo, path)`` into ``n_buckets`` fixed buckets (the analog
  of Iceberg ``bucket(N, ...)`` partition transform).  A MERGE only reads
  and rewrites the buckets actually touched by a batch — at 100 TB with
  4096 buckets a batch touching 1% of keys rewrites ~1% of the sink, never
  the whole table.
- **Manifests + atomic pointer flip.**  Each commit writes
  ``manifests/manifest-<snapshot_id>.json`` mapping table → bucket → data
  files (unchanged buckets re-reference the previous snapshot's files —
  zero copy), then atomically replaces the ``CURRENT`` pointer file
  (``os.replace``, atomic on POSIX).  The flip is the single commit point:
  a crash anywhere earlier leaves only orphan data files (garbage, never
  visible), which ``vacuum()`` removes.
- **Exactly-once / idempotent replay.**  ``snapshot_id == batch_id``; a
  batch whose id ≤ the CURRENT pointer is already committed and is skipped
  by the engine (engine.py).  Offsets ride inside the manifest, so resume
  = read CURRENT manifest.
- **Additive schema evolution.**  ``_reconcile_schema`` diffs the incoming
  StructType against the table's last-known schema; new columns are added
  nullable, old files are read with ``mergeSchema`` + ``unionByName(...,
  allowMissingColumns=True)``.  Column drops/renames are rejected (same
  rule as Iceberg's safe-evolution default).

Tables managed: ``snapshot`` (live repos state — the MERGE target),
``messages``, ``attachments``, ``calendar_entries`` (per-key detail rows,
replaced on upsert), ``failures`` (append-only dead letter).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY = ["repo", "path"]
KEYED_TABLES = ("snapshot", "messages", "attachments", "calendar_entries")
APPEND_TABLES = ("failures", "lineage")
ALL_TABLES = KEYED_TABLES + APPEND_TABLES


def bucket_expr(n_buckets: int):
    """Iceberg-style bucket transform on the upsert key."""
    return F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(n_buckets)).cast("int")


@dataclass
class Manifest:
    snapshot_id: int
    batch_id: int
    offset_lo: int
    offset_hi: int
    tables: dict = field(default_factory=dict)  # table -> {bucket(str) -> [files]}
    schemas: dict = field(default_factory=dict)  # table -> schema json
    stats: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Manifest":
        return Manifest(**json.loads(text))


class SnapshotParquetSink:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # --- pointer / manifest plumbing ---------------------------------------

    @property
    def _current_path(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._current_path) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def read_manifest(self, snapshot_id: int | None = None) -> Manifest | None:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return None
        path = os.path.join(self.root, "manifests", f"manifest-{snapshot_id}.json")
        with open(path) as fh:
            return Manifest.from_json(fh.read())

    def _flip_current(self, snapshot_id: int) -> None:
        tmp = self._current_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(snapshot_id))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._current_path)  # atomic commit point

    # --- reads --------------------------------------------------------------

    def _table_files(self, manifest: Manifest | None, table: str,
                     buckets: list[int] | None = None) -> list[str]:
        if manifest is None or table not in manifest.tables:
            return []
        entry = manifest.tables[table]
        if buckets is None:
            return [f for files in entry.values() for f in files]
        return [f for b in buckets for f in entry.get(str(b), [])]

    def read_table(self, table: str, buckets: list[int] | None = None) -> DataFrame | None:
        """Current snapshot of a table (optionally only given buckets)."""
        manifest = self.read_manifest()
        files = self._table_files(manifest, table, buckets)
        if not files:
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(*files)

    # --- schema evolution ----------------------------------------------------

    @staticmethod
    def _reconcile(old_df: DataFrame | None, new_df: DataFrame) -> tuple[DataFrame | None, DataFrame]:
        """Additive reconcile: align both sides by name, adding missing
        columns as nulls.  Rejects type changes (safe-evolution rule)."""
        if old_df is None:
            return None, new_df
        old_types = dict(old_df.dtypes)
        new_types = dict(new_df.dtypes)
        for col, dt in new_types.items():
            if col in old_types and old_types[col] != dt:
                raise ValueError(
                    f"unsafe schema evolution on '{col}': {old_types[col]} → {dt}"
                )
        for col, dt in new_types.items():
            if col not in old_types:
                old_df = old_df.withColumn(col, F.lit(None).cast(dt))
        for col, dt in old_types.items():
            if col not in new_types:
                new_df = new_df.withColumn(col, F.lit(None).cast(dt))
        new_df = new_df.select(*sorted(new_df.columns))
        old_df = old_df.select(*sorted(old_df.columns))
        return old_df, new_df

    # --- commit --------------------------------------------------------------

    def commit(
        self,
        batch_id: int,
        offset_lo: int,
        offset_hi: int,
        upserts: dict[str, DataFrame],
        delete_keys: DataFrame | None,
        appends: dict[str, DataFrame] | None = None,
        stats: dict | None = None,
    ) -> Manifest:
        """MERGE a batch into all tables and atomically publish snapshot
        ``batch_id``.

        ``upserts[table]`` rows replace ALL existing rows for their
        ``(repo, path)`` key (op I/U — the new extraction supersedes the
        old, matching the reference's whole-file reprocessing model);
        ``delete_keys`` removes keys (op D).  Only touched buckets are
        rewritten; untouched buckets re-reference previous files.
        """
        prev = self.read_manifest()
        snapshot_id = batch_id
        appends = appends or {}

        # Touched buckets = buckets of any upserted or deleted key.
        key_frames = [df.select(*KEY) for df in upserts.values()]
        if delete_keys is not None:
            key_frames.append(delete_keys.select(*KEY))
        touched: set[int] = set()
        if key_frames:
            all_keys = key_frames[0]
            for kf in key_frames[1:]:
                all_keys = all_keys.unionByName(kf)
            touched = {
                r["b"]
                for r in all_keys.select(bucket_expr(self.n_buckets).alias("b"))
                .distinct()
                .collect()
            }
        touched_list = sorted(touched)

        # Union of all batch keys (for the anti-join delete side). Small per
        # micro-batch → broadcast.
        batch_keys = None
        if key_frames:
            batch_keys = key_frames[0]
            for kf in key_frames[1:]:
                batch_keys = batch_keys.unionByName(kf)
            batch_keys = batch_keys.distinct()

        new_tables: dict[str, dict[str, list[str]]] = {}
        new_schemas: dict[str, str] = {}

        for table in KEYED_TABLES:
            prev_entry = dict(prev.tables.get(table, {})) if prev else {}
            new_entry = {b: files for b, files in prev_entry.items()
                         if int(b) not in touched}
            new_rows = upserts.get(table)
            old_touched = None
            if touched_list and prev_entry:
                files = [f for b in touched_list for f in prev_entry.get(str(b), [])]
                if files:
                    old_touched = self.spark.read.option("mergeSchema", "true").parquet(*files)
            if old_touched is not None and batch_keys is not None:
                # survivors: old rows in touched buckets whose key is NOT in batch
                old_touched = old_touched.join(
                    F.broadcast(batch_keys), on=KEY, how="left_anti"
                )
            if new_rows is not None and old_touched is not None:
                old_touched, new_rows = self._reconcile(old_touched, new_rows)
                merged = old_touched.unionByName(new_rows, allowMissingColumns=True)
            elif new_rows is not None:
                merged = new_rows
            else:
                merged = old_touched
            if merged is not None and touched_list:
                out_dir = os.path.join(
                    self.root, "data", table, f"snap-{snapshot_id}"
                )
                (
                    merged.withColumn("_bucket", bucket_expr(self.n_buckets))
                    .filter(F.col("_bucket").isin(touched_list))
                    .repartition(max(1, min(len(touched_list), 32)), "_bucket")
                    .write.partitionBy("_bucket")
                    .mode("overwrite")
                    .parquet(out_dir)
                )
                for b in touched_list:
                    bdir = os.path.join(out_dir, f"_bucket={b}")
                    if os.path.isdir(bdir):
                        new_entry[str(b)] = [bdir]
                    else:
                        new_entry.pop(str(b), None)  # bucket emptied
                new_schemas[table] = merged.schema.json()
            elif prev and table in prev.schemas:
                new_schemas[table] = prev.schemas[table]
            new_tables[table] = new_entry

        for table in APPEND_TABLES:
            prev_entry = dict(prev.tables.get(table, {})) if prev else {}
            rows = appends.get(table)
            if rows is not None and not rows.isEmpty():
                out_dir = os.path.join(self.root, "data", table, f"snap-{snapshot_id}")
                rows.write.mode("overwrite").parquet(out_dir)
                prev_entry[str(snapshot_id)] = [out_dir]
                new_schemas[table] = rows.schema.json()
            elif prev and table in prev.schemas:
                new_schemas[table] = prev.schemas[table]
            new_tables[table] = prev_entry

        manifest = Manifest(
            snapshot_id=snapshot_id,
            batch_id=batch_id,
            offset_lo=offset_lo,
            offset_hi=offset_hi,
            tables=new_tables,
            schemas=new_schemas,
            stats=stats or {},
        )
        mpath = os.path.join(self.root, "manifests", f"manifest-{snapshot_id}.json")
        with open(mpath + ".tmp", "w") as fh:
            fh.write(manifest.to_json())
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(mpath + ".tmp", mpath)
        self._flip_current(snapshot_id)  # ← the commit point
        return manifest

    # --- maintenance ----------------------------------------------------------

    def vacuum(self) -> int:
        """Remove data directories not referenced by the current manifest
        (orphans from crashed commits or superseded snapshots)."""
        manifest = self.read_manifest()
        live: set[str] = set()
        if manifest:
            for entry in manifest.tables.values():
                for files in entry.values():
                    for f in files:
                        live.add(os.path.normpath(f))
        removed = 0
        data_root = os.path.join(self.root, "data")
        for table in ALL_TABLES:
            tdir = os.path.join(data_root, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                sdir = os.path.join(tdir, snap)
                keep = any(l.startswith(os.path.normpath(sdir)) for l in live)
                if not keep:
                    shutil.rmtree(sdir, ignore_errors=True)
                    removed += 1
        return removed
