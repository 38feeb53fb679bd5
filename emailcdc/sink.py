"""SnapshotParquetSink — an Iceberg-style multi-table MOR sink emulation.

No Iceberg runtime jar ships in this sandbox, so the engine implements the
contract Iceberg v2 gives (merge-on-read upserts + snapshot isolation +
safe schema evolution) behind a small interface a real
``iceberg-spark-runtime`` adapter can replace (SURVEY.md §4 item 2).

Design (merge-on-read, like Iceberg v2 position/equality deletes or Hudi
MOR — chosen over copy-on-write because a WAL tail whose keys spread over
the whole key space would otherwise rewrite the entire sink every batch):

- **Append-only delta commits.**  A batch commit writes, per table, one
  immutable delta dir of new rows stamped with ``_seq = batch_id`` and ONE
  shared *marks* file ``(repo, path, _seq, is_delete)`` covering every key
  the batch touched.  A commit reads NOTHING — O(batch), not O(sink).
- **LWW visibility at read.**  A row is visible iff its ``_seq`` equals
  the key's latest mark and that mark is not a delete.  All keyed tables
  share the marks (an upsert replaces ALL tables' rows for the key —
  the reference reprocesses the whole file, SURVEY.md §2.1 K1).
- **Compaction.**  When any bucket accumulates ≥ ``compact_every`` deltas,
  the commit folds old visible rows + the new batch into fresh base files
  and a single fresh marks file — amortized O(sink / compact_every) per
  batch, exactly Iceberg's rewrite_data_files maintenance.
- **Manifests + atomic pointer flip.**  Each commit writes
  ``manifests/manifest-<snapshot_id>.json`` (snapshot_id == batch_id →
  idempotent replay) and atomically replaces ``CURRENT`` (``os.replace``).
  A crash before the flip leaves only orphan files; ``vacuum()`` removes
  them.  Resume = read offsets off the CURRENT manifest.
- **Additive schema evolution.**  Parquet ``mergeSchema`` across
  base+delta files; commits diff the incoming schema against the
  manifest's recorded schema and reject type changes (Iceberg's
  safe-evolution default).

Tables: ``snapshot`` (live repos state), ``messages``, ``attachments``,
``calendar_entries`` (per-key detail rows, replaced on upsert) — keyed;
``failures``, ``lineage`` — append-only.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KEY = ["repo", "path"]
KEYED_TABLES = ("snapshot", "messages", "attachments", "calendar_entries")
APPEND_TABLES = ("failures", "lineage")
ALL_TABLES = KEYED_TABLES + APPEND_TABLES
SEQ = "_seq"


def bucket_expr(n_buckets: int):
    """Iceberg-style bucket transform on the upsert key."""
    return F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(n_buckets)).cast("int")


@dataclass
class EnvelopedDir:
    """An upsert handed to ``commit`` as data ALREADY ON DISK: a parquet
    dir whose rows hold the table's columns inside the struct column
    ``field`` (plus a top-level ``_seq``).  The engine's extraction stage
    writes the envelope once (flat — record_type is a data column) and
    registers the SAME dir once per table with a per-type row filter —
    the commit then writes NOTHING for these tables (zero-copy delta
    registration; the old path re-read and re-wrote the full multi-KB
    payload once per table per batch).  ``where`` is a Spark SQL
    predicate applied before unwrapping ``field`` (None = every row,
    the pre-flat layout where the dir was a record_type= subdir):
    reads prune to the table's own struct column + record_type via
    parquet column pruning, so the other types' payload bytes are
    never decoded."""
    dir: str
    field: str
    where: str | None = None
    # optional schema hint for the UNWRAPPED rows (table columns + _seq):
    # commit-time schema checks/merges then need NO file IO — without it
    # every check triggers a mergeSchema footer read of the stage dir
    # (~0.1-0.2 s each, 8 reads per commit measured)
    schema: "StructType | None" = None


@dataclass
class Manifest:
    snapshot_id: int
    batch_id: int
    offset_lo: int
    offset_hi: int
    # table -> list of data dirs (each dir = one commit's delta or a base)
    tables: dict = field(default_factory=dict)
    # list of marks files (key visibility journal), oldest→newest
    marks: list = field(default_factory=list)
    schemas: dict = field(default_factory=dict)
    stats: dict = field(default_factory=dict)
    delta_depth: int = 0  # deltas since last compaction
    # highest streaming epoch_id applied (None if never streamed): stream
    # idempotence is tracked HERE, decoupled from snapshot ids — epoch ids
    # and batch ids advance independently, so a compaction or batch replay
    # on the same sink can never collide with (and silently swallow) a
    # streaming epoch (ADVICE r1)
    last_epoch: int | None = None
    # identity of the streaming query that set last_epoch (the checkpoint's
    # query id): epoch ids only mean something within one checkpoint
    # lineage, so a cleared/fresh checkpoint (epochs restart at 0) or a
    # second query attached to the same sink gets a NEW id and a fresh
    # watermark namespace instead of silently dropping every epoch <=
    # last_epoch (ADVICE r2 — permanent data loss)
    stream_id: str | None = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Manifest":
        return Manifest(**json.loads(text))


class SnapshotParquetSink:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64,
                 compact_every: int = 8,
                 broadcast_key_limit: int = 1_000_000):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        # past this many keys per batch, compaction folds join batch_keys
        # by shuffle instead of broadcast (driver-sized broadcasts only)
        self.broadcast_key_limit = broadcast_key_limit
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

    def _marks_df(self, manifest: Manifest) -> DataFrame | None:
        if not manifest.marks:
            return None
        return self.spark.read.parquet(*manifest.marks)

    def _latest_marks(self, manifest: Manifest) -> DataFrame | None:
        """Latest mark per key: (repo, path, _seq, is_delete)."""
        marks = self._marks_df(manifest)
        if marks is None:
            return None
        w = Window.partitionBy(*KEY).orderBy(F.desc(SEQ))
        return (
            marks.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _read_dirs(self, entries: list) -> DataFrame | None:
        """Union a table's registered data dirs.  Each entry is either a
        plain dir path (rows hold the table columns directly) or an
        enveloped entry ``{"dir": d, "field": f[, "where": p]}`` (rows
        hold them inside struct ``f``; ``_seq`` is top-level; ``p`` is a
        row predicate for flat envelope dirs) — see EnvelopedDir."""
        if not entries:
            return None
        plain = [e for e in entries if isinstance(e, str)]
        env = [e for e in entries if not isinstance(e, str)]
        frames = []
        if plain:
            frames.append(self.spark.read.option("mergeSchema", "true")
                          .parquet(*plain))
        # enveloped dirs sharing a (field, where) can be read in one pass
        by_field: dict[tuple, list[str]] = {}
        for e in env:
            by_field.setdefault((e["field"], e.get("where")), []).append(e["dir"])
        for (field, where), dirs in by_field.items():
            f = self.spark.read.option("mergeSchema", "true").parquet(*dirs)
            if where:
                f = f.filter(where)
            frames.append(f.select(f"{field}.*", SEQ))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def read_table(self, table: str, buckets: list[int] | None = None,
                   with_seq: bool = False) -> DataFrame | None:
        """Current visible snapshot of a table (MOR merge of base+deltas)."""
        manifest = self.read_manifest()
        if manifest is None or table not in manifest.tables:
            return None
        rows = self._read_dirs(manifest.tables[table])
        if rows is None:
            return None
        if table in APPEND_TABLES:
            return rows.drop(SEQ) if SEQ in rows.columns and not with_seq else rows
        if buckets is not None:
            rows = rows.filter(bucket_expr(self.n_buckets).isin(buckets))
        latest = self._latest_marks(manifest)
        if latest is not None:
            live = latest.filter(~F.col("is_delete")).select(
                *KEY, F.col(SEQ).alias("_live_seq"))
            rows = (
                rows.join(live, on=KEY, how="inner")
                .filter(F.col(SEQ) == F.col("_live_seq"))
                .drop("_live_seq")
            )
        if not with_seq:
            rows = rows.drop(SEQ)
        return rows.drop("_bucket") if "_bucket" in rows.columns else rows

    # --- schema evolution ----------------------------------------------------

    @staticmethod
    def _check_schema(prev_schema_json: str | None, new_schema) -> None:
        """Additive-only evolution: reject type changes for same-named
        columns (new columns are fine — parquet mergeSchema unions them;
        old rows read as null)."""
        if not prev_schema_json:
            return
        from pyspark.sql.types import StructType
        prev = StructType.fromJson(json.loads(prev_schema_json))
        prev_types = {f.name: f.dataType.simpleString() for f in prev.fields}
        for f in new_schema.fields:
            old = prev_types.get(f.name)
            if old is not None and old != f.dataType.simpleString():
                raise ValueError(
                    f"unsafe schema evolution on '{f.name}': {old} → "
                    f"{f.dataType.simpleString()}")

    @staticmethod
    def _merged_schema_json(prev_schema_json: str | None, new_schema) -> str:
        if not prev_schema_json:
            return new_schema.json()
        from pyspark.sql.types import StructType
        prev = StructType.fromJson(json.loads(prev_schema_json))
        names = {f.name for f in prev.fields}
        merged = StructType(list(prev.fields) +
                            [f for f in new_schema.fields if f.name not in names])
        return merged.json()

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
        batch_keys: DataFrame | None = None,
        append_rows: dict[str, tuple[list, object]] | None = None,
        marks: DataFrame | None = None,
        epoch: int | None = None,
        stream_id: str | None = None,
        approx_batch_keys: int | None = None,
    ) -> Manifest:
        """MOR-commit a batch and atomically publish snapshot ``batch_id``.

        ``upserts[table]`` rows replace ALL existing rows for their key
        (visibility via the shared marks journal); ``delete_keys`` removes
        keys.  Writes are pure appends; every ``compact_every`` commits the
        sink is folded into fresh base files instead.
        """
        prev = self.read_manifest()
        snapshot_id = batch_id
        appends = appends or {}
        append_rows = append_rows or {}
        # broadcast guard for the fold joins below: callers that know the
        # batch size (the engine passes its event count, an upper bound on
        # touched keys) disable broadcast past broadcast_key_limit
        self._fold_broadcast_ok = (
            approx_batch_keys is None
            or approx_batch_keys <= self.broadcast_key_limit)
        compacting = prev is not None and prev.delta_depth + 1 >= self.compact_every

        # ---- marks: one row per touched key, delete-flagged.  Callers that
        # already hold a deduped per-key frame (the engine's LWW winners)
        # pass `marks` directly; otherwise it is derived from
        # upserts/delete_keys.
        if marks is None:
            if batch_keys is None:
                frames = [df.select(*KEY) for df in upserts.values()]
                if delete_keys is not None:
                    frames.append(delete_keys.select(*KEY))
                batch_keys = None
                for kf in frames:
                    batch_keys = kf if batch_keys is None else batch_keys.unionByName(kf)
                if batch_keys is not None:
                    batch_keys = batch_keys.distinct()
            if batch_keys is not None:
                if delete_keys is not None:
                    marks = batch_keys.join(
                        delete_keys.select(*KEY).withColumn("is_delete", F.lit(True)),
                        on=KEY, how="left",
                    ).select(
                        *KEY, F.lit(batch_id).cast("long").alias(SEQ),
                        F.coalesce("is_delete", F.lit(False)).alias("is_delete"),
                    )
                else:
                    marks = batch_keys.select(
                        *KEY, F.lit(batch_id).cast("long").alias(SEQ),
                        F.lit(False).alias("is_delete"),
                    )

        new_tables: dict[str, list[str]] = {}
        new_schemas: dict[str, str] = {}
        marks_list = list(prev.marks) if prev else []
        marks_dir = os.path.join(self.root, "data", "_marks", f"snap-{snapshot_id}")
        batch_keys = marks.select(*KEY) if marks is not None else batch_keys

        def _stamped_frame(val) -> DataFrame:
            """Upsert rows with the SEQ stamp, whatever form they arrived in."""
            if isinstance(val, EnvelopedDir):
                # the engine stamped SEQ when it wrote the envelope
                return self._read_dirs([{"dir": val.dir, "field": val.field,
                                         "where": val.where}])
            return val.withColumn(SEQ, F.lit(batch_id).cast("long"))

        def _stamped_schema(val):
            """Schema of _stamped_frame(val) without file IO when the
            EnvelopedDir carries its schema hint."""
            if isinstance(val, EnvelopedDir) and val.schema is not None:
                return val.schema
            return _stamped_frame(val).schema

        def _write_keyed(table: str, val, out_dir: str) -> None:
            stamped = _stamped_frame(val)
            if compacting:
                old_visible = self._visible_before(prev, table, batch_keys)
                if old_visible is not None:
                    stamped = old_visible.unionByName(stamped, allowMissingColumns=True)
            # `_bucket` is a clustered data column (NOT partitionBy: multiple
            # delta roots with hive-style subdirs trip Spark's partition
            # discovery).  Only COMPACTION folds repartition-cluster on it —
            # those produce the long-lived base files whose parquet min/max
            # stats give row-group skipping for bucket-pruned reads.  Delta
            # commits skip the repartition: clustering a short-lived delta
            # would shuffle the full payload (multi-KB content rows) four
            # times per batch for files the next fold rewrites anyway.
            stamped = stamped.withColumn("_bucket", bucket_expr(self.n_buckets))
            if compacting:
                stamped = stamped.repartition(min(self.n_buckets, 32), "_bucket")
            stamped.write.mode("overwrite").parquet(out_dir)

        def _has_parquet(d: str) -> bool:
            return any(f.endswith(".parquet")
                       for _, _, files in os.walk(d) for f in files)

        # Submit the per-table writes concurrently: each is an independent
        # Spark action reading the shared staged/cached inputs, so running
        # them from a small thread pool overlaps job scheduling and keeps
        # the executor busy instead of draining 4-6 jobs back-to-back.
        # EnvelopedDir upserts on a NON-compacting commit write nothing at
        # all — the staged dir itself is registered as the delta.
        from concurrent.futures import ThreadPoolExecutor

        futures = {}
        with ThreadPoolExecutor(max_workers=4) as pool:
            for table in KEYED_TABLES:
                prev_schema = prev.schemas.get(table) if prev else None
                val = upserts.get(table)
                out_dir = os.path.join(self.root, "data", table,
                                       f"snap-{snapshot_id}")
                if val is None:
                    continue
                self._check_schema(prev_schema, _stamped_schema(val))
                if isinstance(val, EnvelopedDir) and not compacting:
                    continue  # zero-copy registration below
                futures[table] = pool.submit(_write_keyed, table, val, out_dir)
        for table in KEYED_TABLES:
            prev_dirs = list(prev.tables.get(table, [])) if prev else []
            prev_schema = prev.schemas.get(table) if prev else None
            val = upserts.get(table)
            out_dir = os.path.join(self.root, "data", table, f"snap-{snapshot_id}")
            if val is None:
                new_tables[table] = prev_dirs
                if prev_schema:
                    new_schemas[table] = prev_schema
                continue
            if isinstance(val, EnvelopedDir) and not compacting:
                entry = {"dir": val.dir, "field": val.field,
                         "where": val.where}
                new_tables[table] = (prev_dirs + [entry]
                                     if _has_parquet(val.dir) else prev_dirs)
            else:
                futures[table].result()  # surface write errors here
                # an all-empty write leaves no parquet files — don't register
                # a dir Spark can't infer a schema from
                if _has_parquet(out_dir):
                    new_tables[table] = [out_dir] if compacting else prev_dirs + [out_dir]
                else:
                    new_tables[table] = [] if compacting else prev_dirs
            new_schemas[table] = self._merged_schema_json(
                prev_schema, _stamped_schema(val))

        # ---- marks write (after table data, before manifest)
        if marks is not None:
            if compacting:
                # fold: latest live marks for keys NOT in this batch + this batch's.
                # Folded marks cover the FULL live key set — at 10^9 sink keys a
                # fixed repartition(4) would write 4 quarter-billion-row tasks;
                # cluster on the same bucket count as the data folds instead.
                latest = self._latest_marks(prev) if prev else None
                folded = marks
                if latest is not None:
                    keep = latest.filter(~F.col("is_delete")).join(
                        self._maybe_broadcast(batch_keys), on=KEY, how="left_anti")
                    folded = keep.unionByName(marks)
                folded.repartition(min(self.n_buckets, 32)).write \
                    .mode("overwrite").parquet(marks_dir)
                marks_list = [marks_dir]
            else:
                # delta marks: one file per ~1M keys — a single partition is
                # one straggler task (and one giant row group) at the
                # documented 10^7-event batch size
                n_parts = max(1, min(16, -(-(approx_batch_keys or 1) // 1_000_000)))
                marks.repartition(n_parts).write.mode("overwrite").parquet(marks_dir)
                marks_list = marks_list + [marks_dir]

        for table in APPEND_TABLES:
            prev_dirs = list(prev.tables.get(table, [])) if prev else []
            rows = appends.get(table)
            local = append_rows.get(table)
            out_dir = os.path.join(self.root, "data", table, f"snap-{snapshot_id}")
            if isinstance(rows, EnvelopedDir):
                if _has_parquet(rows.dir):
                    entry = {"dir": rows.dir, "field": rows.field,
                             "where": rows.where}
                    new_tables[table] = prev_dirs + [entry]
                    new_schemas[table] = self._merged_schema_json(
                        prev.schemas.get(table) if prev else None,
                        rows.schema if rows.schema is not None
                        else self._read_dirs([entry]).schema)
                else:
                    new_tables[table] = prev_dirs
                    if prev and table in prev.schemas:
                        new_schemas[table] = prev.schemas[table]
            elif local is not None and local[0]:
                row_list, schema = local
                os.makedirs(out_dir, exist_ok=True)
                self._write_local_parquet(
                    os.path.join(out_dir, "part-0.parquet"), row_list, schema)
                new_tables[table] = prev_dirs + [out_dir]
                new_schemas[table] = schema.json()
            elif rows is not None and not rows.isEmpty():
                rows.write.mode("overwrite").parquet(out_dir)
                new_tables[table] = prev_dirs + [out_dir]
                new_schemas[table] = rows.schema.json()
            else:
                new_tables[table] = prev_dirs
                if prev and table in prev.schemas:
                    new_schemas[table] = prev.schemas[table]

        manifest = Manifest(
            snapshot_id=snapshot_id,
            batch_id=batch_id,
            offset_lo=offset_lo,
            offset_hi=offset_hi,
            tables=new_tables,
            marks=marks_list,
            schemas=new_schemas,
            stats=stats or {},
            delta_depth=0 if compacting else (prev.delta_depth + 1 if prev else 1),
            # non-streaming commits carry the watermark forward so a stream
            # can resume after interleaved batch replays / compactions
            last_epoch=epoch if epoch is not None
            else (prev.last_epoch if prev else None),
            stream_id=stream_id if epoch is not None
            else (prev.stream_id if prev else None),
        )
        mpath = os.path.join(self.root, "manifests", f"manifest-{snapshot_id}.json")
        with open(mpath + ".tmp", "w") as fh:
            fh.write(manifest.to_json())
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(mpath + ".tmp", mpath)
        self._flip_current(snapshot_id)  # ← the commit point
        return manifest

    def _visible_before(self, prev: Manifest, table: str,
                        batch_keys: DataFrame | None) -> DataFrame | None:
        """Visible rows of ``table`` at the previous snapshot, minus keys
        replaced by the current batch (used by compaction folds)."""
        rows = self._read_dirs(prev.tables.get(table, []))
        if rows is None:
            return None
        if "_bucket" in rows.columns:
            rows = rows.drop("_bucket")
        latest = self._latest_marks(prev)
        if latest is not None:
            live = latest.filter(~F.col("is_delete")).select(
                *KEY, F.col(SEQ).alias("_live_seq"))
            rows = (
                rows.join(live, on=KEY, how="inner")
                .filter(F.col(SEQ) == F.col("_live_seq"))
                .drop("_live_seq")
            )
        if batch_keys is not None:
            rows = rows.join(self._maybe_broadcast(batch_keys),
                             on=KEY, how="left_anti")
        return rows

    def _maybe_broadcast(self, df: DataFrame) -> DataFrame:
        """Broadcast only driver-sized batch-key frames (see commit())."""
        if getattr(self, "_fold_broadcast_ok", True):
            return F.broadcast(df)
        return df

    @staticmethod
    def _write_local_parquet(path: str, rows: list[dict], spark_schema) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        cols = {f.name: [r.get(f.name) for r in rows] for f in spark_schema.fields}
        table = pa.Table.from_pydict(cols, schema=arrow_schema)
        pq.write_table(table, path)

    def manifests_df(self) -> DataFrame:
        """The commit-manifest journal as a DataFrame (control-table view:
        batch ids, offset ranges, per-batch stats — north rule's metrics).
        Reads every manifest file, committed or superseded."""
        import glob

        rows = []
        for path in sorted(glob.glob(os.path.join(self.root, "manifests", "manifest-*.json"))):
            with open(path) as fh:
                m = Manifest.from_json(fh.read())
            rows.append(
                {
                    "snapshot_id": m.snapshot_id,
                    "batch_id": m.batch_id,
                    "offset_lo": m.offset_lo,
                    "offset_hi": m.offset_hi,
                    "delta_depth": m.delta_depth,
                    "event_count": m.stats.get("event_count"),
                    "upsert_count": m.stats.get("upsert_count"),
                    "delete_count": m.stats.get("delete_count"),
                    "hot_repos": m.stats.get("hot_repos") or [],
                }
            )
        schema = ("snapshot_id long, batch_id long, offset_lo long, offset_hi long,"
                  " delta_depth int, event_count long, upsert_count long,"
                  " delete_count long, hot_repos array<string>")
        return self.spark.createDataFrame(rows, schema)

    # --- maintenance ----------------------------------------------------------

    def compact_now(self, batch_id: int) -> Manifest:
        """Force a fold of all deltas into fresh bases (no new data)."""
        prev = self.read_manifest()
        if prev is None:
            raise ValueError("nothing to compact")
        old_every = self.compact_every
        self.compact_every = 0  # force
        try:
            empty_keys = self.spark.createDataFrame([], "repo string, path string")
            return self.commit(
                batch_id=batch_id, offset_lo=prev.offset_lo,
                offset_hi=prev.offset_hi,
                upserts={t: self.spark.createDataFrame(
                    [], self.read_table(t).schema) for t in KEYED_TABLES
                    if prev.tables.get(t)},
                delete_keys=None, batch_keys=empty_keys,
                stats={"compaction": True},
            )
        finally:
            self.compact_every = old_every

    @staticmethod
    def _dir_commit_id(name: str) -> int | None:
        """Trailing commit id of a data dir name (``snap-N``/``batch-N``)."""
        tail = name.rsplit("-", 1)[-1]
        return int(tail) if tail.isdigit() else None

    def vacuum(self, quiesced: bool = False) -> int:
        """Remove data directories not referenced by the current manifest
        (orphans from crashed commits or superseded snapshots).

        Dirs whose commit id EXCEEDS the current snapshot id are in-flight —
        an active replay/stream writes data/.../snap-N (and the envelope
        batch-N) BEFORE flipping CURRENT to N, so a concurrent vacuum must
        skip them or the subsequent commit registers deleted data (ADVICE
        r2: manifest permanently referencing a missing envelope dir).
        Pass ``quiesced=True`` only when no writer is active: it also
        collects above-CURRENT orphans (abandoned crashed commits)."""
        manifest = self.read_manifest()
        current = (float("inf") if quiesced
                   else (manifest.snapshot_id if manifest else 0))
        live: set[str] = set()
        if manifest:
            for dirs in manifest.tables.values():
                for d in dirs:
                    path = d if isinstance(d, str) else d["dir"]
                    live.add(os.path.normpath(path))
            for d in manifest.marks:
                live.add(os.path.normpath(d))
        removed = 0
        data_root = os.path.join(self.root, "data")
        for table in list(ALL_TABLES) + ["_marks"]:
            tdir = os.path.join(data_root, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                sdir = os.path.join(tdir, snap)
                cid = self._dir_commit_id(snap)
                if cid is not None and cid > current:
                    continue  # in-flight commit
                if os.path.normpath(sdir) not in live:
                    shutil.rmtree(sdir, ignore_errors=True)
                    removed += 1
        # enveloped staging: a batch dir is live while the manifest
        # references it directly (flat layout) or ANY of its record_type=
        # subdirs (pre-flat layout)
        env_root = os.path.join(data_root, "_envelope")
        if os.path.isdir(env_root):
            for batch in os.listdir(env_root):
                bdir = os.path.join(env_root, batch)
                cid = self._dir_commit_id(batch)
                if cid is not None and cid > current:
                    continue  # in-flight batch
                if os.path.normpath(bdir) in live:
                    continue
                subs = [os.path.normpath(os.path.join(bdir, s))
                        for s in os.listdir(bdir)] if os.path.isdir(bdir) else []
                if not any(s in live for s in subs):
                    shutil.rmtree(bdir, ignore_errors=True)
                    removed += 1
        return removed
