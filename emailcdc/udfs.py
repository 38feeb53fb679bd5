"""Spark-side vectorized extraction stage.

One ``mapInArrow`` pass over a change-event micro-batch produces an
*envelope* DataFrame carrying all four output record kinds (message /
attachment / calendar / failure) as nullable structs — the Spark analog of
the reference's multi-relationship fan-out (AbstractExtractEmailProcessor
.java:16-32, SURVEY.md §2.1 R1) without parsing the content four times.
Callers persist the envelope and split it with cheap filters.

Scale notes (100 TB design):
- Only ``offset, repo, path, commit, lang, content`` cross the Arrow
  boundary — project before calling (keeps the Python worker payload
  minimal; Catalyst prunes the parquet scan to those columns).
- The pass is embarrassingly parallel: no shuffle is introduced here; the
  caller controls partitioning (salted repartition for hot repos happens
  upstream in engine.py).
- Output rows are assembled COLUMNARLY and handed to Arrow directly
  (``pa.array`` on per-type record lists → one RecordBatch), skipping the
  pandas object-column round trip entirely — pandas→Arrow struct
  conversion was ~35% of the parse stage's wall time (VERDICT r2 #6).
- Attachment bytes are emitted as BinaryType (the reference's
  FlowFile-content model, AbstractJavaMailProcessor.java:266-288);
  ``attachments_b64_view`` provides the base64 string projection for
  DuckDB-oracle-facing contract queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

from . import schemas
from .extract import extract_event

ENVELOPE = StructType(
    [
        StructField("record_type", StringType(), False),
        StructField("message", schemas.MESSAGES, True),
        StructField("attachment", schemas.ATTACHMENTS, True),
        StructField("calendar", schemas.CALENDAR_ENTRIES, True),
        StructField("failure", schemas.FAILURES, True),
        # one snapshot row per upsert event (the MERGE target), so the
        # commit registers the snapshot delta zero-copy too — sha256 runs
        # here (hashlib, C-speed) instead of a second JVM pass over the
        # cached winners at commit time (VERDICT r2 #9)
        StructField("snapshot", schemas.SNAPSHOT, True),
    ]
)

_EXTRACT_COLS = ["offset", "repo", "path", "commit", "lang", "content"]


def _arrow_envelope_schema() -> "pa.Schema":
    from pyspark.sql.pandas.types import to_arrow_schema
    return to_arrow_schema(ENVELOPE)


def _extract_partition(
    batches: Iterator["pa.RecordBatch"], error_strategy: str,
    missing_field_strategy: str = "empty",
    missing_field_substitution: str | None = None,
    has_folder: bool = False,
) -> Iterator["pa.RecordBatch"]:
    arrow_schema = _arrow_envelope_schema()
    types = {f.name: f.type for f in arrow_schema}
    for batch in batches:
        col = {n: batch.column(n).to_pylist()
               for n in ("offset", "repo", "path", "commit", "lang", "content")}
        folders = (batch.column("_folder").to_pylist() if has_folder
                   else [None] * batch.num_rows)
        # columnar assembly: one list per envelope column, dicts straight
        # into pa.array (C++-side struct building — no pandas objects)
        rts: list[str] = []
        cols: dict[str, list] = {"message": [], "attachment": [],
                                 "calendar": [], "failure": [],
                                 "snapshot": []}
        for offset, repo, path, commit, lang, content, folder in zip(
            col["offset"], col["repo"], col["path"], col["commit"],
            col["lang"], col["content"], folders
        ):
            result = extract_event(
                repo, path, int(offset), commit, lang, content,
                error_strategy=error_strategy,
                missing_field_strategy=missing_field_strategy,
                missing_field_substitution=missing_field_substitution,
                folder_override=folder,
            )
            result["snapshot"] = [{
                "repo": repo, "path": path, "commit": commit, "lang": lang,
                "content_sha256": (hashlib.sha256(content.encode()).hexdigest()
                                   if content is not None else None),
                "last_offset": int(offset),
            }]
            for kind, key in (("message", "messages"),
                              ("attachment", "attachments"),
                              ("calendar", "calendar_entries"),
                              ("failure", "failures"),
                              ("snapshot", "snapshot")):
                for rec in result[key]:
                    rts.append(kind)
                    for c in cols:
                        cols[c].append(rec if c == kind else None)
        arrays = [pa.array(rts, type=pa.string())]
        arrays += [pa.array(cols[c], type=types[c])
                   for c in ("message", "attachment", "calendar",
                             "failure", "snapshot")]
        yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def extract_envelope(events: DataFrame, error_strategy: str = "continue",
                     missing_field_strategy: str = "empty",
                     missing_field_substitution: str | None = None,
                     folder_expression: str | None = None) -> DataFrame:
    """events(offset,repo,path,commit,lang,content,...) → envelope frame.

    ``folder_expression`` — FOLDER_IDENTIFIER as a Spark SQL expression
    over the event columns (e.g. ``concat(repo, '/', path)``), evaluated
    JVM-side BEFORE the Arrow boundary so the Python worker receives the
    finished string (AbstractJavaMailProcessor.java:58-67 EL analog)."""
    cols = list(_EXTRACT_COLS)
    if folder_expression is not None:
        projected = events.select(
            *cols, F.expr(folder_expression).cast("string").alias("_folder"))
    else:
        projected = events.select(*cols)
    return projected.mapInArrow(
        lambda it: _extract_partition(
            it, error_strategy, missing_field_strategy,
            missing_field_substitution, folder_expression is not None),
        schema=ENVELOPE,
    )


def split_envelope(envelope: DataFrame) -> dict[str, DataFrame]:
    """Envelope → the four typed output frames (reference relationships)."""
    return {
        "messages": envelope.filter(F.col("record_type") == "message").select("message.*"),
        "attachments": envelope.filter(F.col("record_type") == "attachment").select("attachment.*"),
        "calendar_entries": envelope.filter(F.col("record_type") == "calendar").select("calendar.*"),
        "failures": envelope.filter(F.col("record_type") == "failure").select("failure.*"),
        "snapshot": envelope.filter(F.col("record_type") == "snapshot").select("snapshot.*"),
    }


def attachments_b64_view(attachments: DataFrame) -> DataFrame:
    """Oracle-facing contract view of the attachments table: the raw
    BinaryType ``content`` column projected as base64 text
    (``content_b64``) so string-only comparison surfaces (DuckDB oracles,
    JSON exports) can consume it.  The base table keeps raw bytes — the
    +33% base64 tax is paid only where a string is actually required,
    never on the table's own scans/shuffles."""
    return attachments.withColumn(
        "content_b64", F.base64("content")).drop("content")
