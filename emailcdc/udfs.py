"""Spark-side vectorized extraction stage.

One ``mapInPandas`` pass over a change-event micro-batch produces an
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
- Attachment bytes are emitted base64-in-string; at real scale you would
  emit BinaryType — kept string for DuckDB-oracle comparability.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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
    ]
)

_EXTRACT_COLS = ["offset", "repo", "path", "commit", "lang", "content"]


def _extract_partition(
    batches: Iterator[pd.DataFrame], error_strategy: str,
    missing_field_strategy: str = "empty",
    missing_field_substitution: str | None = None,
    has_folder: bool = False,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        folders = pdf["_folder"] if has_folder else [None] * len(pdf)
        for offset, repo, path, commit, lang, content, folder in zip(
            pdf["offset"], pdf["repo"], pdf["path"], pdf["commit"],
            pdf["lang"], pdf["content"], folders
        ):
            result = extract_event(
                repo, path, int(offset), commit, lang, content,
                error_strategy=error_strategy,
                missing_field_strategy=missing_field_strategy,
                missing_field_substitution=missing_field_substitution,
                folder_override=folder,
            )
            for m in result["messages"]:
                rows.append(("message", m, None, None, None))
            for a in result["attachments"]:
                rows.append(("attachment", None, a, None, None))
            for c in result["calendar_entries"]:
                rows.append(("calendar", None, None, c, None))
            for f in result["failures"]:
                rows.append(("failure", None, None, None, f))
        yield pd.DataFrame(
            rows, columns=["record_type", "message", "attachment", "calendar", "failure"]
        )


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
    return projected.mapInPandas(
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
    }
