"""Event-time tumbling windows with watermark-based late-data handling.

The reference has no event-time logic (SURVEY.md §2.2 — NiFi gives
at-least-once queue semantics); the engine adds the standard Structured
Streaming pattern for metrics over the change stream:

- ``windowed_counts`` — batch analog (groupBy ``F.window``): DuckDB
  time_bucket oracle-expressible.
- ``windowed_counts_stream`` — streaming: ``withWatermark`` bounds state
  and drops events later than the threshold; append mode emits a window
  only once the watermark passes its end (exactly-once-friendly: closed
  windows never change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, *, window: str = "10 minutes",
                    ts_col: str = "ts", group_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Tumbling-window aggregate (batch)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col).cast("timestamp"), window).alias("w"),
            group_col,
        )
        .agg(F.count(F.lit(1)).alias("n"),
             # decimal sum — see ops/sessions.py: deterministic rounding
             F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
             .cast("double").alias("total_value"),
             # per-row floor-micro BIGINT sum — the cross-engine hash-safe
             # variant (see ops/sessions.py total_micros)
             F.sum(F.expr(f"floor({value_col} * 1000000.0D + 0.5D)"))
             .alias("total_micros"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col, "n", "total_value", "total_micros",
        )
    )


def windowed_counts_stream(events: DataFrame, *, window: str = "10 minutes",
                           watermark: str = "30 minutes",
                           ts_col: str = "ts", group_col: str = "event_type",
                           value_col: str = "value") -> DataFrame:
    """Streaming variant: watermark bounds the window state and defines the
    late-data cutoff; append-mode output holds only finalized windows."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
             .cast("double").alias("total_value"),
             F.sum(F.expr(f"floor({value_col} * 1000000.0D + 0.5D)"))
             .alias("total_micros"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col, "n", "total_value", "total_micros",
        )
    )
