"""Sessionization: gap-based user sessions over an event stream.

Two implementations of the same semantics (events of one user belong to
the same session while consecutive gaps are < ``gap``):

- ``sessionize`` — batch: lag window → gap flags → running sum as session
  index → aggregate.  Pure Catalyst; DuckDB-oracle-expressible.
- ``sessionize_stream`` — streaming: ``applyInPandasWithState`` keeps one
  open session per user across micro-batches (GroupStateTimeout on the
  processing clock flushes idle users) — the custom-stateful-operator
  pattern (SURVEY.md §2.2 streaming row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType, TimestampType,
)

SESSION = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_idx", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("start_ts", TimestampType(), True),
        StructField("end_ts", TimestampType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Batch sessionization (one shuffle on user_id; both windows share it)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    with_gap = events.withColumn(
        "_gap",
        F.when(
            F.col(ts_col).cast("timestamp").cast("long")
            - F.lag(F.col(ts_col).cast("timestamp").cast("long")).over(w)
            > gap_minutes * 60,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_session = with_gap.withColumn(
        "session_idx",
        F.sum("_gap").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            # decimal sum: double addition is order-dependent in the last
            # ulp, so round(sum(double), 2) can flip on a half-cent boundary
            # between runs/plans; quantizing each value to decimal(18,6)
            # first makes the sum exact and the rounding deterministic.
            # NOTE: the final decimal→double cast is still engine-specific
            # in its last ulp (Java correctly-rounded vs e.g. DuckDB's
            # scaled-int float multiply) — anything that HASHES this column
            # across engines must compare integer cents instead (the
            # contract query re-casts to decimal(18,2)*100 → bigint)
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
            .cast("double").alias("total_value"),
            # integer micro-units via ONE identical IEEE op per row
            # (floor(v*1e6+0.5) — double mult, double add, floor); summing
            # BIGINTs keeps every double/decimal conversion off any
            # cross-engine hash surface (VERDICT r3 #2)
            F.sum(F.expr(f"floor({value_col} * 1000000.0D + 0.5D)"))
            .alias("total_micros"),
        )
    )


def _stream_fn(gap_minutes: int):
    gap_s = gap_minutes * 60

    # total_value accumulates in integer MICRO-units (value quantized to
    # 6 dp), mirroring the batch variant's decimal(18,6) sum exactly —
    # float accumulation is order-dependent in the last ulp and could
    # round a half-cent boundary differently from the batch path
    def _micros(value: float) -> int:
        return int(round(float(value) * 1_000_000))

    def _emit_total(total_micro: int) -> float:
        return round(total_micro / 1_000_000, 2)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                idx, n, start, end, total_micro = state.get
                state.remove()
                yield pd.DataFrame(
                    [{"user_id": user_id, "session_idx": idx, "n_events": n,
                      "start_ts": pd.Timestamp(start, unit="us"),
                      "end_ts": pd.Timestamp(end, unit="us"),
                      "total_value": _emit_total(total_micro)}]
                )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            idx, n, start, end, total_micro = state.get
        else:
            idx, n, start, end, total_micro = 0, 0, None, None, 0
        out = []
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if n and ts_us - end > gap_s * 1_000_000:
                out.append({"user_id": user_id, "session_idx": idx,
                            "n_events": n,
                            "start_ts": pd.Timestamp(start, unit="us"),
                            "end_ts": pd.Timestamp(end, unit="us"),
                            "total_value": _emit_total(total_micro)})
                idx, n, start, end, total_micro = idx + 1, 0, None, None, 0
            if n == 0:
                start = ts_us
            n += 1
            end = ts_us
            total_micro += _micros(value)
        state.update((idx, n, start, end, total_micro))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(out)

    return update


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization with applyInPandasWithState: emits a session
    row when a user's gap closes it (or the state times out).  ``events``
    must be a streaming DataFrame with (user_id, ts, value)."""
    state_schema = StructType(
        [
            StructField("session_idx", LongType()),
            StructField("n_events", LongType()),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            # integer micro-units — exact, mirrors the batch decimal sum
            StructField("total_micro", LongType()),
        ]
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _stream_fn(gap_minutes),
            outputStructType=SESSION,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
