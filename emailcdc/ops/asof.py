"""As-of join — for each left row, the most recent right row at or before
its timestamp, per key.  Spark has no native ASOF JOIN; the scalable
formulation is the union trick:

    tag both sides → union → ONE shuffle on (key) → window ordered by
    (ts, right-before-left tiebreak) → last_value of the right side's
    payload, ignoring nulls → keep left rows.

This is O(n log n) per key with a single exchange — unlike the naive
range-join (O(left × right) pairs) or a per-key collect.  DuckDB's native
ASOF JOIN serves as the correctness oracle (inequality ``>=``: ties take
the right row at exactly the left timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              value_cols: list[str], suffix: str = "_right") -> DataFrame:
    """left ⟕asof right ON left.on >= right.on, matched per ``by`` key.

    Returns every left row plus ``value_cols`` from the latest right row
    (nulls when no right row precedes).  ``on`` columns must be mutually
    comparable (cast upstream)."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(by), F.col(on),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp → a right row
    # AT the left timestamp is visible to it (>= semantics, like DuckDB ASOF)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Fill from the newest preceding right ROW, not per-column last non-null:
    # filling each value column independently would backfill a stale value
    # from an older right row whenever the newest one is legitimately NULL
    # (ADVICE r1 — diverges from DuckDB ASOF, which selects the row and
    # projects its values even when NULL).  A struct is non-null iff the
    # row is a right row, so last(ignorenulls) picks the row wholesale.
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(c + suffix) for c in value_cols]),
    )
    filled = unioned.select(
        "*", F.last(rrow, ignorenulls=True).over(w).alias("_rrow"))
    out_cols = [c for c in left.columns] + [
        F.col("_rrow")[c + suffix].alias(c + suffix) for c in value_cols
    ]
    return filled.filter(F.col("_side") == 1).select(*out_cols)
