"""Event sessionization + as-of join (event-stream analytics tier).

Sessionize is the event-level twin of the gaps-and-islands region
condenser (operators/condense.py, reference A1 semantics,
code/dedup2.py:329-352): a new island starts when the gap to the
previous event exceeds the timeout; a running sum of the start flags
numbers the islands. As-of join attaches, to each left event, the most
recent right event at-or-before it per key — Spark has no native ASOF
operator, so it is composed from a union + one running-window pass
(the standard merge trick), which costs exactly ONE shuffle on the key,
same as a plain join.

Time arithmetic is integer-microsecond DIFFERENCES
(``timestampdiff(MICROSECOND, ...)``; DuckDB twin
``date_diff('microsecond', ...)``): exact (second-truncation would
mis-bucket sub-second gaps) and timezone-independent, which matters
because the testdata ``ts`` is TIMESTAMP_NTZ — epoch-based arithmetic
(``unix_micros``) rejects NTZ inputs outright.

Scale shape: both operators shuffle once on the entity key and stream a
single ordered window pass per partition — the canonical distributed
sessionize. Hot entities bound the partition (max events/user, not
users x events); beyond that, split sessions by (key, day) pre-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "asof_join"]


def sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Add ``session_idx`` (1-based per user): a session breaks when the
    gap to the previous event exceeds ``gap_seconds`` (strictly greater,
    in exact microseconds)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    with_prev = events.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w))
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    is_new = (
        F.col("_prev_ts").isNull() | (gap_us > F.lit(gap_seconds * 1_000_000))
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return with_prev.withColumn("session_idx", F.sum(is_new).over(run)).drop(
        "_prev_ts"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, the most recent right row with
    ``right.ts <= left.ts`` in the same ``by`` group (backward-inclusive,
    DuckDB ``ASOF JOIN`` semantics); NULLs where no right row precedes.

    Right rows must be unique per (by, ts) — with duplicates the winner
    would be ordering-dependent; dedupe upstream. Composition: tag sides,
    union, one running ``last(ignorenulls)`` window ordered by
    (ts, side) with right-before-left at ties, filter back to left rows.
    """
    r = right.select(
        by, ts_col, *[F.col(c).alias(f"{prefix}{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(
            f"{prefix}{c}", F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        )
    return u.where(F.col("_side") == 1).drop("_side")
