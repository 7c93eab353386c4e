"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

Both are implemented as compositions of existing DataFrame ops (the
preferred path — no Python in the pipeline), architected to scale:

- **as-of join** uses the union + partitioned-window algorithm: tag both
  sides, union them, sort within (key) by (time, side), and carry the last
  right-side row forward with a window ``last(ignorenulls)``.  Cost is one
  shuffle on the join key + one in-partition sort — NO range cross-product,
  no broadcast requirement, skew behaves like any window over the key.
- **sessionization** is the classic gap-based session assignment: a lag
  window marks session starts (gap > timeout), a running sum over the same
  window ordering numbers the sessions.  Two window passes over one
  shuffle-partitioning.

Both are exactly expressible in SQL (DuckDB: ASOF JOIN is a built-in; the
session trick is standard), so the driver oracle gates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    left_time: str,
    right_time: str,
    on_right: str | None = None,
    right_value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` for the same key (``direction='backward'``;
    ``'forward'`` matches the next right row instead).  Left rows with no
    match keep nulls (LEFT ASOF JOIN semantics).

    Ties: a right row at exactly left_time matches (<=); make the right side
    unique per (key, time) upstream for fully determined output.
    """
    on_right = on_right or on_left
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (on_right, right_time)
        ]

    # union with side tags: right rows sort BEFORE left rows at equal times
    # so <= semantics hold (backward); reversed for forward.
    lt = left.select(
        F.col(on_left).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in [right_time] + right_value_cols]).alias("s"))
            .schema["s"].dataType
        ).alias("_rrow"),
    )
    rt = right.select(
        F.col(on_right).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in [right_time] + right_value_cols]).alias("_rrow"),
    )
    unioned = lt.unionByName(rt)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_rrow", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_rrow", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = (
        unioned.withColumn("_match", carried)
        .where(F.col("_side") == 1)
        .select(
            *[F.col("_lrow")[c].alias(c) for c in left.columns],
            *[F.col("_match")[c].alias(f"asof_{c}") for c in [right_time] + right_value_cols],
        )
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: Column | int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap`` (same units as time_col).

    Output adds ``session_id`` (0-based per key) and ``is_session_start``.
    """
    order_cols = [F.col(time_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(time_col).over(w)
    is_start = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_id", F.sum("is_session_start").over(running) - 1
    )
