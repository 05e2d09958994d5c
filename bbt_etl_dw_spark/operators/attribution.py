"""Marketing-touch attribution over an event stream: credit each
conversion event to the nearest qualifying touch event of the same user
(last-touch or first-touch), subject to a lookback window.

Reference scope: the reference's event pipeline stops at per-type
aggregation (SURVEY §2.4); attribution is the next question a revenue
dashboard asks of the same table.

Scale design: ONE user-keyed shuffle. Touches and conversions ride the
same partitioning — the "nearest preceding touch" is a running
``last(..., ignorenulls=True)`` over a rows-frame window, not a
self-join (the naive events⋈events formulation shuffles the fact twice
and explodes on active users). The channel aggregation that follows is
dim-sized (channels × anything). Timestamps compare as epoch
microseconds (``unix_micros``) so no session timezone or interval
semantics can touch the lookback test, and ordering ties break on the
event id for run-to-run determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIRECT = "direct"  # conversions with no qualifying touch in the window


def attribute_conversions(
    events: DataFrame,
    *,
    touch_pred: Column,
    conv_pred: Column,
    touch_label: Column,
    lookback_days: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    position: str = "last",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per conversion event with its attributed ``channel``.

    ``position='last'`` credits the latest qualifying touch at or before
    the conversion (last-touch); ``'first'`` credits the earliest touch
    seen so far for the user (first-touch) — both still subject to the
    lookback. A row can be both a touch and a conversion; the frame ends
    at the current row, so a self-touching conversion credits itself,
    which is the standard treatment.

    Output: user_col, id_col, ts_col, conv_us (epoch micros), channel,
    plus any ``keep_cols`` passed through from the conversion row.
    """
    if position not in ("last", "first"):
        raise ValueError(f"position must be 'last' or 'first', got {position!r}")
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pick = F.last if position == "last" else F.first
    t_label = pick(F.when(touch_pred, touch_label), ignorenulls=True).over(w)
    t_us = pick(F.when(touch_pred, us), ignorenulls=True).over(w)
    lookback_us = F.lit(int(lookback_days) * 86_400_000_000).cast("long")
    # the touch columns MUST materialize before the conversion filter:
    # referencing the window expressions after .filter() would re-plan
    # them over the filtered (touch-free) frame and attribute everything
    # to 'direct'
    in_window = F.col("_tus").isNotNull() & (
        (F.col("conv_us") - F.col("_tus")) <= lookback_us
    )
    return (
        events.withColumn("conv_us", us.cast("long"))
        .withColumn("_tl", t_label)
        .withColumn("_tus", t_us)
        .filter(conv_pred)
        .select(
            user_col,
            id_col,
            ts_col,
            "conv_us",
            F.when(in_window, F.col("_tl")).otherwise(F.lit(DIRECT)).alias("channel"),
            *keep_cols,
        )
    )


def sql_attribution_cte(
    *,
    touch_sql: str,
    conv_sql: str,
    label_sql: str,
    lookback_days: int,
    position: str = "last",
) -> str:
    """DuckDB CTE replaying :func:`attribute_conversions` on ``events``
    operation-for-operation (same rows-frame, same epoch-microsecond
    lookback test, same tie-break). Yields a relation ``attributed``
    with (user_id, event_id, ts, conv_us, channel)."""
    fn = "last_value" if position == "last" else "first_value"
    win = (
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    lb = int(lookback_days) * 86_400_000_000
    return f"""
base AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         {fn}(CASE WHEN {touch_sql} THEN {label_sql} END IGNORE NULLS) {win} AS t_label,
         {fn}(CASE WHEN {touch_sql} THEN epoch_us(ts) END IGNORE NULLS) {win} AS t_us,
         value, event_type
  FROM events
),
attributed AS (
  SELECT user_id, event_id, ts, us AS conv_us,
         CASE WHEN t_us IS NOT NULL AND (us - t_us) <= {lb}
              THEN t_label ELSE '{DIRECT}' END AS channel,
         value
  FROM base WHERE {conv_sql}
)"""
