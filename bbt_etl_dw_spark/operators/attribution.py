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

from bbt_etl_dw_spark.functions.numeric import dsum

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
    the conversion (last-touch, within the lookback); ``'first'`` credits
    the EARLIEST touch INSIDE the lookback window ``[conv - lookback,
    conv]`` (standard first-touch-within-window — NOT the user's
    first-ever touch, which would mark conversions 'direct' whenever an
    ancient touch exists outside the window even though a fresh one
    qualifies; r07 review finding). A touch whose label is NULL cannot
    be credited and is ignored by BOTH the label and the timestamp pick
    (picking them independently would desynchronize: an old channel
    credited under a newer NULL-label touch's timestamp). A row can be
    both a touch and a conversion; a self-touching conversion credits
    itself — the standard treatment. Touch ELIGIBILITY is identical for
    both positions (ADVICE r07): a touch is creditable iff it sorts at or
    before the conversion under ``(ts, id)`` — a touch sharing the
    conversion's exact timestamp but a LATER id is excluded by 'first'
    exactly as the 'last' ROWS frame excludes it.

    Output: user_col, id_col, ts_col, conv_us (epoch micros), channel,
    plus any ``keep_cols`` passed through from the conversion row.
    """
    if position not in ("last", "first"):
        raise ValueError(f"position must be 'last' or 'first', got {position!r}")
    us = F.unix_micros(F.col(ts_col))
    lb = int(lookback_days) * 86_400_000_000
    qualify = touch_pred & touch_label.isNotNull()
    if position == "last":
        w = (
            Window.partitionBy(user_col)
            .orderBy(F.col(ts_col), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        t_label = F.last(F.when(qualify, touch_label), ignorenulls=True).over(w)
        t_us = F.last(F.when(qualify, us), ignorenulls=True).over(w)
    else:
        # first-WITHIN-WINDOW: min over a (us, id, label) struct picks the
        # earliest with the id tie-break (a range frame allows only one
        # ordering expression, so the tie-break must ride the aggregate,
        # not the frame order). TWO frames keep eligibility identical to
        # the 'last' path's (ts, id) ROWS frame — a single RANGE frame
        # ending at the current timestamp VALUE would admit a touch at the
        # conversion's exact timestamp with a LATER id (ADVICE r07):
        # - strictly-before: RANGE (-lb, -1) over epoch-µs;
        # - same-timestamp: ROWS up to the current row within the
        #   (user, µs) peer group ordered by id — exactly the ids <= conv.
        # Any strictly-before touch is earlier than any same-µs touch, so
        # COALESCE prefers it; no cross-engine struct comparison needed.
        cand = F.when(
            qualify,
            F.struct(
                us.cast("long").alias("us"),
                F.col(id_col).alias("id"),
                touch_label.alias("label"),
            ),
        )
        w_before = (
            Window.partitionBy(user_col)
            .orderBy(us.cast("long"))
            .rangeBetween(-lb, -1)
        )
        w_same = (
            Window.partitionBy(user_col, us.cast("long"))
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        t = F.coalesce(F.min(cand).over(w_before), F.min(cand).over(w_same))
        t_label, t_us = t["label"], t["us"]
    lookback_us = F.lit(lb).cast("long")
    # the touch columns MUST materialize before the conversion filter:
    # referencing the window expressions after .filter() would re-plan
    # them over the filtered (touch-free) frame and attribute everything
    # to 'direct'. The in-window test is shared: for 'first' the range
    # frame already guarantees it whenever _tus is non-null.
    in_window = F.col("_tus").isNotNull() & (
        (F.col("conv_us") - F.col("_tus")) <= lookback_us
    )
    return (
        events.withColumn("conv_us", us.cast("long"))
        .withColumn("_tl", t_label)
        .withColumn("_tus", t_us.cast("long"))
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
    operation-for-operation (same frames, same NULL-label qualify gate,
    same epoch-microsecond lookback test, same tie-break). Yields a
    relation ``attributed`` with (user_id, event_id, ts, conv_us,
    channel)."""
    lb = int(lookback_days) * 86_400_000_000
    qualify = f"({touch_sql}) AND ({label_sql}) IS NOT NULL"
    if position == "last":
        win = (
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        picks = f"""
         last_value(CASE WHEN {qualify} THEN {label_sql} END IGNORE NULLS) {win} AS t_label,
         last_value(CASE WHEN {qualify} THEN epoch_us(ts) END IGNORE NULLS) {win} AS t_us,"""
    else:
        # two frames, mirroring the Spark side: strictly-before RANGE plus
        # a same-timestamp ROWS frame ordered by id (same (ts, id)
        # eligibility as the 'last' path)
        win_before = (
            "OVER (PARTITION BY user_id ORDER BY epoch_us(ts) "
            f"RANGE BETWEEN {lb} PRECEDING AND 1 PRECEDING)"
        )
        win_same = (
            "OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        cand = (
            f"CASE WHEN {qualify} THEN "
            f"{{'us': epoch_us(ts), 'id': event_id, 'label': {label_sql}}} "
            f"END"
        )
        m = f"COALESCE(min({cand}) {win_before}, min({cand}) {win_same})"
        picks = f"""
         ({m}).label AS t_label,
         ({m}).us AS t_us,"""
    return f"""
base AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,{picks}
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


def linear_attribution(
    events: DataFrame,
    *,
    touch_pred: Column,
    conv_pred: Column,
    touch_label: Column,
    lookback_days: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear (equal-credit multi-touch) attribution: every conversion
    splits its value EVENLY across all qualifying touches in the
    inclusive lookback window ``[conv - lookback, conv]``; conversions
    with no touch credit ``DIRECT`` in full. Returns one row per channel:
    ``(channel, fractional_conversions, attributed_value)``.

    Unlike last/first-touch (a running window — see
    :func:`attribute_conversions`), the touch SET per conversion is
    inherently a user-keyed equi-join of conversions against touches
    with a range predicate: per-user fan-out is touches x conversions
    INSIDE the window — bounded by per-user activity (the same bound
    every sessionization/funnel operator here carries), never users².
    The per-conversion normalizer and the channel rollup are
    conversion-/channel-keyed aggregates. Credit arithmetic is
    ``value * (cnt / n)`` in a fixed IEEE order over exact counts, and
    the channel sums are exact decimals."""
    lookback_us = lookback_days * 86_400_000_000
    us = F.unix_micros(F.col(ts_col))
    t = events.filter(touch_pred).select(
        F.col(user_col).alias("__u"),
        us.alias("__t_us"),
        touch_label.alias("channel"),
    )
    c = events.filter(conv_pred).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        us.alias("__c_us"),
        F.col(value_col).alias("__val"),
    )
    # `c` feeds the range join AND the no-touch anti-join, and `pairs`
    # feeds THREE consumers (per-conversion normalizer, per-channel
    # rollup, anti-join key set). Left un-materialized, Spark plans each
    # reference independently: the events scan ran ~5x and the range
    # join — the expensive fan-out stage — 3x (r14 plan audit). Both
    # frames are skinny and bounded (conversions; in-window touch pairs),
    # so one checkpoint each makes the scan and the range join run once.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    c = materialize(c)
    pairs = materialize(
        c.join(
            t,
            (c["__u"] == t["__u"])
            & (t["__t_us"] <= c["__c_us"])
            & (t["__t_us"] >= c["__c_us"] - F.lit(lookback_us)),
        ).select("__cid", "__val", "channel")
    )
    ntot = pairs.groupBy("__cid").agg(F.count(F.lit(1)).alias("__n"))
    per_cc = pairs.groupBy("__cid", "channel").agg(
        F.count(F.lit(1)).alias("__cnt"), F.first("__val").alias("__val")
    )
    share = F.col("__cnt").cast("double") / F.col("__n").cast("double")
    credited = per_cc.join(ntot, "__cid").select(
        "channel",
        share.alias("__share"),
        (F.col("__val") * share).alias("__credit"),
    )
    touched = credited.groupBy("channel").agg(
        dsum(F.col("__share"), "fractional_conversions"),
        dsum(F.col("__credit"), "attributed_value"),
    )
    direct = (
        c.join(pairs.select("__cid").distinct(), "__cid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__n_direct"),
            dsum(F.col("__val"), "attributed_value"),
        )
        .select(
            F.lit(DIRECT).alias("channel"),
            F.col("__n_direct").alias("fractional_conversions"),
            "attributed_value",
        )
        .filter(F.col("fractional_conversions") > 0)
    )
    return touched.unionByName(direct)
