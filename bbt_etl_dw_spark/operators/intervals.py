"""Gaps-and-islands: merge per-key intervals that overlap or nearly
touch, and measure per-key coverage.

The classic warehouse reshape (user sessions from raw spans, machine
uptime windows, contract validity ranges, booked time slots) that the
reference's equi-join/group-by surface cannot express. The engine already
solved a special case inside span dedup (fixed-width window runs,
operators/spans.py — which now delegates here); this is the general
operator: variable [start, end] intervals, overlap OR a configurable gap
tolerance, nested-interval-safe.

Plan shape (the right 100 TB plan for this problem):
- ONE shuffle: the per-key window sort (partitionBy keys, orderBy start).
- Island detection is the running-max trick, not a self-join: an interval
  starts a new island iff its start exceeds the RUNNING MAX of all
  previous ends (+ gap). ``lag(end)`` alone is wrong under nesting — a
  short interval inside a long one would reset the frontier and split an
  island; the running max keeps the true coverage frontier.
- Island ids are a running sum of the break flags; the final merge is one
  hash aggregate per (key, island).
- No joins, no explode, no UDF — three window functions and an aggregate,
  all whole-stage-codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    gap: int | float | Column = 0,
) -> DataFrame:
    """Merge each key's intervals into maximal islands: intervals that
    overlap, touch, or sit within ``gap`` of the island's frontier join
    it. Returns one row per island: keys + ``island_start``,
    ``island_end``, ``n_intervals``.

    ``gap`` uses the columns' own arithmetic: a number for numeric
    bounds, ``F.expr("INTERVAL 30 MINUTES")`` for timestamps (gap=0 =
    merge only overlapping-or-touching). Rows with a NULL bound carry no
    position in the ordering and are dropped (loudly documented rather
    than silently absorbed into an arbitrary island)."""
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    frontier = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).withColumn("_frontier", frontier)
    if isinstance(gap, Column):
        reach = F.col("_frontier") + gap
    elif gap == 0:
        # no addition: keeps the zero default type-agnostic (timestamp +
        # int literal is a type error; overlap-or-touch needs no gap term)
        reach = F.col("_frontier")
    else:
        reach = F.col("_frontier") + F.lit(gap)
    islands = islands.withColumn(
        "_brk",
        F.when(
            F.col("_frontier").isNull() | (F.col(start_col) > reach), 1
        ).otherwise(0),
    ).withColumn("_island", F.sum("_brk").over(run))
    return (
        islands.groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )


def interval_coverage(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key total covered length — the measure of the UNION of the
    key's intervals (double-counted overlap is the classic naive-SUM
    bug this exists to avoid). Numeric bounds; for timestamps, convert
    to epoch seconds first. Returns keys + ``covered`` +
    ``n_islands``."""
    merged = merge_intervals(df, keys, start_col, end_col, gap=0)
    return merged.groupBy(*keys).agg(
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
    )
