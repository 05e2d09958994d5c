"""Time-series smoothing: exponentially weighted moving average (EWMA)
over a bounded trailing window.

The sibling of the LOCF forward-fill (operators/ffill.py) on the
time-series imputation/smoothing axis. EWMA is inherently recursive
(``ewma_t = α·x_t + (1-α)·ewma_{t-1}``), which no SQL window frame
expresses directly; the two standard distributed escapes are a
sequential per-key scan (stateful, streaming-shaped) or the closed-form
weighted sum. The closed form over an UNBOUNDED preceding frame needs
``(1-α)^{-i}`` terms that overflow double for long series, so this
operator computes the recursion over a bounded trailing window of K
rows instead: collect the frame into an array (K doubles per row — K
is a constant, so memory per row is bounded) and fold it with the exact
recursion. For α = 0.5 and K = 32 the truncation term is 2⁻³¹ — below
double visibility for same-scale data — while every arithmetic step
stays a deterministic IEEE operation.

Cross-engine determinism: with α an exact binary fraction whose
complement is also exact (α = 0.5), both fold multiplications are EXACT
(scaling by a power of two), so the only rounding is the one correctly
rounded addition per step — bit-identical in any IEEE engine, immune
even to FMA contraction. The DuckDB twin is ``list_reduce`` over the
same window ``list()``, which seeds with the first element exactly as
the null-seeded Spark fold does.

Scale: ONE shuffle (hash partition on the key columns for the window
sort); the fold is a JVM Catalyst expression (``aggregate``), no Python
on the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trailing_ewma(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    k: int = 32,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col``: the EWMA of ``value_col`` over the trailing
    ``k`` rows per key, ordered by ``order_cols`` (include a unique
    tie-break column — frame contents must be deterministic).

    ``alpha`` should be an exact binary fraction with exact complement
    (0.5 is the only one) when bit-reproducibility across engines is
    required; other values remain deterministic within Spark.

    NULL values: ``collect_list`` DROPS NULLs from the frame, so a
    NULL-value row receives the EWMA of the surrounding non-null values
    (explicit smoothing-over-gaps semantics, documented rather than
    accidental; r07 review) and a frame that is entirely NULL yields
    NULL. The DuckDB twin must mirror with ``list_filter(l, x -> x IS
    NOT NULL)`` plus an empty-list guard — DuckDB's ``list()`` KEEPS
    NULLs (one NULL would poison the whole fold) and its
    ``list_reduce`` raises on empty lists.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    frame = F.collect_list(F.col(value_col).cast("double")).over(w)

    a = F.lit(float(alpha))
    b = F.lit(1.0 - float(alpha))

    def step(acc: Column, x: Column) -> Column:
        return F.when(acc.isNull(), x).otherwise(a * x + b * acc)

    ewma = F.aggregate(frame, F.lit(None).cast("double"), step)
    return df.withColumn(out_col, ewma)
