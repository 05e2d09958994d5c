"""Enrichment operators: derived KPIs and status ladders.

Engine form of the reference's add_columns/map_cols enrichment
(``add_columns.py:87-139``, ``map_cols.py:86-123``): every ladder is a
configurable first-match-wins ``when`` chain — pure column expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def total_amount(
    price: str = "UnitPrice", quantity: str = "Quantity", discount: str = "Discount"
) -> Column:
    """TotalAmount = UnitPrice * Quantity * (1 - Discount)
    (reference add_columns.py:87-93)."""
    return F.col(price) * F.col(quantity) * (F.lit(1) - F.col(discount))


def threshold_ladder(
    value: Column, thresholds: Sequence[tuple[float, str]], default: str
) -> Column:
    """Descending (threshold, label) ladder: first threshold the value
    exceeds wins (reference client status add_columns.py:113-118,
    ClientValue map_cols.py:86-88). Thresholds must be strictly
    descending — an ascending list would make the first (lowest) rung
    shadow every higher label, silently mislabeling the top tiers, so it
    raises instead (r08 review)."""
    ts = [t for t, _ in thresholds]
    if any(a <= b for a, b in zip(ts, ts[1:])):
        raise ValueError(
            f"threshold_ladder: thresholds must be strictly descending, "
            f"got {ts} — an ascending rung would shadow every higher label"
        )
    expr = None
    for t, label in thresholds:
        branch = value > F.lit(t)
        expr = F.when(branch, label) if expr is None else expr.when(branch, label)
    return (expr.otherwise(default)) if expr is not None else F.lit(default)


def client_value(total: Column, high: float = 10000.0, medium: float = 1000.0) -> Column:
    return threshold_ladder(total, [(high, "High"), (medium, "Medium")], "Low")


def product_status(
    last_sold: Column,
    asof: Column,
    eol_days: int = 180,
    obsolete_days: int = 365,
) -> Column:
    """Active / End of Lifecycle / Obsolete from days-since-last-sale
    (reference map_cols.py:116-123; never-sold -> Obsolete)."""
    age = F.datediff(asof, last_sold)
    return (
        F.when(last_sold.isNull() | (age > obsolete_days), "Obsolete")
        .when(age > eol_days, "End of Lifecycle")
        .otherwise("Active")
    )
