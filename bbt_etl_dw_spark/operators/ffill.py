"""Forward-fill (last observation carried forward).

Engine counterpart of the reference's exchange-rate gap filling
(``scripts/etl_transform/sales_currency.py:76-82``): the last non-null
value per partition, in event order, is carried forward.

Scale: one shuffle on ``partition_by``; the window frame is the default
(UNBOUNDED PRECEDING .. CURRENT ROW), which Spark evaluates streamingly
per partition — no global sort, no single-partition collapse. Never call
with ``partition_by=[]`` at scale (that is a global Window.orderBy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Replace nulls in ``cols`` with the previous non-null value within
    each ``partition_by`` group ordered by ``order_by`` (which must be a
    total order within the partition for deterministic results)."""
    if not partition_by:
        raise ValueError(
            "forward_fill requires partition keys; a global ordered window "
            "funnels all rows through one partition and cannot scale"
        )
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in cols})
