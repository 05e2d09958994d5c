"""Custom stateful streaming operator: per-user running totals.

``applyInPandasWithState`` is the engine's escape hatch for stateful
semantics the built-in windowed aggregates can't express (the SURVEY §7
"custom stateful operator" slot). State here is one (count, sum) pair per
user — O(#users) across the cluster, partitioned by the grouping key.

The deterministic batch twin is :func:`running_totals_batch` (a cumulative
window over the same keys) — pytest asserts the stream's final emitted row
per user equals the batch result; the suite registers the batch twin with
a SQL oracle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bbt_etl_dw_spark.functions.numeric import dsum

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
# total is a decimal digit string, NOT a double: state accumulates exactly
# (same discipline as functions/numeric.dsum) so the stream's final row is
# bit-identical to the batch twin regardless of batch boundaries or
# accumulation order — not merely close within float tolerance.
STATE_SCHEMA = "n long, total string"


def _make_update_user_totals():
    # nested def => cloudpickle ships it by value; executors' Python
    # workers may not have this package importable (see multimodal.py)
    def update_user_totals(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import decimal

        import pandas as _pd

        n, total_s = state.get if state.exists else (0, "0")
        # Decimal(repr(double)) is the shortest-repr string->decimal hop
        # dsum uses; summing Decimals is exact. Python's float(Decimal) is
        # correctly rounded, matching Spark's decimal-string->double cast.
        total = decimal.Decimal(total_s)
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"].dropna():
                total += decimal.Decimal(repr(float(v)))
        state.update((n, str(total)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [float(total)]}
        )

    return update_user_totals


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming: emit the updated cumulative (count, sum) per user every
    micro-batch that touches that user. Arrow-batched state updates — the
    Python boundary is per-group-per-batch, never per-row."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_totals(),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def final_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stream's final state: one exact aggregate."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value")
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Per-event running totals (what the stream would have emitted had
    every event been its own batch). Cumulative decimal-sum window => exact
    and order-independent, so it matches any engine's oracle bit-for-bit."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        F.sum(F.col("value").cast("string").try_cast("decimal(38,18)")).over(w)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events"),
        running.cast("string").cast("double").alias("running_value"),
    )
