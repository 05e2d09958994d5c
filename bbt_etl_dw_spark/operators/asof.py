"""As-of (point-in-time) join.

Idiomatic replacement for the reference's exchange-rate resolution
(``scripts/etl_transform/sales_currency.py:76-100``: exact-date left join +
window forward-fill + coalesce). Spark has no native ASOF JOIN, so this
implements the classic single-shuffle formulation:

    union(left, right) -> window over (by, ORDER BY time, side)
                       -> forward-fill right values -> keep left rows

Each left row receives the most recent right row with
``right.time <= left.time`` (backward, inclusive) within the same ``by``
group. Compared with a broadcast/range-join approach this needs exactly one
shuffle on ``by``, works when BOTH sides are large (100TB fact vs years of
tick data), and inherits AQE skew splitting on the shuffle.

Determinism: if several right rows share (by, time), order is broken by the
value columns so the result is stable; keep right keys unique per (by, time)
for well-defined semantics (matching DuckDB/pandas ASOF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Parameters
    ----------
    on: event-time column name, present in both sides.
    by: equality keys (partition the time series); required for scale.
    value_cols: right-side payload columns to attach (default: all right
        columns except ``on`` and ``by``).
    """
    if not by:
        raise ValueError("asof_join requires `by` keys (global time series does not scale)")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    value_cols = list(value_cols)

    # Align schemas: left keeps all its columns, right contributes only
    # (by, on, values); the other side's exclusive columns become nulls.
    left_only = [c for c in left.columns if c not in set(by) | {on}]
    clash = sorted(set(left_only) & set(value_cols))
    if clash:
        # A shared payload name would be silently nulled by the schema
        # alignment below (left's copy nulls the right payload before the
        # union), so every output value forward-fills NULL — e.g.
        # re-running enrichment on an already-enriched table. Loud > null.
        raise ValueError(
            f"asof_join: columns {clash} exist on BOTH sides — rename or "
            "drop the left copies (or pass explicit value_cols) before "
            "joining"
        )
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumns(
        {c: F.lit(None).cast(right.schema[c].dataType) for c in value_cols}
    )
    r_tagged = (
        right.select(*by, on, *value_cols)
        .withColumn(_SIDE, F.lit(0))
        .withColumns({c: F.lit(None).cast(left.schema[c].dataType) for c in left_only})
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows (_SIDE=0) sort before left rows at equal time => inclusive.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc(), *value_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole right row forward ATOMICALLY: filling each value
    # column independently with last(ignorenulls) would mix columns from
    # different right rows whenever a right value is NULL (row-wise ASOF
    # semantics require the matched row as a unit). A single struct is
    # non-null exactly for right rows, so one forward-fill moves the row.
    vals = "__asof_vals"
    filled = (
        unioned.withColumn(
            vals, F.when(F.col(_SIDE) == 0, F.struct(*[F.col(c) for c in value_cols]))
        )
        .withColumn(vals, F.last(vals, ignorenulls=True).over(w))
        .withColumns({c: F.col(vals).getField(c) for c in value_cols})
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE, vals)
