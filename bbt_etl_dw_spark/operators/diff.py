"""Snapshot diff (CDC extraction): compare two snapshots of a keyed table
and emit the change set — insert / delete / update rows with the list of
changed columns.

The reference's warehouse loads are full overwrites (SURVEY §2.1 S2,
reference ``etl_load.py``); real incremental pipelines instead derive a
change-data feed by diffing the new extract against the previous snapshot,
then feed updates into SCD2 (operators/scd2.py) or a MERGE. This operator
is that diff, built scale-first:

- ONE full-outer hash join on the key columns — both sides shuffle once,
  co-partitioned by key; no window, no collect.
- Column comparison is a pure expression (null-safe equality per compared
  column), evaluated inside whole-stage codegen.
- Unchanged rows are dropped BEFORE the result materializes, so the output
  is O(|changes|), not O(|table|) — the property that makes daily diffs of
  a 100 TB dimension viable when churn is low.

At cluster scale both snapshots would be bucketed on the key to make the
join shuffle-free; the operator only requires key-partitionable inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshots keyed by ``keys``.

    Returns one row per inserted / deleted / changed key:
    ``keys..., op ('insert'|'delete'|'update'), changed_cols (array<string>,
    registration order), old_<col> and new_<col> for every compared column``.
    Unchanged keys are omitted. Key columns must be non-null (enforced by
    the join semantics: a null key never matches and would surface as a
    spurious insert+delete pair).
    """
    if compare_cols is None:
        keyset = set(keys)
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keyset
        ]
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=list(keys), how="full_outer")

    diffs = [
        (c, ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))) for c in compare_cols
    ]
    changed_cols = F.filter(
        F.array(*[F.when(d, F.lit(c)) for c, d in diffs]),
        lambda x: x.isNotNull(),
    )
    any_diff = F.size(changed_cols) > 0
    op = (
        F.when(F.col("_old_present").isNull(), F.lit("insert"))
        .when(F.col("_new_present").isNull(), F.lit("delete"))
        .when(any_diff, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("op") == "update", changed_cols).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .select(
            *keys,
            "op",
            "changed_cols",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
