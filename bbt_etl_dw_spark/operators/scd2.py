"""Slowly Changing Dimension Type 2 — real change capture.

The reference only *scaffolds* SCD2 (IsCurrent/EffectiveStart/End columns
set to constants every run, ``map_cols.py:89-91,137-139``; README.md:87-88
admits "not fully implemented"). This operator implements the actual merge:

    current (dim snapshot)  ×  incoming (new source snapshot)
      -> unchanged current rows pass through
      -> changed rows are expired (IsCurrent=false, EffectiveEndDate=asof)
      -> changed + brand-new keys get a fresh current version

Change detection hashes the tracked columns (xxhash64 — JVM-side, one
expression) instead of comparing column-by-column. The merge is two
hash joins on the natural key + a union — one shuffle each side at scale,
broadcast-eligible when the incoming snapshot is small. Works on plain
parquet; swap the final write for Delta/Iceberg MERGE when available.
"""

from __future__ import annotations

import datetime
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IS_CURRENT = "is_current"
START = "effective_start_date"
END = "effective_end_date"


def scd2_init(incoming: DataFrame, asof: datetime.date) -> DataFrame:
    """First load: everything becomes the current version."""
    return incoming.withColumns(
        {
            IS_CURRENT: F.lit(True),
            START: F.lit(asof),
            END: F.lit(None).cast("date"),
        }
    )


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    natural_key: Sequence[str],
    tracked_cols: Sequence[str],
    asof: datetime.date,
) -> DataFrame:
    """Merge a new snapshot into an SCD2 dimension.

    ``current`` must carry the SCD2 columns (is_current/effective_*);
    ``incoming`` must NOT. Attribute columns shared by both are compared
    via ``tracked_cols``; any difference creates a new version.
    """
    key = list(natural_key)
    # Null-safe change hash: Spark hash functions pass the seed through
    # unchanged for NULL inputs, so xxhash64('a', NULL) == xxhash64(NULL, 'a')
    # and a value moving between two nullable columns would be missed.
    # Encode each column as a non-null string with a NULL sentinel first.
    chash = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>")) for c in tracked_cols]
    )

    cur = current.withColumn("__h", chash)
    inc = incoming.withColumn("__h", chash)

    live = cur.filter(F.col(IS_CURRENT))
    closed = cur.filter(~F.col(IS_CURRENT)).drop("__h")

    # Which live rows changed / which incoming rows are new versions?
    inc_keyed = inc.select(
        *[F.col(c).alias(f"__k_{c}") for c in key], F.col("__h").alias("__h_inc")
    )
    # Null-safe key equality: a live row with a NULL natural-key column
    # would never equi-join its incoming twin, so EVERY merge would
    # expire it and re-insert it — one spurious closed version per run,
    # forever (review finding). eqNullSafe (<=>) is still a hash-joinable
    # equi-key, so the plan shape is unchanged.
    cond = [live[c].eqNullSafe(inc_keyed[f"__k_{c}"]) for c in key]
    live_vs_inc = live.join(inc_keyed, cond, "left")

    unchanged = live_vs_inc.filter(
        F.col("__h_inc").isNotNull() & (F.col("__h") == F.col("__h_inc"))
    ).select(live.columns).drop("__h")

    # Changed (new hash) or deleted (no incoming row): expire.
    expired = (
        live_vs_inc.filter(F.col("__h_inc").isNull() | (F.col("__h") != F.col("__h_inc")))
        .select(live.columns)
        .drop("__h")
        .withColumns({IS_CURRENT: F.lit(False), END: F.lit(asof)})
    )

    # Incoming rows that are brand-new keys or changed versions: insert.
    live_keyed = live.select(
        *[F.col(c).alias(f"__k_{c}") for c in key], F.col("__h").alias("__h_cur")
    )
    cond2 = [inc[c].eqNullSafe(live_keyed[f"__k_{c}"]) for c in key]
    inserts = (
        inc.join(live_keyed, cond2, "left")
        .filter(F.col("__h_cur").isNull() | (F.col("__h") != F.col("__h_cur")))
        .select(incoming.columns)
        .withColumns(
            {
                IS_CURRENT: F.lit(True),
                START: F.lit(asof),
                END: F.lit(None).cast("date"),
            }
        )
    )

    out_cols = closed.columns
    return (
        closed.select(out_cols)
        .unionByName(unchanged.select(out_cols))
        .unionByName(expired.select(out_cols))
        .unionByName(inserts.select(out_cols))
    )


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    natural_key: Sequence[str],
    tracked_cols: Sequence[str],
    asof: datetime.date,
) -> DataFrame:
    """Maintain an SCD2 dimension from a CDC change feed
    (operators/diff.snapshot_diff output) instead of a full snapshot.

    :func:`scd2_merge` compares the ENTIRE incoming snapshot against the
    entire live dimension — the right shape when all you have is a new
    extract. With a change feed the work should be O(churn): this variant
    touches only the keys present in ``changes``, so a 100 TB dimension
    with 0.1% daily churn joins against a broadcast-sized key set instead
    of re-hashing every row.

    Version semantics match scd2_merge: an ``update`` creates a new
    version only when its ``changed_cols`` intersect ``tracked_cols``
    (untracked-attribute drift does NOT spawn versions — the live row,
    including its old untracked values, stays current, exactly as the
    hash-compare in scd2_merge would decide); ``delete`` expires without a
    successor; ``insert`` opens a first version. History rows of
    untouched keys pass through untouched.
    """
    key = list(natural_key)
    data_cols = [c for c in history.columns if c not in (IS_CURRENT, START, END)]

    versioning = changes.filter(
        (F.col("op") == "insert")
        | (F.col("op") == "delete")
        | (
            (F.col("op") == "update")
            & F.arrays_overlap(
                F.col("changed_cols"),
                F.array(*[F.lit(c) for c in tracked_cols]),
            )
        )
    )
    from bbt_etl_dw_spark.operators.ckpt import materialize

    versioning = materialize(versioning)

    # keys whose LIVE row must close (tracked update or delete).
    # eqNullSafe, matching scd2_merge (r08 review): a name-based `on=key`
    # join is null-UNSAFE, so a CDC delete/update for a row with a NULL
    # natural-key column would silently never expire it — the same defect
    # class the merge path already fixed.
    closing = (
        versioning.filter(F.col("op").isin("update", "delete"))
        .select(*[F.col(c).alias(f"__k_{c}") for c in key])
        .withColumn("__close", F.lit(1))
    )
    cond = [history[c].eqNullSafe(F.col(f"__k_{c}")) for c in key]
    marked = history.join(F.broadcast(closing), cond, "left").drop(
        *[f"__k_{c}" for c in key]
    )
    pass_through = marked.filter(
        ~(F.col(IS_CURRENT) & F.col("__close").isNotNull())
    ).drop("__close")
    expired = (
        marked.filter(F.col(IS_CURRENT) & F.col("__close").isNotNull())
        .drop("__close")
        .withColumns({IS_CURRENT: F.lit(False), END: F.lit(asof)})
    )

    opening = versioning.filter(F.col("op").isin("insert", "update")).select(
        *[
            (F.col(c) if c in set(key) else F.col(f"new_{c}")).alias(c)
            for c in data_cols
        ]
    ).withColumns(
        {
            IS_CURRENT: F.lit(True),
            START: F.lit(asof),
            END: F.lit(None).cast("date"),
        }
    )

    out_cols = history.columns
    return (
        pass_through.select(out_cols)
        .unionByName(expired.select(out_cols))
        .unionByName(opening.select(out_cols))
    )
