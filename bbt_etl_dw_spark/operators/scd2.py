"""Slowly Changing Dimension Type 2 — real change capture.

The reference only *scaffolds* SCD2 (IsCurrent/EffectiveStart/End columns
set to constants every run, ``map_cols.py:89-91,137-139``; README.md:87-88
admits "not fully implemented"). This operator implements the actual merge:

    current (dim snapshot)  ×  incoming (new source snapshot)
      -> unchanged current rows pass through
      -> changed rows are expired (IsCurrent=false, EffectiveEndDate=asof)
      -> changed + brand-new keys get a fresh current version

Change detection hashes the tracked columns (xxhash64 — JVM-side, one
expression) instead of comparing column-by-column. The merge is ONE
full-outer hash join on the natural key whose every row emits 0-2 output
rows (expired/unchanged/insert) via array+explode — one shuffle each
side at scale, broadcast-eligible when the incoming snapshot is small.
Works on plain parquet; swap the final write for Delta/Iceberg MERGE
when available.
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

    # ONE full-outer join decides every merge action (r14 plan audit: the
    # previous shape — a live->incoming left join filtered twice for
    # unchanged/expired plus a SECOND incoming->live join for inserts —
    # evaluated both input pipelines once per union branch: 6 scans of
    # the dimension source for a 3-way classification). Each joined row
    # emits 0-2 output rows via an array+explode (the MERGE shape):
    #   live only            -> [expired]            (deleted key)
    #   both, hash equal     -> [unchanged]
    #   both, hash differs   -> [expired, insert]    (new version)
    #   incoming only        -> [insert]             (brand-new key)
    # The SCD2 invariant (at most one live row per natural key) makes the
    # full-outer join key-unique on each side, so no action can double-
    # fire. Null-safe key equality (eqNullSafe) kept from the review
    # finding: a live row with a NULL natural-key column must still meet
    # its incoming twin or every merge expires + re-inserts it forever;
    # <=> remains a hash-joinable equi-key.
    lv = live.select(
        *[F.col(c).alias(f"__lk_{c}") for c in key],
        F.struct(*live.columns).alias("__lv"),
    )
    ic = inc.select(
        *[F.col(c).alias(f"__ik_{c}") for c in key],
        F.struct(*inc.columns).alias("__in"),
    )
    cond = [F.col(f"__lk_{c}").eqNullSafe(F.col(f"__ik_{c}")) for c in key]
    j = lv.join(ic, cond, "full_outer")

    out_cols = closed.columns

    def mk_row(payload, is_cur, start, end):
        fields = []
        for c in out_cols:
            if c == IS_CURRENT:
                fields.append(is_cur.alias(c))
            elif c == START:
                fields.append(start.alias(c))
            elif c == END:
                fields.append(end.alias(c))
            else:
                fields.append(payload[c].alias(c))
        return F.struct(*fields)

    lvc = F.col("__lv")
    unchanged_row = mk_row(lvc, lvc[IS_CURRENT], lvc[START], lvc[END])
    expired_row = mk_row(lvc, F.lit(False), lvc[START], F.lit(asof))
    insert_row = mk_row(
        F.col("__in"), F.lit(True), F.lit(asof), F.lit(None).cast("date")
    )
    has_live = F.col("__lv").isNotNull()
    has_inc = F.col("__in").isNotNull()
    rows = (
        F.when(~has_inc, F.array(expired_row))
        .when(~has_live, F.array(insert_row))
        .when(lvc["__h"] == F.col("__in")["__h"], F.array(unchanged_row))
        .otherwise(F.array(expired_row, insert_row))
    )
    merged = j.select(F.explode(rows).alias("__r")).select(
        *[F.col("__r")[c].alias(c) for c in out_cols]
    )
    return closed.select(out_cols).unionByName(merged)


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
