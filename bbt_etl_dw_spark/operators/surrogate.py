"""Deterministic surrogate keys.

The reference assigns all 7 star-schema surrogate keys with
``monotonically_increasing_id()`` (``scripts/etl_transform/etl_gold/
map_cols.py:44,58,73,125,180,219,269``), which is partition-layout-dependent
and unstable across runs — it breaks SCD2 change capture and any golden
test. The engine offers two deterministic strategies:

- ``hash_key``: ``xxhash64`` of the natural key columns. O(1), shuffle-free,
  stable under any partitioning — the 100TB default. Collision odds over
  64 bits are ~n^2/2^65 (≈0.003 for 1e9 keys); use ``check_unique`` on
  ingest when that matters.
- ``ordered_key``: dense ``row_number`` over an explicit ordering —
  reference-compatible small-dimension IDs (single partition; only for
  dims that fit on one executor, like the reference's ≤11k-row dims).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_NULL_SENTINEL = "\x00<NULL>"


def hash_key(df: DataFrame, natural_key: Sequence[str], name: str) -> DataFrame:
    """Stable 64-bit surrogate key from the natural key columns.

    MULTI-column keys encode each part as a NULL-sentineled string first:
    Spark's xxhash64 passes its seed through unchanged for NULL inputs,
    so ('smith', NULL) and (NULL, 'smith') would otherwise hash
    IDENTICALLY — two distinct entities sharing one surrogate key with
    probability 1 (review finding; the same hazard scd2.py's change hash
    documents). Single-column keys keep the raw typed hash (a NULL key
    is one entity; values stay byte-compatible with existing dims)."""
    if len(natural_key) == 1:
        return df.withColumn(name, F.xxhash64(F.col(natural_key[0])))
    encoded = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
        for c in natural_key
    ]
    return df.withColumn(name, F.xxhash64(*encoded))


def md5_key(df: DataFrame, natural_key: Sequence[str], name: str) -> DataFrame:
    """Stable 60-bit surrogate key any engine can recompute: first 15 hex
    chars of md5 over the unit-separator-joined natural key. ~3-5x the
    per-row cost of :func:`hash_key` (string hash + hex parse vs one
    xxhash64), so use it where cross-system AUDITABILITY of the keys
    matters — e.g. a warehouse whose downstream consumers re-derive keys
    in another engine — and xxhash64 on the pure-Spark hot path.

    Encoding (the part another engine must replicate): each key column
    cast to string, NULL replaced by the sentinel "\\x00<NULL>", joined
    on the ASCII unit separator \\x1f. A bare '|' join was ambiguous with
    probability 1 on real data — ('a|b','c') vs ('a','b|c'), and
    concat_ws silently SKIPS nulls so ('x', NULL)/(NULL, 'x')/(shorter
    key 'x') all collided (review finding). Collision odds over 60 bits:
    ~n²/2^61 (≈0.4 for 1e9 keys — run :func:`check_unique` on ingest at
    that scale, or widen to two md5 words)."""
    joined = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
            for c in natural_key
        ],
    )
    return df.withColumn(
        name, F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
    )


def ordered_key(df: DataFrame, order_by: Sequence[str], name: str) -> DataFrame:
    """1-based dense sequential key over a total order. Small dims only:
    the empty partitionBy funnels rows through one partition (exactly the
    reference's W1 anti-pattern, kept for ID-compatibility at dim scale)."""
    w = Window.orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def check_unique(df: DataFrame, key: str) -> None:
    """Raise if ``key`` has duplicates (hash-collision / bad natural key)."""
    dup = df.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"surrogate key {key!r} is not unique")
