"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for sort-merge
joins with statistics; salting is the deterministic, planner-independent
fallback — and the only option for skewed aggregations.

``salted_join``: replicate the small side ``salt`` times, spray the big
side's rows uniformly across the salt space, join on (key, salt). The big
side's hot key now lands on ``salt`` reducers instead of one. Correct for
inner/left joins where the small side is unique per key (a dimension).

``salted_count``: two-phase aggregation — partial count per (key, salt),
then final sum per key. A hot key's rows combine on ``salt`` reducers
first; the final shuffle moves one row per (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_hash_cols(df: DataFrame) -> list[Column]:
    """Columns usable in the retry-deterministic content hash: xxhash64
    cannot hash MapType (unordered keys have no canonical hash), so map
    columns — including maps nested in arrays/structs — are skipped
    rather than failing analysis (ADVICE r07). Raises when NO column is
    hashable (an all-map frame has no deterministic content identity —
    add a key or payload column)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
    if not cols:
        raise ValueError(
            "salted content hash: every column is (or contains) a MapType, "
            "which xxhash64 cannot hash — add a hashable key or payload "
            "column to salt on"
        )
    return [F.col(c) for c in cols]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a per-key-unique small side on ``on``.

    Salt = pmod(xxhash64(ALL columns), salt) — a pure CONTENT hash
    (r07 review): the previous spark_partition_id + mono_id mix was not
    stable under recomputation, so a map-task retry after a shuffle
    fetch failure could re-salt rows already fetched by completed
    reducers — rows landing in zero or two (key, salt) partitions, the
    SPARK-23207 silent-loss class, at exactly the fetch-failure-prone
    scale salting targets. Content hashing is retry-deterministic; rows
    identical in every HASHABLE column share a bucket, which cannot
    affect correctness (such rows are interchangeable for the join) but
    DEGRADES the salting for massively duplicated identical rows — a hot
    key whose rows are byte-identical collapses back onto one reducer;
    salting cannot spread rows it cannot distinguish (add a
    distinguishing column upstream if that is your skew shape). MapType
    columns are excluded from the hash (xxhash64 cannot hash maps); see
    :func:`_content_hash_cols`.
    """
    if how not in ("inner", "left"):
        # Replicating the small side `salt` times duplicates its unmatched
        # rows under right/full outer joins — only inner/left are correct.
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    salt_col = F.pmod(F.xxhash64(*_content_hash_cols(big)), F.lit(salt)).cast(
        "int"
    )
    big_s = big.withColumn("_salt", salt_col)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key_cols: list[str], salt: int = 16) -> DataFrame:
    """Two-phase count per key, skew-proof: partial count on (key, salt),
    final sum on key. Output column: n_rows. Salt is the same
    retry-deterministic content hash as :func:`salted_join` (same MapType
    exclusion and identical-row degeneration)."""
    salt_col = F.pmod(F.xxhash64(*_content_hash_cols(df)), F.lit(salt)).cast(
        "int"
    )
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_pc").alias("n_rows"))


def key_skew_report(
    df, key: str, top_k: int = 10, n_partitions: int | None = None
):
    """Skew diagnostic for join/agg planning: per-key counts for the
    ``top_k`` heaviest keys plus the share of all rows each holds and the
    ratio of the key's count to a perfectly even per-partition row count.
    ``skew_ratio`` >> 1 on a key means a shuffle on this key puts that
    multiple of the average partition load on one task — the signal for
    salting (salted_aggregate/salted_broadcast_join below) or AQE skew
    splitting. ONE hash aggregate + a tiny top-k; run it on a sample for
    quick checks at 100TB."""
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # the per-key counts already hold the total: summing the aggregate
    # (materialized once, it feeds two consumers) avoids a second full
    # scan of the 100TB input this diagnostic targets (review finding)
    from bbt_etl_dw_spark.operators.ckpt import materialize

    counts = materialize(counts)
    total = counts.agg(F.sum("n_rows")).first()[0] or 0
    even_share = max(total / max(n_partitions, 1), 1.0)
    return (
        counts.orderBy(F.col("n_rows").desc(), "key_value")
        .limit(top_k)
        .select(
            "key_value",
            "n_rows",
            (F.col("n_rows") / F.lit(float(total))).alias("row_share"),
            (F.col("n_rows") / F.lit(float(even_share))).alias("skew_ratio"),
        )
    )
