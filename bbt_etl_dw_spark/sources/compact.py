"""Size-targeted compaction — small-files management for the lake.

A 100TB table accumulated from streaming micro-batches or per-round
appends degrades into millions of small files: every scan pays per-file
open cost and the driver pays listing cost. Compaction rewrites a
directory into files near a target size.

The engine computes the target file count from the data itself (sampled
average row width x row count / target bytes) rather than guessing a
partition number, then round-robin repartitions — one shuffle, evenly
sized outputs. With ``sort_by``, files are additionally range-partitioned
and sorted so min/max parquet statistics become selective (the poor-man's
Z-order for a single key)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def estimate_row_bytes(df: DataFrame, sample_rows: int = 1000) -> float:
    """Average serialized row width from a bounded sample (never a full
    scan): JSON length is a stable proxy for parquet-decoded width."""
    from pyspark.sql import functions as F

    sampled = df.limit(sample_rows).select(
        F.avg(F.length(F.to_json(F.struct("*")))).alias("w")
    )
    w = sampled.collect()[0]["w"]
    return float(w or 64.0)


def compact_to_target(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    sort_by: str | None = None,
    parquet_ratio: float = 4.0,
    total_bytes: float | None = None,
) -> int:
    """Rewrite ``df`` as parquet files near ``target_file_mb`` each.
    Returns the file count chosen. Row count comes from a count() action
    (cheap columnar metadata scan for parquet inputs).

    The JSON-width sample measures DECODED text width; parquet's encoding
    + compression lands well below that, so the estimate divides by
    ``parquet_ratio`` (typical dictionary+snappy ratio; tune per table —
    or pass ``total_bytes`` directly when the true on-disk size is known,
    as :func:`compact_directory` does, which needs no estimate at all)."""
    if total_bytes is None:
        total_bytes = df.count() * estimate_row_bytes(df) / parquet_ratio
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(path)
    return n_files


def compact_directory(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    sort_by: str | None = None,
) -> int:
    """Compact an existing parquet directory into ``dst``. Sizes from the
    ACTUAL on-disk bytes (filesystem listing) — exact, no sampling."""
    import glob
    import os

    on_disk = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "**"), recursive=True)
        if os.path.isfile(f)
    )
    return compact_to_target(
        spark.read.parquet(src),
        dst,
        target_file_mb,
        sort_by=sort_by,
        total_bytes=float(on_disk),
    )
