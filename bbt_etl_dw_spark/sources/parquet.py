"""Medallion parquet layout — SURVEY §2.1 S2/S3.

The reference's bronze/silver/gold directories are date-named snapshot
paths with no Spark partitioning (``etl_extract.py:42``). The engine keeps
the medallion layers but writes real partitioned parquet: at 100TB a
snapshot-per-run layout forces full rewrites and no pruning; partitioning
by snapshot_date (and optionally a domain column) gives partition pruning
and incremental loads for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def layer_path(root: str, layer: str, source: str) -> str:
    return f"{root.rstrip('/')}/{layer}/{source}"


def write_snapshot(
    df: DataFrame,
    root: str,
    layer: str,
    source: str,
    snapshot_date: str,
    partition_by: Sequence[str] = (),
) -> str:
    """Write one snapshot partition (dynamic overwrite: re-running a day
    replaces that day only, not the whole table)."""
    path = layer_path(root, layer, source)
    out = df.withColumn("snapshot_date", F.lit(snapshot_date))
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_date", *partition_by)
        .parquet(path)
    )
    return path


def read_snapshot(
    spark: SparkSession, root: str, layer: str, source: str, snapshot_date: str | None = None
) -> DataFrame:
    """Read a layer table; filtering on snapshot_date prunes partitions."""
    df = spark.read.parquet(layer_path(root, layer, source))
    if snapshot_date is not None:
        df = df.filter(F.col("snapshot_date") == snapshot_date)
    return df
