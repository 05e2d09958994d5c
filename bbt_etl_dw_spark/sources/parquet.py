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


def read_resilient(
    spark: SparkSession,
    path: str,
    schema=None,
    report: dict | None = None,
):
    """Parquet scan that survives corrupt and vanishing files — at 100 TB
    a scan touches millions of objects and one truncated upload or
    compaction-deleted file must not kill the job (the default behavior:
    one bad footer fails the whole stage after 4 task retries).

    Sets ``ignoreCorruptFiles`` / ``ignoreMissingFiles`` as PER-READ
    options (never the session-wide conf — other readers in the session
    should keep fail-fast semantics, and silently tolerating corruption
    everywhere is how quality regressions hide). Pass ``schema`` when the
    FIRST file could be the corrupt one — schema inference reads footers
    before the options can protect the scan.

    When ``report`` is given, it is filled with {'files': <count of files
    the index sees>} so callers can alert on unexpected shrinkage — the
    tolerant read's blind spot is that skipped files are silent."""
    reader = (
        spark.read.option("ignoreCorruptFiles", "true")
        .option("ignoreMissingFiles", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if report is not None:
        report["files"] = len(df.inputFiles())
    return df


def overwrite_atomic(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """Replace the dataset at ``path`` with ``df`` via write-to-temp +
    rename, instead of Spark's delete-then-write ``mode("overwrite")``.

    The difference matters for compaction folds that REWRITE a log from
    its own contents: plain overwrite deletes the target first, so a
    failure mid-write (or the loss of an executor holding the
    localCheckpoint blocks backing ``df``) destroys the only copy. Here
    the new dataset is fully committed to ``<path>.__staging__`` before
    the old one is touched; the worst crash outcome is a stale target
    plus a staging dir to clean up, never data loss. The final
    delete+rename window is not transactional (HDFS rename is atomic,
    the preceding delete is separate) — callers that need concurrent
    readers during the swap belong on a table format, not raw parquet.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    staging = f"{path.rstrip('/')}.__staging__"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(staging)
    fs = dst.getFileSystem(conf)
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(
            f"rename {staging} -> {path} failed; the folded data is intact "
            f"in the staging directory"
        )
