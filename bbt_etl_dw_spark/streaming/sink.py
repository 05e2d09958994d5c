"""Streaming sinks beyond the built-ins: foreachBatch integration.

``foreachBatch`` is the production bridge from a stream to any batch
writer — JDBC, MERGE into a dimension, partitioned-parquet restatement.
Each micro-batch DataFrame is handed to a plain batch function with the
batch id, so exactly-once-per-restart reduces to making that function
idempotent.

The partitioned-parquet pattern here is APPEND-mode windowed aggregates
partitioned BY THE WINDOW START: a window's groups are all emitted
together, exactly once, when the watermark passes its end — so a dynamic
partition overwrite of that window's partition is complete, incremental,
and idempotent under micro-batch replay. (Update mode + partition
overwrite would be WRONG: an update batch holds only changed groups, and
overwriting a partition with a partial group set silently drops the
rest.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def partition_overwrite_writer(
    path: str, partition_col: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: write the micro-batch to parquet partitioned
    by ``partition_col``, dynamically overwriting ONLY the partitions the
    batch touches."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )

    return write


def stream_to_partitioned_parquet(
    windowed: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "window_start",
):
    """Run a watermarked windowed-aggregate stream into a parquet table
    partitioned by the window start. Append mode: each window lands once,
    complete, when finalized; replays rewrite the same partitions."""
    return (
        windowed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(partition_overwrite_writer(path, partition_col))
        .start()
    )
