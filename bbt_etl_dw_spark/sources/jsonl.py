"""JSONL source/sink — the canonical training-corpus interchange format.

Mirrors the engine's dirty-CSV discipline (reference `scripts/
etl_extract.py:48` reads with inferSchema; we require explicit schemas, see
`sources/csv.py`): PERMISSIVE parsing with a quarantine column, so one
malformed line never fails a 100TB read, and bad records are auditable
instead of silently dropped.

Scale notes: JSON text scans are CPU-heavy but embarrassingly parallel
(file-split bounded); a JSONL landing zone is normally compacted to
parquet immediately (`sources/parquet.write_snapshot` /
`compact.compact_to_target`) so downstream passes get columnar pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with an explicit schema contract.

    Returns ``(good, quarantined)``: rows that parsed cleanly (corrupt
    column dropped) and raw lines that did not (kept verbatim for audit —
    the reference's audit-report philosophy applied to ingestion). Fields
    present in the data but absent from the schema are ignored; fields in
    the schema but absent from a line are null."""
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materialization before filtering on the
    # corrupt column of a JSON scan (the referenced-column-only pushdown
    # would otherwise optimize the corrupt marker away).
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a corpus as JSONL (one object per line). ``partitions``
    controls output file count (JSONL consumers often want few big
    shards); omit to keep the upstream partitioning."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
