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
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not contain the reserved column {CORRUPT_COL!r}")
    # Read as text + from_json rather than spark.read.json: filtering on
    # the json reader's corrupt column requires caching the scan (a
    # non-starter at 100TB); the text formulation is one streamed scan,
    # no cache, and both outputs stay lazy.
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
    )
    good = parsed.filter(
        F.col("j").isNotNull() & F.col(f"j.{CORRUPT_COL}").isNull()
    ).select(
        # backtick-quoted: a field name containing dots must resolve as
        # one struct field, not a nested path (same guard as catalog.py)
        *[F.col(f"j.`{f.name}`").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(
        F.col("j").isNull() | F.col(f"j.{CORRUPT_COL}").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    partitions: int | None = None,
    shuffle: bool = False,
) -> None:
    """Write a corpus as JSONL (one object per line). ``partitions``
    controls output file count (JSONL consumers often want few big
    shards); omit to keep the upstream partitioning.

    The default file-count reduction is ``coalesce`` — merging files
    needs no exchange, and a full repartition shuffled the entire corpus
    once per export (review finding). The trade-off: coalesce folds into
    the final stage, so everything since the last shuffle boundary runs
    at ``partitions`` parallelism — pass ``shuffle=True`` when the
    upstream compute is heavy and narrow (e.g. re-encoding straight off
    a many-file scan) so it stays wide and only the write funnels."""
    out = df
    if partitions:
        out = df.repartition(partitions) if shuffle else df.coalesce(partitions)
    out.write.mode("overwrite").json(path)
