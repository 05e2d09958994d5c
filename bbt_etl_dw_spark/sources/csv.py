"""CSV ingestion — SURVEY §2.1 S1 with the reference's dirty-CSV semantics.

The reference relies on ``inferSchema=True`` (double scan, §4) and on
Spark's header handling to surface duplicate header names as
position-suffixed columns (raw sales.csv has ``OrderID`` at positions 0
and 14 -> ``OrderID0``/``OrderID14``; SURVEY §1.2). This module makes both
deliberate:

- ``read_headers`` reads ONLY the header line (one tiny job, no data scan)
  and applies the position-suffix dedup rule.
- ``read_csv`` then scans once with explicit names and (optionally) an
  explicit type schema — PERMISSIVE mode, so ragged rows null-pad instead
  of failing (the raw sales file has one 18-field row) and quoted commas
  parse correctly.
"""

from __future__ import annotations

import csv as _csv
import io
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dedup_headers(names: list[str]) -> list[str]:
    """Position-suffix duplicate header names (OrderID @ 0,14 ->
    OrderID0, OrderID14) — matches Spark's own dedup rule that the
    reference's audit detects (audit_report.py:63-84)."""
    counts = Counter(names)
    return [f"{n}{i}" if counts[n] > 1 else n for i, n in enumerate(names)]


def read_headers(spark: SparkSession, path: str) -> list[str]:
    """Parse the header row (quoted-comma aware) without scanning data."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    row = next(_csv.reader(io.StringIO(first[0][0])))
    return dedup_headers([c.strip() for c in row])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    column_names: list[str] | None = None,
) -> DataFrame:
    """One-scan CSV read. With ``schema``: explicit types (no inference
    double-scan). Without: all-string columns named via header dedup —
    types are the cleaning stage's job (audit rules operate on strings)."""
    reader = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("quote", '"')
        .option("escape", '"')
    )
    if schema is not None:
        return reader.schema(schema).csv(path)
    names = column_names or read_headers(spark, path)
    st = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    return reader.schema(st).csv(path)
