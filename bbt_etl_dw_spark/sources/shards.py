"""Training-shard export: materialize a curated corpus as size-bounded
parquet shards with a verifiable manifest — the hand-off point between the
data pipeline and a training job's data loader.

Loaders (WebDataset/MDS-style) want: (a) shards of roughly equal row/token
size so data-parallel workers stay balanced, (b) a manifest with per-shard
counts for length-based sampling and resumable iteration, and (c) checksums
so a torn copy between object stores is caught before it poisons a run.

Scale shape:
- shard assignment is a pure md5-hash expression on the id column — stable
  under rerun and at any parallelism (never ``rand()``, never
  ``monotonically_increasing_id``), so a re-export after a node failure
  produces byte-identical shard membership;
- ONE range-free shuffle (``repartition`` on the shard id) places rows;
  each shard is written as exactly one file via ``partitionBy``;
- the manifest aggregates in the SAME pass shape (one groupBy over the
  staged frame): per-shard row count, token count, and an
  ORDER-INDEPENDENT content checksum (sum of per-row xxhash64 as unsigned
  128-bit-safe decimal) — verifiable by any engine without re-sorting;
- ``verify_shards`` recomputes counts/checksums from the written files and
  compares against the manifest: a silently truncated or duplicated copy
  fails loudly.

The shard count is derived from a driver-side total count and a target
rows-per-shard — one metadata-cheap job; pass ``n_shards`` explicitly to
skip it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_shard_manifest.json"


def _shard_expr(id_col: str, n_shards: int):
    """Deterministic shard id in [0, n_shards): md5-hash bucket of the id
    (same family as split_bucket in operators/textstats.py)."""
    hex12 = F.substring(F.md5(F.concat(F.lit("shard"), F.col(id_col).cast("string"))), 1, 12)
    return F.pmod(F.conv(hex12, 16, 10).cast("long"), F.lit(n_shards)).cast("int")


def _row_checksum(cols: list[str]):
    """Order-independent content checksum: per-row xxhash64 over all
    exported columns (cast to string with a NULL sentinel so NULL != ''),
    summed as decimal (no overflow at any shard size)."""
    encoded = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.sum(F.xxhash64(*encoded).cast("decimal(38,0)")).alias("checksum")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    target_rows_per_shard: int = 100_000,
    n_shards: int | None = None,
) -> dict:
    """Export ``df`` as ``shard=N/`` parquet directories plus a manifest.

    Returns the manifest dict (also written to ``path/_shard_manifest.json``).
    Token counts use the whitespace tokenizer when ``text_col`` is given.
    """
    if n_shards is None:
        total = df.count()
        n_shards = max(1, -(-total // target_rows_per_shard))
    staged = df.withColumn("shard", _shard_expr(id_col, n_shards))
    # one file per shard: repartition BY the shard column so each write
    # task holds exactly one shard's rows
    (
        staged.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

    data_cols = df.columns
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        _row_checksum(data_cols),
    ]
    if text_col is not None:
        from bbt_etl_dw_spark.operators.textstats import whitespace_token_count

        aggs.append(F.sum(whitespace_token_count(text_col)).alias("n_tokens"))
    per_shard = staged.groupBy("shard").agg(*aggs).orderBy("shard").collect()

    shards = []
    for r in per_shard:
        entry = {
            "shard": r["shard"],
            "n_rows": r["n_rows"],
            "checksum": str(r["checksum"]),
        }
        if text_col is not None:
            entry["n_tokens"] = int(r["n_tokens"] or 0)
        shards.append(entry)
    manifest = {
        "format": "parquet",
        "n_shards": n_shards,
        "id_col": id_col,
        "columns": data_cols,
        "total_rows": int(sum(s["n_rows"] for s in shards)),
        "shards": shards,
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Recompute per-shard counts/checksums from the WRITTEN files and
    diff against the manifest. Returns one row per discrepancy (empty =
    intact); missing shards and extra shards both surface."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    data_cols = [c for c in manifest["columns"]]
    actual = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"), _row_checksum(data_cols))
    )
    expected = spark.createDataFrame(
        [
            (s["shard"], s["n_rows"], s["checksum"])
            for s in manifest["shards"]
        ],
        "shard int, m_rows long, m_checksum string",
    ).withColumn("m_checksum", F.col("m_checksum").cast("decimal(38,0)"))
    return (
        actual.join(expected, "shard", "full_outer")
        .filter(
            F.col("n_rows").isNull()
            | F.col("m_rows").isNull()
            | (F.col("n_rows") != F.col("m_rows"))
            | ~F.col("checksum").eqNullSafe(F.col("m_checksum"))
        )
        .select("shard", "n_rows", "m_rows", "checksum", "m_checksum")
    )
