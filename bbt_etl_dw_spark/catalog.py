"""Table catalog over the synthetic parquet test tables.

The engine's catalog in production would be a metastore; here it is a thin
path-based loader (mirroring the reference's path-as-catalog medallion
layout, reference ``scripts/etl_extract.py:13-14``) over
``$SPARK_GRAFT_SF_DIR/{table}.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bbt_etl_dw_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Columnar parquet scan => pushdown + pruning free."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos-as-long (see session.RUNTIME_CONF): truncate to micros with
        # integer division (exact on int64; float division would lose
        # precision above 2^53) — same truncation DuckDB applies to ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() queries."""
    for n in TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
