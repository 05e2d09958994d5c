"""Driver contract for the spark-graft builder (PySpark target).

Publishes the engine's query suite (bbt_etl_dw_spark.suite): every
implemented SURVEY.md §2 operator is a named query builder plus, where
SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bbt_etl_dw_spark.suite import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    'Sales per Region' — the reference dashboard's headline KPI over the
    full star join chain (SURVEY §2.3 J8 + §2.4 dashboard aggs).
    """
    q = load_all()["sales_by_region"]
    return q.builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
