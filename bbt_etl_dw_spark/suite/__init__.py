"""Query suite registry.

Every engine capability (SURVEY.md §2 operator or scale extension) is
exposed as a named query: a builder ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL oracle string for DuckDB.
``__spark_entry__.py`` publishes this registry to the verification driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QueryDef] = {}

_MODULES = (
    "bbt_etl_dw_spark.suite.core",
    "bbt_etl_dw_spark.suite.quality",
    "bbt_etl_dw_spark.suite.star",
    "bbt_etl_dw_spark.suite.text",
    "bbt_etl_dw_spark.suite.vector",
    "bbt_etl_dw_spark.suite.stream",
    "bbt_etl_dw_spark.suite.multimodal",
)


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        QUERIES[name] = QueryDef(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            bench=bench,
        )
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import all suite modules (triggering registration) and return the registry."""
    for m in _MODULES:
        try:
            importlib.import_module(m)
        except ModuleNotFoundError:
            pass  # module not built yet (suite grows round over round)
    return QUERIES
