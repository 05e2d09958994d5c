"""JDBC warehouse sink/source — SURVEY §2.1 S4 (reference etl_load.py:11-61).

The reference appends 7 gold tables to SQL Server. The engine wraps the
same DataFrameWriter.jdbc API with scale knobs the reference lacks
(batchsize, numPartitions, isolation, truncate-instead-of-drop). No SQL
Server exists in this environment, but Spark bundles embedded Apache Derby
(for the Hive metastore), so the write->read round trip IS executed end to
end against ``jdbc:derby:`` in ``tests/test_sources.py`` — same
DataFrameWriter/DataFrameReader code path a SQL Server URL would take,
only the dialect differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby driver class (ships in pyspark's jars/ since it backs
#: the Hive metastore) — lets S4 execute without an external server.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


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


def read_jdbc(spark: SparkSession, **options: str) -> DataFrame:
    """``spark.read.jdbc`` twin of :func:`write_jdbc`. Pass
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    for a parallel scan; a bare read is one executor task."""
    reader = spark.read.format("jdbc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
