"""Sources layer tests: dirty-CSV ingestion parity (dup headers, ragged
rows, quoted commas), medallion parquet snapshots, report round-trip."""

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.audit import audit, rule_positive_number
from bbt_etl_dw_spark.sources.csv import dedup_headers, read_csv, read_headers
from bbt_etl_dw_spark.sources.jdbc import DERBY_DRIVER, jdbc_options, read_jdbc, write_jdbc
from bbt_etl_dw_spark.sources.parquet import read_snapshot, write_snapshot
from bbt_etl_dw_spark.sources.report import read_audit_json, write_audit_json, write_audit_txt

DIRTY_CSV = """OrderID,CustomerID,ShipAddress,Freight,OrderID,UnitPrice
1,ALFKI,"Rua do Paço, 67",12.5,1,9.99
2,ANATR,Main St 5,-3.0,2,15.00
3,BERGS,Short row,4.2
4,BONAP,"Quote ""inner"" test",8.0,4,20.5
"""


def _write_tmp(content: str) -> str:
    d = tempfile.mkdtemp()
    p = Path(d) / "sales.csv"
    p.write_text(content)
    return str(p)


def test_dedup_headers():
    assert dedup_headers(["OrderID", "A", "OrderID"]) == ["OrderID0", "A", "OrderID2"]
    assert dedup_headers(["a", "b"]) == ["a", "b"]


def test_read_headers_quoted(spark):
    path = _write_tmp(DIRTY_CSV)
    assert read_headers(spark, path) == [
        "OrderID0",
        "CustomerID",
        "ShipAddress",
        "Freight",
        "OrderID4",
        "UnitPrice",
    ]


def test_read_csv_dirty(spark):
    path = _write_tmp(DIRTY_CSV)
    df = read_csv(spark, path)
    rows = {r["OrderID0"]: r for r in df.collect()}
    assert len(rows) == 4
    # quoted comma preserved
    assert rows["1"]["ShipAddress"] == "Rua do Paço, 67"
    # embedded escaped quotes
    assert rows["4"]["ShipAddress"] == 'Quote "inner" test'
    # ragged row null-padded (PERMISSIVE)
    assert rows["3"]["OrderID4"] is None and rows["3"]["UnitPrice"] is None
    # audit over the ingested strings sees the dup column + bad freight
    rep = audit(df, "sales", id_col="OrderID0", rules=[rule_positive_number("Freight")])
    assert rep.duplicate_columns == {"OrderID": ["OrderID0", "OrderID4"]}
    assert rep.inconsistencies["Freight"]["count"] == 1


def test_parquet_snapshot_roundtrip(spark):
    root = tempfile.mkdtemp()
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_snapshot(df, root, "bronze", "t", "2024-01-01")
    write_snapshot(df.withColumn("v", F.upper("v")), root, "bronze", "t", "2024-01-02")
    day1 = read_snapshot(spark, root, "bronze", "t", "2024-01-01")
    allrows = read_snapshot(spark, root, "bronze", "t")
    assert day1.count() == 2 and allrows.count() == 4
    assert {r["v"] for r in day1.collect()} == {"a", "b"}
    # dynamic overwrite replaces only its own partition
    write_snapshot(df.limit(1), root, "bronze", "t", "2024-01-02")
    assert read_snapshot(spark, root, "bronze", "t").count() == 3


def test_report_roundtrip(spark):
    df = spark.createDataFrame([("x", -1.0), ("y", 2.0)], "id string, amt double")
    rep = audit(df, "src", id_col="id", rules=[rule_positive_number("amt")])
    d = tempfile.mkdtemp()
    write_audit_json([rep], f"{d}/audit.json")
    write_audit_txt([rep], f"{d}/audit.txt")
    loaded = read_audit_json(f"{d}/audit.json")
    assert loaded[0]["source"] == "src"
    assert loaded[0]["inconsistencies"]["amt"]["count"] == 1
    assert "inconsistent amt" in Path(f"{d}/audit.txt").read_text()


def test_jdbc_options():
    opts = jdbc_options("jdbc:sqlserver://h:1433;db=dw", "FactSales", user="u", num_partitions=8)
    assert opts["dbtable"] == "FactSales" and opts["numPartitions"] == "8"


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S4 executed end to end: write a gold-shaped table over real JDBC
    (embedded Derby — same DataFrameWriter path as SQL Server, different
    dialect) and read it back via a partitioned parallel scan."""
    url = f"jdbc:derby:{tmp_path}/dw;create=true"
    gold = spark.range(100).select(
        F.col("id").alias("SalesID"),
        (F.col("id") % 7).alias("ClientID"),
        (F.col("id") * 1.5).alias("TotalAmount"),
        F.concat(F.lit("P"), F.col("id") % 5).alias("ProductRef"),
    )
    opts = jdbc_options(url, "FactSales", driver=DERBY_DRIVER, batchsize=50)
    write_jdbc(gold, mode="overwrite", **opts)
    # appends accumulate, like the reference's etl_load append mode
    write_jdbc(gold.limit(10), mode="append", **opts)

    back = read_jdbc(
        spark, **opts, partitionColumn="SalesID", lowerBound="0",
        upperBound="100", numPartitions="4",
    )
    assert back.count() == 110
    assert back.rdd.getNumPartitions() == 4
    got = {
        (r["SalesID"], r["ClientID"], r["TotalAmount"], r["ProductRef"])
        for r in back.filter(F.col("SalesID") < 10).distinct().collect()
    }
    want = {(i, i % 7, i * 1.5, f"P{i % 5}") for i in range(10)}
    assert got == want


def test_snapshot_partition_pruning_plan(spark, tmp_path):
    """Directory-level partition pruning: filtering on snapshot_date must
    appear as PartitionFilters on the scan (pruned before any IO), and the
    pruned read must touch only the matching partition."""
    import contextlib
    import io

    root = str(tmp_path)
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("k"))
    write_snapshot(df, root, "silver", "sales", "2024-01-01")
    write_snapshot(df, root, "silver", "sales", "2024-01-02")

    pruned = read_snapshot(spark, root, "silver", "sales", "2024-01-02")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "2024-01-02" in plan  # the literal reached the scan's pruning
    assert pruned.count() == 100

    # dynamic overwrite of one day leaves the other day intact
    write_snapshot(df.limit(10), root, "silver", "sales", "2024-01-02")
    assert read_snapshot(spark, root, "silver", "sales", "2024-01-02").count() == 10
    assert read_snapshot(spark, root, "silver", "sales", "2024-01-01").count() == 100
