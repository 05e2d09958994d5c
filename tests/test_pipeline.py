"""End-to-end test of the reference's full script DAG as one call:
dirty fixture (FIXTURES.md dirt) -> audit -> report-driven clean ->
enrich -> tax -> currency as-of -> anomalies."""

import datetime

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.plans.pipeline import run_sales_pipeline


@pytest.fixture(scope="module")
def raw(spark):
    # dup header columns, M/d/yy dates, contaminated numerics, negative
    # freight, null discount, charset-dirty country, one full-dup row
    rows = [
        (1, "ALFKI", "7/4/22", "10.00", "Germany", 1, "12.5", "10", 0.1),
        (2, "ANATR", "12/25/23", "-65.83", "UK", 2, "9a.99", "0", None),
        (3, "BERGS", "2022-03-05", "5.25", "Germani#", 3, "15.0", "-4", 0.25),
        (3, "BERGS", "2022-03-05", "5.25", "Germani#", 3, "15.0", "-4", 0.25),
        (4, "FRANK", "1/15/23", "3.00", "Germany", 4, "-5", "2", 0.0),
    ]
    return spark.createDataFrame(
        rows,
        "OrderID0 int, CustomerID string, OrderDate string, Freight string, "
        "ShipCountry string, OrderID14 int, UnitPrice string, Quantity string, "
        "Discount double",
    )


@pytest.fixture(scope="module")
def tax(spark):
    return spark.createDataFrame(
        [("Germany", 0.19), ("UK", 0.20)], "ShipCountry string, TaxRate double"
    )


@pytest.fixture(scope="module")
def rates(spark):
    # Germany gets a rate change between the two relevant dates; UK has
    # only an older rate (as-of must fall back to it); Unknown has none.
    return spark.createDataFrame(
        [
            ("Germany", datetime.date(2022, 1, 1), 0.90),
            ("Germany", datetime.date(2022, 7, 4), 0.95),
            ("UK", datetime.date(2023, 1, 1), 0.80),
        ],
        "ShipCountry string, OrderDate date, Rate double",
    )


@pytest.fixture(scope="module")
def result(spark, raw, tax, rates):
    return run_sales_pipeline(raw, tax_rates=tax, exchange_rates=rates)


def test_audit_drives_cleaning(result):
    assert result.report.duplicate_columns == {"OrderID": ["OrderID0", "OrderID14"]}
    assert result.report.duplicate_rows == 1
    rows = {r["OrderID"]: r for r in result.cleaned.collect()}
    assert len(rows) == 4  # dup row dropped, dup column merged+renamed
    assert rows[1]["OrderDate"] == datetime.date(2022, 7, 4)  # M/d/yy pivot
    assert rows[2]["UnitPrice"] == 9.99  # letter-contaminated strip-cast
    assert rows[2]["Freight"] == 0.0  # negative money clamped
    assert rows[3]["Quantity"] == 1  # non-positive -> 1
    assert rows[2]["Discount"] == 0.0  # null filled 0.0 (data_cleaning.py policy)
    assert rows[3]["ShipCountry"] == "Unknown"  # charset repair
    assert rows[4]["UnitPrice"] == 0.0  # negative money clamped


def test_enrichment_tax_and_asof_rates(result):
    rows = {r["OrderID"]: r for r in result.enriched.collect()}
    r1 = rows[1]
    assert r1["TotalAmount"] == pytest.approx(12.5 * 10 * 0.9)
    assert r1["ContinentCode"] == "EU" and r1["CountryCode"] == "DEU"
    assert r1["TaxRate"] == 0.19
    assert r1["TaxAmount"] == pytest.approx(r1["TotalAmount"] * 0.19)
    assert r1["Rate"] == 0.95  # exact-date match on the 7/4/22 revision
    assert rows[2]["Rate"] == 0.80  # backward as-of fallback to last known
    assert rows[3]["Rate"] is None and rows[3]["AmountUSD"] == pytest.approx(
        rows[3]["TotalAmount"]
    )  # no series for repaired country -> rate defaults out
    assert rows[3]["TaxRate"] == 0.0  # unknown country -> no-tax fallback


def test_anomaly_outputs(result):
    counts = {r["anomaly_type"]: r["n_anomalies"] for r in result.anomalies.collect()}
    # order 2: qty clamped to 1, price 9.99, null discount filled 0.0 ->
    # TotalAmount 9.99, NOT an anomaly (a missing discount must not zero
    # revenue). Order 4's negative price clamps to 0.0 -> TotalAmount 0 ->
    # non_positive. Freight was clamped so no negative_freight rows survive.
    assert counts == {"non_positive_amount": 1}
    flagged = {r["OrderID"]: r["anomaly_type"] for r in result.flagged.collect()}
    assert flagged[4] == "non_positive_amount"
    assert flagged[2] is None
    assert flagged[1] is None


def test_pipeline_is_lazy_after_audit(spark, raw):
    # no tax/rates: still builds; outputs are plain lazy DataFrames
    res = run_sales_pipeline(raw)
    assert res.enriched.schema is not None
    assert "TotalAmount" in res.enriched.columns
