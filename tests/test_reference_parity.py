"""Golden parity against the reference's OWN raw CSVs and committed logs.

The strongest available oracle: the engine's audit / clean / enrich
operators, configured reference-exact (plans/reference_parity.py), must
reproduce the byte-stable goldens the reference committed:

- logs/data_processing/2024-12-02/audit_report.json (identical across the
  4 committed runs — BASELINE.md "audit determinism" row)
- logs/anomalies_summary/2024-11-24.txt (Sales 0 / Products 1)
- the gold product-status ladder (BASELINE.md: Active 59 / Obsolete 10 /
  End of Lifecycle 8)
- the gold fact row count 2,151 (the dashboard "Clients" card): the
  reference's inner dimension joins silently drop the 4 rows with
  missing/junk ShipCountry

The Power BI revenue KPIs (Sales per Region EU 808.73K / NA 302.32K /
SA 181.28K) are a SCREENSHOT, not a committed artifact, and are not fully
reproducible from the current raw data: with the gold fact roster (2,151
rows — matching the screenshot's own "Clients 2,151" card) and the
dim-product price measure, SA lands within 0.05% (181.37K vs 181.28K) and
EU within 1.1% (817.54K vs 808.73K), but NA differs by 38.5K — almost
exactly the four Côte-de-Blaye (ProductID 38) NA order lines, indicating
sales.csv gained rows after the screenshot was taken. Every commit-DATED
golden above reproduces exactly, so the test pins the screenshot-adjacent
aggregates as regression values with that provenance documented.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.plans import reference_parity as rp

GOLD_AUDIT = "/root/reference/logs/data_processing/2024-12-02/audit_report.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD_AUDIT), reason="reference goldens not available"
)


@pytest.fixture(scope="module")
def ref_spark(spark):
    """Reference semantics are Spark 3 non-ANSI (plain casts -> null)."""
    prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def golden():
    with open(GOLD_AUDIT) as f:
        return {g["source"]: g for g in json.load(f)}


@pytest.mark.parametrize("source", ["sales", "customers", "products", "suppliers"])
def test_audit_report_golden_parity(ref_spark, golden, source):
    """Missing counts, duplicate rows/columns, and every inconsistency's
    count AND error-id multiset must equal the committed audit report."""
    df, report = rp.reference_audit(ref_spark, source)
    g = golden[source]

    full_missing = {c: report.missing_values.get(c, 0) for c in df.columns}
    assert full_missing == g["missing_values"]

    assert report.duplicate_rows == g["duplicate_rows"]

    ours_dc = [f" - {base}: {', '.join(cols)}"
               for base, cols in report.duplicate_columns.items()]
    assert ours_dc == g["duplicate_columns"]

    gold_inc = {e["column"]: e for e in g["data_type_and_format_inconsistencies"]}
    assert set(report.inconsistencies) == set(gold_inc)
    for col, entry in report.inconsistencies.items():
        assert entry["count"] == gold_inc[col]["error_count"], col
        # ours are sorted (bounded collect); golden are in row order
        assert list(entry["error_ids"]) == sorted(gold_inc[col]["error_ids"]), col


def test_anomalies_golden_parity(ref_spark):
    """logs/anomalies_summary/2024-11-24.txt: Sales 0 / Products 1, with
    the reference's run date pinned."""
    sales = rp.reference_clean(ref_spark, "sales")
    products = rp.reference_clean(ref_spark, "products")
    sales_n, products_n = rp.anomaly_counts(
        sales, products, now=datetime.datetime(2024, 11, 24)
    )
    assert sales_n == 0
    assert products_n == 1


def test_gold_product_status_golden_parity(ref_spark):
    """BASELINE.md 'Products per Status': Active 59 / Obsolete 10 /
    End of Lifecycle 8 via the gold ladder (euro-only last-sold)."""
    sales = rp.reference_clean(ref_spark, "sales")
    products = rp.reference_clean(ref_spark, "products")
    suppliers = rp.reference_clean(ref_spark, "suppliers")
    counts = {
        r["ProductStatus"]: r["n"]
        for r in rp.gold_product_status(sales, products, suppliers)
        .groupBy("ProductStatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"Active": 59, "Obsolete": 10, "End of Lifecycle": 8}


def test_gold_fact_row_count_and_revenue_pins(ref_spark):
    """Fact roster = 2,151 rows (matches the dashboard 'Clients' card; the
    4 dropped rows are the missing/junk-ShipCountry lines the reference's
    inner joins silently lose). Regional revenue pinned per the module
    docstring (SA matches the screenshot to 0.05%)."""
    sales = rp.reference_clean(ref_spark, "sales")
    customers = rp.reference_clean(ref_spark, "customers")
    products = rp.reference_clean(ref_spark, "products")
    tax = rp.bronze(ref_spark, "taxrate")

    fact = rp.gold_fact(sales, customers, tax)
    assert fact.count() == 2151

    prices = products.select(F.col("ProductID").alias("pid"),
                             F.col("UnitPrice").alias("dim_price"))
    measure = F.col("dim_price") * F.col("Quantity") * (1 - F.col("Discount"))
    by_region = {
        r["region_code"]: round(r["t"] / 1000, 2)
        for r in fact.join(prices, fact["ProductID"] == prices["pid"], "left")
        .groupBy("region_code").agg(F.sum(measure).alias("t")).collect()
    }
    # screenshot: EU 808.73 / NA 302.32 / SA 181.28 — see module docstring
    assert by_region == {"EU": 817.54, "NA": 340.87, "SA": 181.37}
