"""Reference-exact parity pipeline over the reference's OWN raw CSVs.

The engine's operators (audit, report-driven clean, geo enrichment, star
assembly) configured to reproduce the reference byte-for-byte on its
committed goldens:

- audit counts + error-id multisets: ``logs/data_processing/2024-12-02/
  audit_report.json`` (reference ``audit_report.py:41-141``)
- anomaly summary Sales 0 / Products 1: ``logs/anomalies_summary/
  2024-11-24.txt`` (``anomalies.py:42-126``, run date pinned)
- gold product-status ladder Active 59 / Obsolete 10 / End of Lifecycle 8:
  ``map_cols.py:116-123``
- gold fact row count 2,151 (= the dashboard "Clients" card): the
  reference's INNER dimension joins silently drop the 4 rows whose
  ShipCountry is missing/junk (``map_cols.py:228-265`` — the row loss the
  engine's own star path refuses to replicate, ``plans/star.py``).

Reference semantics replicated here and ONLY here (the engine's defaults
deliberately fix them — SURVEY §4):

- numeric junk-strip drops the SIGN (``data_cleaning.py:54`` strips
  ``[^\\d.]``, so ``'-25'`` becomes ``25``); engine default keeps it
- dates not matching M/d/yy are NULLED, including valid ISO dates
  (``data_cleaning.py:184-190``); engine default tries formats in order
- the audit's "positive" rules actually test ``< 0`` (non-negative) for
  most columns (``audit_report.py:113-120``)
- Spark 3 non-ANSI cast/comparison semantics (the parity session must run
  with ``spark.sql.ansi.enabled=false``)
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.geo import continent_expr, iso3_expr
from bbt_etl_dw_spark.operators.audit import AuditReport, AuditRule, audit
from bbt_etl_dw_spark.operators.clean import CleaningConfig, CleaningPlan

RAW_DIR = "/root/reference/data/raw"
ISO_DATE = r"^\d{4}-\d{2}-\d{2}$"
PHONE = r"^[0-9.()\- ]*$"
ALPHA = r"^[a-zA-Z ]+$"
# reference data_cleaning.py:54 — strips EVERYTHING but digits and dots,
# including the minus sign ('-25' -> '25')
REF_STRIP = r"[^0-9.]"
M_D_YY = r"^[0-9]{1,2}/[0-9]{1,2}/[0-9]{2}$"
EUROZONE = (
    "France", "Italy", "Germany", "Austria", "Spain", "Portugal",
    "Netherlands", "Finland", "Belgium", "Greece", "Ireland", "Slovakia",
    "Slovenia", "Estonia", "Lithuania", "Latvia", "Luxembourg", "Malta",
)  # sales_currency.py:101-103

ID_COLUMNS = {
    "sales": "OrderID0",
    "customers": "CustomerID",
    "products": "ProductID",
    "suppliers": "SupplierID",
}


def bronze(spark: SparkSession, source: str, raw_dir: str = RAW_DIR) -> DataFrame:
    """The reference's bronze read (``etl_extract.py:48``): header +
    inferSchema (duplicate headers become OrderID0/OrderID14)."""
    return spark.read.csv(f"{raw_dir}/{source}.csv", header=True, inferSchema=True)


def _date_rules(df: DataFrame) -> list[AuditRule]:
    # audit_report.py:103-109 — every column with "Date" in the name; NULL
    # rows fall out of the reference's filter, so guard with isNotNull
    return [
        AuditRule(c, "date in YYYY-MM-DD format",
                  F.col(c).isNotNull() & ~F.col(c).cast("string").rlike(ISO_DATE))
        for c in df.columns if "Date" in c
    ]


def _num_rule(col: str, kind: str, op: str) -> AuditRule:
    # audit_report.py:113-138 — cast-null OR negative (op '<') /
    # non-positive (op '<='), labels notwithstanding
    c = F.col(col)
    casted = c.cast("float" if kind == "float" else "int")
    pred = casted.isNull() | ((c < 0) if op == "<" else (c <= 0))
    return AuditRule(col, f"positive {'float' if kind == 'float' else 'integer'}", pred)


def _charset_rule(col: str, regex: str, label: str) -> AuditRule:
    return AuditRule(col, label, F.col(col).isNotNull() & ~F.col(col).rlike(regex))


def reference_audit_rules(source: str, df: DataFrame) -> list[AuditRule]:
    """The reference's per-source rule set, predicate-exact
    (``audit_report.py:102-138``)."""
    if source == "sales":
        return _date_rules(df) + [
            _num_rule("Freight", "float", "<"),
            _num_rule("UnitPrice", "float", "<"),
            _num_rule("Discount", "float", "<"),
            _num_rule("OrderID0", "int", "<="),
            _num_rule("EmployeeID", "int", "<"),
            _num_rule("ShipVia", "int", "<"),
            _num_rule("Quantity", "int", "<"),
            _num_rule("ProductID", "int", "<"),
        ]
    if source in ("customers", "suppliers"):
        rules = [
            _charset_rule("Phone", PHONE, "numeric with . ( ) - symbols"),
            _charset_rule("Fax", PHONE, "numeric with . ( ) - symbols"),
            AuditRule("Address", "must be a non-empty string",
                      F.col("Address").isNull() | (F.col("Address") == "")),
            _charset_rule("Country", ALPHA,
                          "must contain only alphabetic characters and spaces"),
        ]
        if source == "suppliers":
            rules.append(_num_rule("SupplierID", "int", "<="))
        return rules
    if source == "products":
        return [
            _num_rule("ProductID", "int", "<="),
            _num_rule("SupplierID", "int", "<="),
            _num_rule("CategoryID", "int", "<="),
            _num_rule("UnitsInStock", "int", "<="),
            _num_rule("UnitsOnOrder", "int", "<="),
            _num_rule("ReorderLevel", "int", "<="),
            _num_rule("UnitPrice", "float", "<="),
        ]
    return []


def reference_audit(spark: SparkSession, source: str, raw_dir: str = RAW_DIR,
                    max_ids: int = 5000) -> tuple[DataFrame, AuditReport]:
    df = bronze(spark, source, raw_dir)
    report = audit(df, source, id_col=ID_COLUMNS[source],
                   rules=reference_audit_rules(source, df), max_ids=max_ids)
    return df, report


_CLEAN_CONFIGS = {
    # data_cleaning.py:80-105 fill policy + :151-164 numeric fixes applied
    # to the columns the committed audit flags; dates forced M/d/yy-only
    # (:184-190 nulls everything else)
    "sales": CleaningConfig(
        fill_text=("ShipRegion", "ShipPostalCode", "ShipCountry",
                   "ShipAddress", "ShipCity", "ShipName"),
        fill_money=("Freight", "UnitPrice", "Discount"),
        fill_quantity=("Quantity",),
        money_cols=("Freight", "UnitPrice", "Discount"),
        quantity_cols=("Quantity",),
        date_cols=("OrderDate", "RequiredDate", "ShippedDate"),
        date_formats=("M/d/yy",),
        strip_regex=REF_STRIP,
    ),
    "customers": CleaningConfig(
        fill_text=("CompanyName", "City", "Region", "PostalCode", "Fax",
                   "Phone", "ContactName", "ContactTitle", "Address", "Country"),
        phone_cols=("Phone", "Fax"),
        country_cols=("Country",),
    ),
    "suppliers": CleaningConfig(
        fill_text=("CompanyName", "City", "Region", "PostalCode", "Fax",
                   "Phone", "ContactName", "ContactTitle", "Address",
                   "Country", "HomePage"),
        phone_cols=("Phone", "Fax"),
        country_cols=("Country",),
    ),
    "products": CleaningConfig(
        fill_text=("ProductName", "QuantityPerUnit"),
        # only the columns the committed audit flags (UnitsInStock /
        # UnitsOnOrder / ReorderLevel zeros -> 1; UnitPrice junk-strip)
        quantity_cols=("UnitsInStock", "UnitsOnOrder", "ReorderLevel"),
        money_cols=("UnitPrice",),
        strip_regex=REF_STRIP,
    ),
}


def reference_clean(spark: SparkSession, source: str,
                    raw_dir: str = RAW_DIR) -> DataFrame:
    """bronze -> audit -> report-driven clean, reference-exact."""
    df, report = reference_audit(spark, source, raw_dir)
    return CleaningPlan.from_report(report, _CLEAN_CONFIGS[source]).apply(df)


def product_status(products: DataFrame) -> F.Column:
    """add_columns.py:134-139 silver ladder."""
    return (
        F.when(F.col("Discontinued") == 1, "Discontinued")
        .when(F.col("UnitsInStock") < 10, "Low Stock")
        .when((F.col("UnitsInStock") > 0) | (F.col("UnitsOnOrder") > 0), "Active")
        .otherwise("Inactive")
    )


def euro_product_sales(sales: DataFrame, products: DataFrame,
                       suppliers: DataFrame) -> DataFrame:
    """sales_currency.py's surviving rows: the exchange-date parse
    (:69 wrong format string) nulls every exchange date, so only
    Eurozone-supplier products get an ExchangeID (:101-107) — the rest are
    silently dropped by the gold fact's inner join."""
    pc = products.join(
        suppliers, products["SupplierID"] == suppliers["SupplierID"], "inner"
    ).select(products["ProductID"].alias("pc_pid"),
             suppliers["Country"].alias("ProductCountry"))
    joined = sales.join(pc, sales["ProductID"] == pc["pc_pid"], "left")
    return joined.filter(F.col("ProductCountry").isin(*EUROZONE)).drop("pc_pid")


def gold_product_status(sales_clean: DataFrame, products_clean: DataFrame,
                        suppliers_clean: DataFrame) -> DataFrame:
    """map_cols.py:116-123 gold ladder: last-sold from the euro-only
    with_currency sales, datediff vs the hard-coded 2024-01-01."""
    euro = euro_product_sales(sales_clean, products_clean, suppliers_clean)
    last_sold = euro.groupBy("ProductID").agg(F.max("OrderDate").alias("LastSoldDate"))
    p = products_clean.withColumn("product_status", product_status(products_clean))
    return (
        p.join(last_sold, "ProductID", "left")
        .withColumn(
            "ProductStatus",
            F.when(F.col("product_status") == "Discontinued", "Obsolete")
            .when((F.col("UnitsInStock") == 0) & (F.col("UnitsOnOrder") == 0)
                  & (F.datediff(F.lit("2024-01-01"), F.col("LastSoldDate")) > 365),
                  "Obsolete")
            .when((F.col("product_status") == "Low Stock")
                  | (F.datediff(F.lit("2024-01-01"), F.col("LastSoldDate")) > 180),
                  "End of Lifecycle")
            .otherwise("Active"),
        )
    )


def gold_fact(sales_clean: DataFrame, customers_clean: DataFrame,
              raw_tax: DataFrame) -> DataFrame:
    """map_cols.py:228-265 fact roster with the reference's INNER joins:
    customers, calendar (2022-01-01..2025-01-01), tax by iso(ShipCountry) +
    order year. Rows whose ShipCountry is 'Unknown'/junk get no TaxRateID
    and vanish — 2,155 raw lines become 2,151 fact rows."""
    tax = raw_tax.withColumn("tax_iso", iso3_expr("Country")).select("tax_iso", "Year")
    s = sales_clean.withColumn("ship_iso", iso3_expr("ShipCountry")).withColumn(
        "order_year", F.year("OrderDate")
    )
    return (
        s.join(customers_clean.select("CustomerID"), "CustomerID", "inner")
        .filter(F.col("OrderDate").isNotNull())
        .filter((F.col("OrderDate") >= "2022-01-01") & (F.col("OrderDate") <= "2025-01-01"))
        .join(tax, (F.col("ship_iso") == tax["tax_iso"])
              & (F.col("order_year") == tax["Year"]), "inner")
        .withColumn("region_code", continent_expr("ShipCountry"))
    )


def anomaly_counts(sales_clean: DataFrame, products_clean: DataFrame,
                   now: datetime.datetime) -> tuple[int, int]:
    """anomalies.py:42-126 with the run date pinned (the committed summary
    is from 2024-11-24). The legacy with_currency table it read still had
    every row, so the recent-product set uses the FULL cleaned sales."""
    total = F.col("UnitPrice") * F.col("Quantity") * (1 - F.col("Discount"))
    flagged = sales_clean.withColumn(
        "anomaly_type",
        F.when(F.col("OrderDate") > F.lit(now), "Future Date")
        .when(F.col("Quantity") > 10000, "Unrealistic Quantity")
        .when(total <= 0, "Low or Negative Amount"),
    )
    sales_n = flagged.filter(F.col("anomaly_type").isNotNull()).count()

    recent = (
        sales_clean.filter(F.col("OrderDate") >= F.lit(now - datetime.timedelta(days=365)))
        .select(F.col("ProductID").alias("recent_pid"))
        .distinct()
    )
    p = products_clean.withColumn("product_status", product_status(products_clean))
    products_n = (
        p.join(recent, p["ProductID"] == recent["recent_pid"], "left")
        .filter((F.col("product_status") == "Active") & F.col("recent_pid").isNull())
        .count()
    )
    return sales_n, products_n
