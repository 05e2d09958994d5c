"""Data-quality suite: audit metrics and anomaly rules as oracle-paired
queries (SURVEY §2.10, §2.4 A3/A5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.anomalies import AnomalyRule, anomaly_summary
from bbt_etl_dw_spark.operators.audit import missing_counts
from bbt_etl_dw_spark.suite import register

_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

# o_totalprice is DOUBLE: the operator counts NaN as missing (the audit
# definition) — the oracle must mirror it or it never exercises that
# branch and would red the moment a NaN appears (review finding)
_FLOAT_COLS = {"o_totalprice"}
_MISSING_ORACLE = "SELECT " + ", ".join(
    (
        f"COUNT(CASE WHEN {c} IS NULL OR isnan({c}) THEN 1 END) AS {c}"
        if c in _FLOAT_COLS
        else f"COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS {c}"
    )
    for c in _ORDERS_COLS
) + " FROM orders"


@register("missing_value_audit", oracle=_MISSING_ORACLE)
def missing_value_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column missing counts in ONE aggregation pass — SURVEY §2.4 A3
    (reference audit_report.py:51-54, which runs this shape per source)."""
    return missing_counts(table(spark, sf_dir, "orders"))


_ANOMALY_ORACLE = """
WITH flagged AS (
    SELECT CASE
        WHEN o_orderdate > TIMESTAMP '2001-06-01 00:00:00' THEN 'future_order'
        WHEN o_totalprice <= 0 THEN 'non_positive_amount'
        WHEN o_totalprice > 400000 THEN 'unrealistic_amount'
    END AS anomaly_type
    FROM orders
)
SELECT anomaly_type, COUNT(*) AS n_anomalies
FROM flagged WHERE anomaly_type IS NOT NULL
GROUP BY anomaly_type ORDER BY anomaly_type
"""


@register("orders_anomaly_summary", oracle=_ANOMALY_ORACLE)
def orders_anomaly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins anomaly ladder + summary counts — SURVEY §2.10
    (reference anomalies.py:42-68: future dates / non-positive amounts /
    unrealistic magnitudes, with first-match labeling; thresholds adapted
    to the synthetic domain)."""
    o = table(spark, sf_dir, "orders")
    rules = [
        AnomalyRule("future_order", F.col("o_orderdate") > F.lit("2001-06-01 00:00:00").cast("timestamp")),
        AnomalyRule("non_positive_amount", F.col("o_totalprice") <= 0),
        AnomalyRule("unrealistic_amount", F.col("o_totalprice") > 400000),
    ]
    return anomaly_summary(o, rules)


_VIOLATIONS_ORACLE = """
SELECT o_orderkey AS id, 'o_totalprice' AS "column", 'below 400000' AS expected
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey AS id, 'o_orderpriority' AS "column", 'not urgent while open' AS expected
FROM orders WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
ORDER BY id, "column"
"""


@register("orders_violations_table", oracle=_VIOLATIONS_ORACLE)
def orders_violations_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit engine's 100TB output mode: rule violations emitted as a
    TABLE (id, column, expected) instead of collect()ed ids — SURVEY §4
    'per-rule filter+collect' fix. One narrow pass, array-of-structs
    explode, nothing on the driver."""
    from bbt_etl_dw_spark.operators.audit import AuditRule, violations

    o = table(spark, sf_dir, "orders")
    rules = [
        AuditRule("o_totalprice", "below 400000", F.col("o_totalprice") > 400000),
        AuditRule(
            "o_orderpriority",
            "not urgent while open",
            (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"),
        ),
    ]
    return violations(o, rules, "o_orderkey").orderBy("id", "column")


# --- Benford first-digit audit -------------------------------------------

from bbt_etl_dw_spark.operators.stats import benford_digit_audit, sql_benford_ctes

_BENFORD_ORACLE = f"""
WITH {sql_benford_ctes("SELECT l_extendedprice FROM lineitem", "l_extendedprice")}
SELECT digit, n_obs, share_obs, benford_share, chisq_term
FROM benford
ORDER BY digit
"""


@register("lineitem_benford_audit", oracle=_BENFORD_ORACLE)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of extended price against
    Benford's law — the forensic screen for fabricated or truncated
    money columns, as a quality-audit query. Digit extraction is a
    power-of-ten CASE ladder (correctly-rounded divide + floor — no
    log10, no string formatting, both engine-divergent); the Benford
    probabilities are host-precomputed double literals shared by builder
    and oracle. One hash-agg over the fact; out-of-range values surface
    as the digit-0 row instead of silently dropping
    (operators/stats.benford_digit_audit)."""
    li = table(spark, sf_dir, "lineitem")
    return benford_digit_audit(li, "l_extendedprice").orderBy("digit")
