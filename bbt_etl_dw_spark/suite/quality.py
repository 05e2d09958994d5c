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


# --- categorical concentration profiling (HHI) ------------------------------

from bbt_etl_dw_spark.functions.numeric import dsum as _dsum  # noqa: E402
from bbt_etl_dw_spark.functions.numeric import sql_dsum as _sql_dsum  # noqa: E402

# (label, table, column) — the profiling targets
_HHI_TARGETS = (
    ("documents.lang", "documents", "lang"),
    ("documents.source", "documents", "source"),
    ("events.event_type", "events", "event_type"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
    ("part.p_brand", "part", "p_brand"),
)


def _hhi_branch_sql(label: str, tbl: str, col: str) -> str:
    return f"""
SELECT '{label}' AS column_name, n_categories,
       s2 / (total * total) AS hhi,
       mx / total AS top_share
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
         CAST(SUM(cnt) AS DOUBLE) AS total,
         {_sql_dsum('CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)', 's2')},
         CAST(MAX(cnt) AS DOUBLE) AS mx
  FROM (SELECT COUNT(*) AS cnt FROM {tbl} GROUP BY {col})
)"""


_HHI_ORACLE = (
    "\nUNION ALL\n".join(_hhi_branch_sql(*t) for t in _HHI_TARGETS)
    + "\nORDER BY column_name"
)


@register("category_concentration_hhi", oracle=_HHI_ORACLE)
def category_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of five categorical columns —
    the log-free diversity profile (HHI = sum of squared category
    shares; 1/HHI is the effective category count) a curation pipeline
    reads before trusting a stratified split or source-quota mix, where
    entropy would drag libm ln into the oracle. Per column: ONE
    map-side-combining hash aggregate to category counts (cardinality =
    the category count, tiny), then a single-row agg — hhi falls out of
    sum(cnt^2)/total^2 without materializing shares. The five 1-row
    branches union driver-free."""
    frames = []
    for label, tbl, col in _HHI_TARGETS:
        counts = (
            table(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cd = F.col("cnt").cast("double")
        frames.append(
            counts.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_categories"),
                F.sum("cnt").cast("double").alias("total"),
                _dsum(cd * cd, "s2"),
                F.max("cnt").cast("double").alias("mx"),
            ).select(
                F.lit(label).alias("column_name"),
                "n_categories",
                (F.col("s2") / (F.col("total") * F.col("total"))).alias("hhi"),
                (F.col("mx") / F.col("total")).alias("top_share"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("column_name")


# --- order-total reconciliation audit ---------------------------------------

# relative-error ladder (CASE order is the contract — identical on both
# engines; literals are identical source text, so the parsed doubles and
# every boundary compare agree bit-for-bit)
_RECON_LADDER_SQL = """
CASE WHEN rec IS NULL THEN 'e_no_lineitems'
     WHEN rel < 0.001 THEN 'a_lt_0.1pct'
     WHEN rel < 0.01  THEN 'b_lt_1pct'
     WHEN rel < 0.1   THEN 'c_lt_10pct'
     WHEN rel < 1.0   THEN 'd_lt_100pct'
     ELSE 'f_ge_100pct' END
"""

_RECON_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey,
         {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'rec')}
  FROM lineitem GROUP BY l_orderkey
),
r AS (
  SELECT o.o_orderkey, o.o_totalprice, li.rec,
         ABS(o.o_totalprice - li.rec) / o.o_totalprice AS rel
  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT {_RECON_LADDER_SQL} AS bucket,
       COUNT(*) AS n_orders,
       {_sql_dsum('COALESCE(ABS(o_totalprice - rec), o_totalprice)',
                  'total_abs_gap')}
FROM r GROUP BY bucket ORDER BY bucket
"""


@register("order_total_reconciliation", oracle=_RECON_ORACLE)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: every order's stored o_totalprice vs
    the total recomputed from its lineitems, bucketed on a relative-
    error ladder (plus the orphaned 'no lineitems' bucket, whose gap is
    the full stored total) — the financial-close audit that catches
    drifted denormalized aggregates before a report does. The fact
    reduces FIRST (one orderkey shuffle to per-order exact-decimal
    recomputed totals), the orders attach is an equi-join on the same
    key, and the ladder is a map stage into a 6-row aggregate. Every
    division/compare runs on identically-derived doubles."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rec = li.groupBy("l_orderkey").agg(
        _dsum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            "rec",
        )
    )
    r = o.join(rec, o.o_orderkey == rec.l_orderkey, "left").select(
        "o_totalprice",
        "rec",
        (F.abs(F.col("o_totalprice") - F.col("rec")) / F.col("o_totalprice"))
        .alias("rel"),
    )
    bucket = (
        F.when(F.col("rec").isNull(), "e_no_lineitems")
        .when(F.col("rel") < 0.001, "a_lt_0.1pct")
        .when(F.col("rel") < 0.01, "b_lt_1pct")
        .when(F.col("rel") < 0.1, "c_lt_10pct")
        .when(F.col("rel") < 1.0, "d_lt_100pct")
        .otherwise("f_ge_100pct")
    )
    return (
        r.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(
                F.coalesce(
                    F.abs(F.col("o_totalprice") - F.col("rec")),
                    F.col("o_totalprice"),
                ),
                "total_abs_gap",
            ),
        )
        .orderBy("bucket")
    )
