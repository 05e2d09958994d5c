"""Star-schema and dashboard-KPI suite (SURVEY §1.4, §2.3 J8, §2.4
dashboard aggregations, §7 phase 4-5)."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import dsum, sql_dsum
from bbt_etl_dw_spark.operators.enrich import client_value, product_status
from bbt_etl_dw_spark.operators.scd2 import scd2_init, scd2_merge
from bbt_etl_dw_spark.plans.star import fact_sales
from bbt_etl_dw_spark.suite import register

# The fact's surrogate keys are xxhash64(natural key) — Spark-specific, so
# the oracle verifies the join topology through the dim-sourced natural ids
# (NULL exactly when the dim row is missing; dim_c reproduces dim_customer's
# inner nation/region enrichment joins). key == xxhash64(id) is asserted in
# tests/test_plans.py.
_FACT_ORACLE = """
WITH dim_c AS (
    SELECT c_custkey FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
       c.c_custkey AS customer_id, p.p_partkey AS part_id,
       s.s_suppkey AS supplier_id,
       CAST(EXTRACT(year FROM l.l_shipdate)*10000 + EXTRACT(month FROM l.l_shipdate)*100
            + EXTRACT(day FROM l.l_shipdate) AS BIGINT) AS ship_calendar_key,
       CAST(EXTRACT(year FROM o.o_orderdate)*10000 + EXTRACT(month FROM o.o_orderdate)*100
            + EXTRACT(day FROM o.o_orderdate) AS BIGINT) AS order_calendar_key,
       l.l_quantity AS quantity, l.l_extendedprice AS extended_price,
       l.l_discount AS discount,
       l.l_extendedprice * (1 - l.l_discount) AS net_amount
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN dim_c c ON o.o_custkey = c.c_custkey
LEFT JOIN (SELECT s_suppkey FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey) s
       ON l.l_suppkey = s.s_suppkey
LEFT JOIN part p ON l.l_partkey = p.p_partkey
ORDER BY order_key, line_number
"""


@register("star_fact_assembly", oracle=_FACT_ORACLE, bench=True)
def star_fact_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fact assembly with deterministic surrogate keys — SURVEY §2.3 J8
    (reference map_cols.py:228-282), with left joins + explicit null keys
    instead of silent inner-join row loss. Dims broadcast and keyed by
    xxhash64 of the natural key (no single-partition window anywhere in the
    plan); calendar keys resolve as pure expressions (no join, no shuffle).
    The oracle compares the xxhash64-free projection (see _FACT_ORACLE)."""
    return (
        fact_sales(spark, sf_dir)
        .drop("customer_key", "part_key", "supplier_key")
        .orderBy("order_key", "line_number")
    )


@register("star_fact_assembly_unsorted", oracle=_FACT_ORACLE, bench=True)
def star_fact_assembly_unsorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """star_fact_assembly WITHOUT the output determinism sort — the shape a
    pipeline actually writes (parquet cares about partition layout, not
    global row order). Benchmarked separately because the global sort is a
    driver-hash artifact worth ~1s at sf0.1 that no production plan pays;
    the driver compare itself sorts rows, so the same oracle applies."""
    return fact_sales(spark, sf_dir).drop("customer_key", "part_key", "supplier_key")


_CLIENT_VALUE_KPI_ORACLE = f"""
WITH seg AS (
    SELECT c_custkey,
           CASE WHEN c_acctbal > 7500 THEN 'High'
                WHEN c_acctbal > 2500 THEN 'Medium'
                ELSE 'Low' END AS client_value
    FROM customer
)
SELECT s.client_value,
       {sql_dsum('o.o_totalprice', 'total_amount')},
       COUNT(*) AS n_orders
FROM orders o JOIN seg s ON o.o_custkey = s.c_custkey
GROUP BY s.client_value ORDER BY s.client_value
"""


@register("kpi_sales_by_client_value", oracle=_CLIENT_VALUE_KPI_ORACLE)
def kpi_sales_by_client_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard KPI 'TotalAmount by ClientValue' (reference
    README.md:69-71; BASELINE.md High 1.079M/Medium 0.211M/Low 0.002M
    shape) — segment ladder broadcast onto the fact, one shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # no broadcast() hint: the frame is customer-proportional, so sizing
    # is left to Catalyst/AQE (an unconditional hint bypasses the
    # threshold and OOMs at extreme scale where auto-selection degrades
    # gracefully; review finding)
    seg = c.select(
        "c_custkey",
        client_value(F.col("c_acctbal"), 7500.0, 2500.0).alias("client_value"),
    )
    return (
        o.join(seg, o.o_custkey == seg.c_custkey)
        .groupBy("client_value")
        .agg(dsum("o_totalprice", "total_amount"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("client_value")
    )


_STORE_GROWTH_ORACLE = f"""
SELECT s.s_name AS store_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       COUNT(*) AS n_sales
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("kpi_store_growth", oracle=_STORE_GROWTH_ORACLE)
def kpi_store_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard KPI 'Store growth trends' (reference README.md:91,
    suppliers-as-stores map_cols.py:144-182): revenue per store per year."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("store_name"), F.year("l_shipdate").alias("year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_sales"),
        )
        .orderBy("store_name", "year")
    )


_ATTRACTIVENESS_ORACLE = f"""
SELECT s.s_name AS store_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       COUNT(*) AS n_transactions,
       CAST(CAST(SUM(TRY_CAST(CAST((l.l_extendedprice * (1 - l.l_discount)) AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS attractiveness_index
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name ORDER BY s.s_name
"""


@register("kpi_store_attractiveness", oracle=_ATTRACTIVENESS_ORACLE)
def kpi_store_attractiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AttractivenessIndex = revenue / transactions per store — the
    reference computes this in Power BI (agg commented at map_cols.py:
    167-170; BASELINE.md top-stores row)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("store_name"))
        .agg(rev, F.count(F.lit(1)).alias("n_transactions"))
        .withColumn("attractiveness_index", F.col("revenue") / F.col("n_transactions"))
        .orderBy("store_name")
    )


_PRODUCT_STATUS_ORACLE = """
WITH last_sold AS (
    SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_sold
    FROM lineitem GROUP BY l_partkey
), statused AS (
    SELECT CASE
        WHEN ls.last_sold IS NULL OR date_diff('day', ls.last_sold, DATE '2001-11-04') > 365 THEN 'Obsolete'
        WHEN date_diff('day', ls.last_sold, DATE '2001-11-04') > 180 THEN 'End of Lifecycle'
        ELSE 'Active' END AS product_status
    FROM part p LEFT JOIN last_sold ls ON p.p_partkey = ls.l_partkey
)
SELECT product_status, COUNT(*) AS n_products
FROM statused GROUP BY product_status ORDER BY product_status
"""


@register("kpi_product_status", oracle=_PRODUCT_STATUS_ORACLE)
def kpi_product_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard KPI 'Products per Status' — the Active / End of Lifecycle /
    Obsolete ladder from days-since-last-sale (reference map_cols.py:116-123,
    add_columns.py:134-139; BASELINE.md Active 59/Obsolete 10/EoL 8 shape)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    last_sold = li.groupBy("l_partkey").agg(F.max(F.to_date("l_shipdate")).alias("last_sold"))
    return (
        p.join(last_sold, p.p_partkey == last_sold.l_partkey, "left")
        .withColumn(
            "product_status",
            product_status(F.col("last_sold"), F.to_date(F.lit("2001-11-04"))),
        )
        .groupBy("product_status")
        .agg(F.count(F.lit(1)).alias("n_products"))
        .orderBy("product_status")
    )


# Value-level SCD2 verification (VERDICT r02 #5): the oracle reconstructs
# the ENTIRE merged table in plain SQL — unchanged rows stay current with
# the day-1 window, changed rows (custkey%7==0, segment not already PROMO)
# produce an expired version carrying the ORIGINAL segment payload with
# effective_end_date = the merge asof, plus a new current PROMO version
# starting at the asof. Every attribute, window date, and flag is
# hash-compared; no counts.
_SCD2_ROWS_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
       TRUE AS is_current,
       DATE '2024-01-01' AS effective_start_date,
       CAST(NULL AS DATE) AS effective_end_date
FROM customer
WHERE NOT (c_custkey % 7 = 0 AND c_mktsegment <> 'PROMO')
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
       FALSE, DATE '2024-01-01', DATE '2024-06-01'
FROM customer
WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'PROMO'
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'PROMO',
       TRUE, DATE '2024-06-01', CAST(NULL AS DATE)
FROM customer
WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'PROMO'
ORDER BY c_custkey, effective_start_date
"""


def _scd2_promo_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared day-2 PROMO-segment merge scenario (see scd2_merge_counts)."""
    c = table(spark, sf_dir, "customer")
    current = scd2_init(c, datetime.date(2024, 1, 1))
    incoming = c.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("PROMO")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    return scd2_merge(
        current,
        incoming,
        natural_key=["c_custkey"],
        tracked_cols=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        asof=datetime.date(2024, 6, 1),
    )


@register("scd2_merge_rows", oracle=_SCD2_ROWS_ORACLE, bench=True)
def scd2_merge_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full merged SCD2 table, value-level: natural key, tracked attrs,
    validity window, currency flag for every row — proving expired rows
    keep their pre-change payload and new versions open at the asof
    (reference scaffolding at map_cols.py:89-91; this is the engine's
    actual change capture, SURVEY §7 phase 5)."""
    return _scd2_promo_merge(spark, sf_dir).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        "is_current",
        "effective_start_date",
        "effective_end_date",
    ).orderBy("c_custkey", "effective_start_date")


_SCD2_ORACLE = """
SELECT TRUE AS is_current, (SELECT COUNT(*) FROM customer) AS n_rows
UNION ALL
SELECT FALSE AS is_current,
       (SELECT COUNT(*) FROM customer
        WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'PROMO') AS n_rows
ORDER BY is_current
"""


@register("scd2_merge_counts", oracle=_SCD2_ORACLE)
def scd2_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real SCD2 change capture — SURVEY §7 phase 5 (the reference only
    scaffolds IsCurrent/Effective* constants, map_cols.py:89-91). Simulates
    day 2: customers with custkey%7==0 switch segment to PROMO; the merge
    must expire exactly those (still-current count stays |customers|:
    unchanged + new versions)."""
    return (
        _scd2_promo_merge(spark, sf_dir)
        .groupBy("is_current")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("is_current")
    )


# --------------------------------------------------------------------------
# SCD2 maintained from the CDC change feed (operators/scd2.scd2_apply_changes
# + operators/diff.snapshot_diff) — the O(churn) history-maintenance path
# (VERDICT r04 #8). Day-2 evolution exercises every op class AND the
# tracked/untracked distinction:
#   %11 keys  -> deleted            (expire, no successor)
#   %7 keys   -> segment := PROMO   (tracked update: expire + new version)
#   %5 keys   -> name := name||'X'  (UNtracked update: must NOT version —
#                the live row, old name included, stays current)
#   %13 keys  -> cloned as inserts under key+1000000, segment 'FRESH'
# --------------------------------------------------------------------------

_SCD2_FEED_ORACLE = """
WITH kept AS (
    SELECT * FROM customer WHERE c_custkey % 11 <> 0
), new_vals AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 5 = 0 THEN c_name || 'X' ELSE c_name END AS c_name,
           c_nationkey, c_acctbal,
           CASE WHEN c_custkey % 7 = 0 THEN 'PROMO' ELSE c_mktsegment END AS c_mktsegment
    FROM kept
), tracked_upd AS (
    SELECT k.c_custkey
    FROM kept k JOIN new_vals n USING (c_custkey)
    WHERE k.c_mktsegment <> n.c_mktsegment OR k.c_acctbal <> n.c_acctbal
)
SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
       TRUE AS is_current,
       DATE '2024-01-01' AS effective_start_date,
       CAST(NULL AS DATE) AS effective_end_date
FROM customer c
WHERE c.c_custkey % 11 <> 0
  AND c.c_custkey NOT IN (SELECT c_custkey FROM tracked_upd)
UNION ALL
SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
       FALSE, DATE '2024-01-01', DATE '2024-06-01'
FROM customer c
WHERE c.c_custkey % 11 = 0
   OR c.c_custkey IN (SELECT c_custkey FROM tracked_upd)
UNION ALL
SELECT n.c_custkey, n.c_name, n.c_nationkey, n.c_acctbal, n.c_mktsegment,
       TRUE, DATE '2024-06-01', CAST(NULL AS DATE)
FROM new_vals n
WHERE n.c_custkey IN (SELECT c_custkey FROM tracked_upd)
UNION ALL
SELECT c.c_custkey + 1000000, c.c_name, c.c_nationkey, c.c_acctbal, 'FRESH',
       TRUE, DATE '2024-06-01', CAST(NULL AS DATE)
FROM customer c
WHERE c.c_custkey % 13 = 0
ORDER BY c_custkey, effective_start_date
"""


@register("scd2_from_change_feed", oracle=_SCD2_FEED_ORACLE)
def scd2_from_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history maintained directly from a snapshot_diff change feed
    (operators/scd2.py scd2_apply_changes): only churned keys close/open
    versions, so a 100 TB dimension with 0.1% daily churn joins against a
    broadcast-sized key set instead of re-hashing every row (the
    scd2_merge full-snapshot path is the fallback when no feed exists).
    Value-level check over all four op classes, including the
    tracked/untracked rule: an update touching only an UNtracked column
    (here c_name) must NOT spawn a version — the live row keeps its old
    payload and stays current."""
    from bbt_etl_dw_spark.operators.diff import snapshot_diff
    from bbt_etl_dw_spark.operators.scd2 import scd2_apply_changes

    c = table(spark, sf_dir, "customer")
    history = scd2_init(c, datetime.date(2024, 1, 1))

    kept = c.filter(F.col("c_custkey") % 11 != 0)
    mutated = kept.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 5 == 0, F.concat(F.col("c_name"), F.lit("X"))
        )
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("PROMO"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    inserts = c.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        F.lit("FRESH").alias("c_mktsegment"),
    )
    incoming = mutated.unionByName(inserts)
    feed = snapshot_diff(
        c,
        incoming,
        keys=["c_custkey"],
        compare_cols=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    return scd2_apply_changes(
        history,
        feed,
        natural_key=["c_custkey"],
        tracked_cols=["c_mktsegment", "c_acctbal"],
        asof=datetime.date(2024, 6, 1),
    ).orderBy("c_custkey", "effective_start_date")


# --- point-in-time (AS OF) reads over the SCD2 history ----------------------

_PIT_DATES = ("2024-03-15", "2024-07-01")  # between versions / after churn

_PIT_ORACLE = f"""
WITH hist AS ({_SCD2_FEED_ORACLE}),
shots AS (
  {" UNION ALL ".join(
      f"SELECT DATE '{d}' AS as_of, * FROM hist "
      f"WHERE effective_start_date <= DATE '{d}' "
      f"AND (effective_end_date IS NULL OR effective_end_date > DATE '{d}')"
      for d in _PIT_DATES
  )}
)
SELECT as_of,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_mktsegment = 'PROMO' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_promo,
       CAST(SUM(CASE WHEN c_mktsegment = 'FRESH' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fresh,
       {sql_dsum('c_acctbal', 'total_acctbal')}
FROM shots GROUP BY as_of ORDER BY as_of
"""


@register("scd2_point_in_time_read", oracle=_PIT_ORACLE)
def scd2_point_in_time_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (time-travel) reads over the SCD2 history — the CONSUMER
    side of the SCD2 machinery: reconstruct the dimension exactly as it
    stood on two dates (one between the initial load and the churn
    batch, one after) with the canonical validity predicate
    ``start <= d AND (end IS NULL OR end > d)``. Each snapshot is a
    narrow filter over the history (at scale: a partition-prunable
    predicate when the history is range-partitioned on start date,
    never a join); the date arithmetic is DATE-only, immune to session
    timezones. The rollup proves version selection value-level: PROMO
    rows exist only after churn, FRESH inserts only in the second
    snapshot, and the account-balance mass shifts accordingly."""
    hist = scd2_from_change_feed(spark, sf_dir)
    shots = None
    for d in _PIT_DATES:
        dd = F.to_date(F.lit(d))
        snap = hist.filter(
            (F.col("effective_start_date") <= dd)
            & (F.col("effective_end_date").isNull()
               | (F.col("effective_end_date") > dd))
        ).select(dd.alias("as_of"), "c_mktsegment", "c_acctbal")
        shots = snap if shots is None else shots.unionByName(snap)
    return (
        shots.groupBy("as_of")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("c_mktsegment") == "PROMO", 1).otherwise(0))
            .cast("bigint").alias("n_promo"),
            F.sum(F.when(F.col("c_mktsegment") == "FRESH", 1).otherwise(0))
            .cast("bigint").alias("n_fresh"),
            dsum(F.col("c_acctbal"), "total_acctbal"),
        )
        .orderBy("as_of")
    )
