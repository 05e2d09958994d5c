"""Core relational operator suite: scans, projections, filters, aggregations,
joins (incl. composite / anti / as-of), windows, calendar generation.

Each query maps to a SURVEY.md §2 operator row (cited per function) and has
a DuckDB oracle. Columns are aliased identically on both sides; money
aggregates use the exact-decimal-sum helpers so values are bit-reproducible
at any parallelism (see functions/numeric.py).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from bbt_etl_dw_spark.operators.asof import asof_join
from bbt_etl_dw_spark.operators.ffill import forward_fill
from bbt_etl_dw_spark.operators.surrogate import hash_key, md5_key, ordered_key
from bbt_etl_dw_spark.suite import register

# --------------------------------------------------------------------------
# Aggregation (SURVEY §2.4 A1 + scalar math §2.7: TotalAmount-style
# price*(1-discount) arithmetic, reference add_columns.py:87-93)
# --------------------------------------------------------------------------

_PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter → hash agg with partial
    (map-side) aggregation, 8 aggregates in one pass. SURVEY §2.4 A1/A4,
    §2.7 math (reference add_columns.py:87-93 TotalAmount semantics)."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SALES_BY_REGION_ORACLE = f"""
SELECT r.r_name AS region,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("sales_by_region", oracle=_SALES_BY_REGION_ORACLE)
def sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference dashboard's 'Sales per Region' KPI
    (README.md:69-71, SURVEY §2.4 dashboard aggs) over the star chain
    lineitem→orders→customer→nation→region (SURVEY §2.3 J8 fact assembly).
    nation/region are broadcast explicitly; the customer-derived geo
    frame is left to Catalyst/AQE sizing — customer is fact-proportional
    at extreme scale, and an unconditional broadcast() hint bypasses the
    size threshold and OOMs where auto-selection degrades gracefully to
    a shuffle join (review finding; at test scale it still broadcasts).
    The only real shuffle is lineitem⋈orders on orderkey plus the final
    tiny agg."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    geo = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(geo, o.o_custkey == geo.c_custkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("region")
    )


_CUSTOMER_TOTALS_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       COALESCE(t.total_spend, 0.0) AS total_spend,
       COALESCE(t.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN (
    SELECT o_custkey,
           CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
) t ON c.c_custkey = t.o_custkey
ORDER BY c.c_custkey
"""


@register("customer_order_totals", oracle=_CUSTOMER_TOTALS_ORACLE)
def customer_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer purchase totals left-joined back onto the dim with
    zero-fill — SURVEY §2.3 J1 + §2.2 P11 (reference add_columns.py:96-108).
    The agg side shrinks to ≤|customers| rows, so Catalyst broadcasts it."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(
        dsum("o_totalprice", "total_spend"), F.count(F.lit(1)).alias("n_orders")
    )
    return (
        c.join(totals, c.c_custkey == totals.o_custkey, "left")
        .fillna({"total_spend": 0.0, "n_orders": 0})
        .select("c_custkey", "c_name", "c_mktsegment", "total_spend", "n_orders")
        .orderBy("c_custkey")
    )


@register(
    "last_sold_per_part",
    oracle="""
SELECT l_partkey, MAX(l_shipdate) AS last_sold, COUNT(*) AS n_sales
FROM lineitem GROUP BY l_partkey ORDER BY l_partkey
""",
)
def last_sold_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by max over the fact — SURVEY §2.4 A2 (reference
    map_cols.py:103-105 LastSoldDate)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.max("l_shipdate").alias("last_sold"), F.count(F.lit(1)).alias("n_sales"))
        .orderBy("l_partkey")
    )


@register(
    "dup_row_stats",
    oracle="""
SELECT (SELECT COUNT(*) FROM lineitem) AS total_rows,
       (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS distinct_rows,
       (SELECT COUNT(*) FROM lineitem)
         - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS duplicate_rows
""",
)
def dup_row_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row duplicate accounting — SURVEY §2.4 A5 (reference
    audit_report.py:57-58, which scans twice: count() +
    dropDuplicates().count()). One distributed pass instead: group by every
    column with a partial-aggregating count, then fold group counts into
    (total, distinct, dups). At 100TB that is ONE shuffle of (row-hash ->
    count) partial aggregates and no driver-side materialization — the
    VERDICT r02 polish item."""
    li = table(spark, sf_dir, "lineitem")
    groups = li.groupBy(*li.columns).agg(F.count(F.lit(1)).alias("_n"))
    return groups.agg(
        F.sum("_n").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_rows"),
        (F.sum("_n") - F.count(F.lit(1))).alias("duplicate_rows"),
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection — SURVEY §2.4 A6 (reference data_cleaning.py:108)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# Filters / predicates / conditionals (SURVEY §2.2)
# --------------------------------------------------------------------------


@register(
    "regex_filter_parts",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE regexp_matches(p_name, '^(blue|small) (widget|rod)')
  AND NOT regexp_matches(p_brand, '[^A-Za-z#0-9]')
GROUP BY p_brand ORDER BY p_brand
""",
)
def regex_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicates — SURVEY §2.2 P6/P7 (reference audit_report.py:103-127
    phone/date shape checks; data_cleaning.py:166-175 charset validation)."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike(r"^(blue|small) (widget|rod)"))
        .filter(~F.col("p_brand").rlike(r"[^A-Za-z#0-9]"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("p_brand")
    )


@register(
    "client_value_ladder",
    oracle=f"""
SELECT CASE WHEN c_acctbal > 7500 THEN 'High'
            WHEN c_acctbal > 2500 THEN 'Medium'
            ELSE 'Low' END AS client_value,
       COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal', 'sum_acctbal')}
FROM customer GROUP BY 1 ORDER BY client_value
""",
)
def client_value_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins conditional ladder — SURVEY §2.2 P5, the reference's
    ClientValue segmentation (map_cols.py:86-88, thresholds adapted to the
    synthetic acctbal domain)."""
    c = table(spark, sf_dir, "customer")
    ladder = (
        F.when(F.col("c_acctbal") > 7500, "High")
        .when(F.col("c_acctbal") > 2500, "Medium")
        .otherwise("Low")
    )
    return (
        c.groupBy(ladder.alias("client_value"))
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "sum_acctbal"))
        .orderBy("client_value")
    )


@register(
    "props_numeric_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) IS NULL THEN 1 END) AS n_unparseable
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def props_numeric_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract + cast-as-validation — SURVEY §2.2 P7/P8 (reference
    data_cleaning.py:175, audit_report.py:113-138): pull the numeric payload
    out of a semi-structured string column, count parse failures.
    try_cast keeps ANSI-mode (Spark 4 default) from throwing on bad rows."""
    ev = table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r"[0-9]+", 0).try_cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(F.when(k.isNull(), 1)).alias("n_unparseable"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# --------------------------------------------------------------------------


@register(
    "composite_join_yearly_rates",
    oracle=f"""
WITH rates AS (
    SELECT l_returnflag, EXTRACT(year FROM l_shipdate) AS ship_year,
           {sql_davg('l_discount', 'avg_disc_rate')}
    FROM lineitem GROUP BY 1, 2
)
SELECT l.l_returnflag, CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
       {sql_dsum('l.l_extendedprice * (1 - r.avg_disc_rate)', 'adj_revenue')},
       COUNT(*) AS n_rows
FROM lineitem l
JOIN rates r
  ON l.l_returnflag = r.l_returnflag
 AND EXTRACT(year FROM l.l_shipdate) = r.ship_year
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def composite_join_yearly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive-equi (composite-key) join — SURVEY §2.3 J2, the shape of
    the reference's sales⋈taxrate on (country, year) (sales_tax.py:60-67).
    The derived rate dim is tiny => broadcast; no extra shuffle of the fact."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    rates = (
        li.groupBy("l_returnflag", F.year("l_shipdate").alias("ship_year"))
        .agg(davg("l_discount", "avg_disc_rate"))
    )
    fact = li.select(
        "l_returnflag",
        F.year("l_shipdate").alias("ship_year"),
        "l_extendedprice",
    )
    return (
        fact.join(F.broadcast(rates), ["l_returnflag", "ship_year"])
        .groupBy("l_returnflag", "ship_year")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("avg_disc_rate")), "adj_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "ship_year")
    )


@register(
    "inactive_parts_anti_join",
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate > (SELECT MAX(l_shipdate) - INTERVAL 365 DAY FROM lineitem)
)
ORDER BY p.p_partkey
""",
)
def inactive_parts_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native left_anti join replacing the reference's hand-rolled
    left-join + null-key filter 'Active No Sales' rule — SURVEY §2.3 J7
    (anomalies.py:90-115). The cutoff is a scalar reduction (one tiny job),
    then the anti join runs shuffle-side; the distinct recent-part set is
    dim-sized so Catalyst broadcasts it."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    # the cutoff stays IN-PLAN (one-row broadcast cross join, the
    # documented scalar-subquery shape): collecting the max timestamp to
    # the driver and re-litting it round-trips through the driver OS
    # timezone layer, which can shift fold-ambiguous wall times by an
    # hour under DST zones (review finding)
    mx = li.agg(F.max("l_shipdate").alias("__max_ship"))
    recent = (
        li.crossJoin(F.broadcast(mx))
        .filter(
            F.col("l_shipdate")
            > F.col("__max_ship") - F.expr("INTERVAL 365 DAYS")
        )
        .select("l_partkey")
    )
    return (
        p.join(recent, p.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "asof_join_user_rates",
    oracle="""
WITH purchases AS (
    SELECT event_id, user_id, CAST(ts AS DATE) AS d, value
    FROM events WHERE event_type = 'purchase'
), rates AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
             / COUNT(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) AS day_rate
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, p.d, p.value, r.day_rate
FROM purchases p
ASOF LEFT JOIN rates r ON p.user_id = r.user_id AND p.d >= r.d
ORDER BY p.event_id
""",
)
def asof_join_user_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — SURVEY §2.3 J5 / §7 phase 3: each purchase event picks
    up the most recent prior daily click-rate for the same user (the
    reference's exchange-rate-as-of-date semantics, sales_currency.py:76-100,
    as one reusable operator). Single shuffle on user_id; both sides can be
    100TB-scale."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.to_date("ts").alias("d"), "value"
    )
    rates = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(davg("value", "day_rate"))
    )
    joined = asof_join(purchases, rates, on="d", by=["user_id"], value_cols=["day_rate"])
    return joined.select("event_id", "user_id", "d", "value", "day_rate").orderBy("event_id")


# --------------------------------------------------------------------------
# Windows (SURVEY §2.5)
# --------------------------------------------------------------------------


@register(
    "nation_ordered_ids",
    oracle="""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS BIGINT) AS nation_id,
       n_name, n_nationkey
FROM nation ORDER BY nation_id
""",
)
def nation_ordered_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequential ID assignment on a small dimension — SURVEY §2.5
    W1 (reference add_columns.py:170-197 TaxRateID/ExchangeID). Deliberately
    dim-scale-only; large tables use hash surrogate keys instead
    (operators/surrogate.py)."""
    n = table(spark, sf_dir, "nation")
    return ordered_key(n, ["n_name"], "nation_id").select(
        "nation_id", "n_name", "n_nationkey"
    ).orderBy("nation_id")


@register("surrogate_hash_keys", oracle=None)
def surrogate_hash_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic xxhash64 surrogate keys (fixes the reference's
    monotonically_increasing_id instability, SURVEY §4). No SQL oracle —
    xxhash64 is Spark-specific — but results are run-stable; the test suite
    asserts determinism + uniqueness. Rows-only driver check; the oracled
    twin is surrogate_md5_keys (same operator family, auditable hash)."""
    c = table(spark, sf_dir, "customer")
    out = hash_key(c, ["c_custkey"], "customer_sk")
    return out.select("c_custkey", "customer_sk").orderBy("c_custkey")


@register(
    "surrogate_md5_keys",
    oracle="""
SELECT c_custkey,
       CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
           AS customer_sk
FROM customer ORDER BY c_custkey
""",
)
def surrogate_md5_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-engine-AUDITABLE surrogate-key strategy: 60-bit md5-prefix
    keys any downstream system can re-derive (operators/surrogate.md5_key).
    Fully value-checked against DuckDB recomputing the same keys — the
    oracled twin of surrogate_hash_keys (xxhash64 stays the pure-Spark
    hot-path default; this is the choice when key audit matters more than
    ~3x hash cost)."""
    c = table(spark, sf_dir, "customer")
    out = md5_key(c, ["c_custkey"], "customer_sk")
    return out.select("c_custkey", "customer_sk").orderBy("c_custkey")


@register(
    "forward_fill_values",
    oracle="""
SELECT event_id, user_id, ts,
       last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM events ORDER BY event_id
""",
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill — SURVEY §2.5 W2 (reference sales_currency.py:76-82
    last-observation-carried-forward for gap days). 'error' events' values
    are treated as missing and carried forward per user."""
    ev = table(spark, sf_dir, "events").withColumn(
        "value_filled",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    filled = forward_fill(
        ev, ["value_filled"], partition_by=["user_id"], order_by=["ts", "event_id"]
    )
    return filled.select("event_id", "user_id", "ts", "value_filled").orderBy("event_id")


@register(
    "top_customers_per_segment",
    oracle="""
WITH totals AS (
    SELECT o_custkey,
           CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT c.c_mktsegment, c.c_custkey, t.total_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                   ORDER BY t.total_spend DESC, c.c_custkey) AS BIGINT) AS rk
    FROM customer c JOIN totals t ON c.c_custkey = t.o_custkey
)
SELECT c_mktsegment, c_custkey, total_spend, rk
FROM ranked WHERE rk <= 5 ORDER BY c_mktsegment, rk
""",
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned top-k — the scalable form of W1 ranking (SURVEY §2.5):
    rank within segment, keep top 5. Exact-decimal totals make the ordering
    (and hence row_number) deterministic across engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spend"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        c.join(totals, c.c_custkey == totals.o_custkey)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("c_mktsegment", "c_custkey", "total_spend", "rk")
        .orderBy("c_mktsegment", "rk")
    )


# --------------------------------------------------------------------------
# Generators (SURVEY §2.1 S6: calendar dimension)
# --------------------------------------------------------------------------


@register(
    "calendar_dim",
    oracle="""
SELECT CAST(EXTRACT(year FROM d)*10000 + EXTRACT(month FROM d)*100 + EXTRACT(day FROM d) AS BIGINT) AS calendar_key,
       CAST(d AS DATE) AS cal_date,
       CAST(EXTRACT(isodow FROM d) AS INT) AS day_of_week,
       CAST(EXTRACT(month FROM d) AS INT) AS month,
       CAST(EXTRACT(year FROM d) AS INT) AS year,
       CAST(EXTRACT(quarter FROM d) AS INT) AS quarter
FROM generate_series(DATE '2022-01-01', DATE '2025-01-01', INTERVAL 1 DAY) t(d)
ORDER BY cal_date
""",
)
def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generator — SURVEY §2.1 S6 / §1.4 DimCalendar
    (reference map_cols.py:199-224): sequence+explode date range with
    ISO day-of-week/month/year/quarter and a deterministic yyyymmdd key
    (replacing monotonically_increasing_id)."""
    cal = spark.sql(
        "SELECT explode(sequence(to_date('2022-01-01'), to_date('2025-01-01'), "
        "interval 1 day)) AS cal_date"
    )
    return cal.select(
        (F.year("cal_date") * 10000 + F.month("cal_date") * 100 + F.dayofmonth("cal_date"))
        .cast("long")
        .alias("calendar_key"),
        "cal_date",
        (F.weekday("cal_date") + 1).alias("day_of_week"),
        F.month("cal_date").alias("month"),
        F.year("cal_date").alias("year"),
        F.quarter("cal_date").alias("quarter"),
    ).orderBy("cal_date")


# --------------------------------------------------------------------------
# Multi-dimensional aggregation & set ops — absent from the reference
# (SURVEY §2.4 / §2.6 "engine gets them free"); first-class here.
# --------------------------------------------------------------------------


@register(
    "revenue_rollup_region_nation",
    oracle=f"""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
       {sql_dsum('o.o_totalprice', 'revenue')},
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY gid, region, nation
""",
)
def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) revenue with grouping_id — subtotal +
    grand-total levels in ONE pass (Spark expands grouping sets before the
    partial agg, so it is still a single shuffle). The reference computes
    only flat groupings; rollup/cube come free from Catalyst."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "o_totalprice")
    )
    return (
        joined.rollup("region", "nation")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("region", "nation", "gid", "revenue", "n_orders")
        .orderBy("gid", "region", "nation")
    )


@register(
    "order_status_priority_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
""",
)
def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority) order counts — all 4 grouping sets in one
    shuffle (Catalyst's Expand feeds a single partial aggregation)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "nation_customer_supplier_setops",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS side, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'customer_only' AS side, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
UNION ALL
SELECT 'supplier_only' AS side, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
ORDER BY side, nk
""",
)
def nation_customer_supplier_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (intersect / except / union) — absent from the
    reference (SURVEY §2.6), native DataFrame ops here. Nation keys with
    customers vs suppliers, labeled per side."""
    from bbt_etl_dw_spark.operators.ckpt import materialize as _mat

    # each distinct key set feeds two set ops — materialized (|nations|
    # rows), each dim is scanned once, not thrice (r14 plan audit)
    cn = _mat(
        table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    sn = _mat(
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    # subtract == EXCEPT DISTINCT: exceptAll(...).distinct() over the
    # already-distinct sides added two dead full-dedup exchanges
    out = (
        cn.intersect(sn).select(F.lit("both").alias("side"), "nk")
        .unionAll(cn.subtract(sn).select(F.lit("customer_only").alias("side"), "nk"))
        .unionAll(sn.subtract(cn).select(F.lit("supplier_only").alias("side"), "nk"))
    )
    return out.orderBy("side", "nk")


# --------------------------------------------------------------------------
# Skew handling (scale extension: explicit salting; AQE skew-join is the
# runtime complement — session.py turns it on)
# --------------------------------------------------------------------------


@register(
    "events_user_counts_salted",
    oracle="""
SELECT user_id, COUNT(*) AS n_rows
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def events_user_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count per user: partial count on (key, salt) then
    final sum on key — a hot key combines on `salt` reducers before the
    final 1-row-per-(key,salt) shuffle. MUST equal the plain GROUP BY
    (the oracle is the unsalted query)."""
    from bbt_etl_dw_spark.operators.skew import salted_count

    ev = table(spark, sf_dir, "events")
    return salted_count(ev, ["user_id"], salt=8).orderBy("user_id")


@register(
    "events_salted_dim_join",
    oracle=f"""
SELECT e.user_id, n.n_name AS nation,
       COUNT(*) AS n_events,
       {sql_dsum('e.value', 'total_value')}
FROM events e
JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY e.user_id, n.n_name ORDER BY e.user_id
""",
)
def events_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted big⋈small join: events keyed to the nation dim; the dim side
    is replicated salt× so any hot user key spreads over salt reducers.
    Results MUST equal the plain join (the oracle is unsalted)."""
    from bbt_etl_dw_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("long")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    joined = salted_join(ev, n, on=["n_nationkey"], salt=8)
    return (
        joined.groupBy("user_id", "nation")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .orderBy("user_id")
    )


@register(
    "order_stats_by_status",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders,
       median(o_totalprice) AS median_price,
       CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90_price
FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def order_stats_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates + exact percentiles per group — absent from the
    reference (SURVEY §2.4 'distinct-agg absent'). Spark plans multiple
    count-distincts via Expand (one shuffle); percentiles here are EXACT
    to stay oracle-checkable — percentile() (continuous, = DuckDB
    median) and ANSI percentile_disc (rank ceil(q*n), = DuckDB
    quantile_disc). r13: p90 moved off percentile_approx(accuracy=
    INT_MAX), which the sf0.1 sweep proved is still ±1 rank after
    partition-summary merges (the winsorize red) — green here only by
    merge-pattern luck. At 100TB swap in approx_percentile (t-digest
    sketch, single pass)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            )
            .cast("double")
            .alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "events_props_json",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(json_extract_string(props, '$.k')) AS n_with_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JSON parsing of the semi-structured props column: from_json
    with an explicit schema (typed struct access, JVM-side Jackson parse —
    the scalable path; the reference only handled JSON driver-side,
    SURVEY §2.7 'json scalar fns absent')."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json("props", "k long")["k"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(k).alias("n_with_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# r13 contract upgrade (VERDICT r12 stretch #6): the raw HLL++ estimate
# is engine-internal, but its CONTRACT is oracle-checkable at TWO grains
# from ONE rollup pass — per-status and the global 'ALL' row. The exact
# distinct counts are value-pinned by SQL; the rsd=0.02 estimate must sit
# within 5 sigma (10%) of each of them. The rollup grain is the
# mergeability story that matters at 100TB: the same map-side sketch
# state serves both the group estimates and their merged global estimate
# without a second pass over the keys.
_CUST_SKETCH_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_bound
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 'ALL',
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       TRUE
FROM orders
ORDER BY o_orderstatus
"""


@register("customer_cardinality_sketch", oracle=_CUST_SKETCH_ORACLE)
def customer_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-customer sketch, contract-checked at two
    grains: a single rollup pass produces per-status rows plus the merged
    'ALL' row (F.grouping distinguishes the rollup total from a data
    NULL), with the exact count-distinct value-pinned by the oracle and
    the rsd=0.02 estimate bound-checked Spark-side within 5 sigma (10%)
    at EVERY grain. A broken sketch — or a merge that loses registers
    between the group and global grains — flips within_bound and reds the
    row. The single-grain twin cardinality_sketch_check keeps the
    original shape. Scale: the sketch is mergeable map-side state; the
    rollup adds the global grain for free, while exact count-distinct
    needs the full key shuffle the sketch exists to avoid."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
            F.grouping("o_orderstatus").alias("_is_total"),
        )
        .select(
            F.when(F.col("_is_total") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "exact_customers",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= 0.10 * F.col("exact_customers")
            ).alias("within_bound"),
        )
        .orderBy("o_orderstatus")
    )


# The sketch VALUE is engine-specific, but its CONTRACT is not: the exact
# per-group cardinalities are SQL, and the HLL++ estimate must land within
# a 5-sigma relative-error band (rsd=0.02 -> 10%) of them. Emitting the
# exact counts plus a bound-satisfied flag makes the sketch's guarantee a
# hash-checked driver row: a broken sketch (or a bound violation) flips
# within_bound to FALSE and reds the row, while exact counts are verified
# value-for-value.
_SKETCH_CHECK_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_bound
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@register("cardinality_sketch_check", oracle=_SKETCH_CHECK_ORACLE)
def cardinality_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable contract of the HLL++ sketch: per order status,
    the exact distinct-customer count (value-checked vs DuckDB) and
    whether the rsd=0.02 estimate stayed within 5 sigma (10%) of it."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= 0.10 * F.col("exact_customers")
            ).alias("within_bound"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "global_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    each partition keeps its local top 20 and only k rows per partition
    reach the driver-side merge; the full sort never happens. The scalable
    form of 'give me the biggest N' at any table size."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_sum_sql(t: str) -> str:
    return (
        "CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18)))"
        f" FILTER (WHERE event_type = '{t}') AS VARCHAR) AS DOUBLE) AS {t}"
    )


_PIVOT_ORACLE = f"""
SELECT user_id, {', '.join(_pivot_sum_sql(t) for t in _EVENT_TYPES)}
FROM events GROUP BY user_id ORDER BY user_id
"""


@register("events_type_pivot", oracle=_PIVOT_ORACLE)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user exact value sums spread over one
    column per event_type. The pivot values are EXPLICIT — without them
    Spark first runs a distinct job to discover them, and an unbounded
    value set would also be a schema explosion at scale. Plans as one
    partial+final hash aggregate, same as any groupBy."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(dsum("value", "total"))
        .orderBy("user_id")
    )


_UNPIVOT_ORACLE = f"""
SELECT user_id, event_type, {sql_dsum('value', 'total_value')}
FROM events GROUP BY user_id, event_type
-- mirror the unpivot's NULL-cell drop exactly: a pivot cell is non-null
-- iff the group has at least one castable non-null value — without this
-- an all-NULL-valued group appears here but not in the melt (review
-- finding; latent while events.value has no NULLs)
HAVING COUNT(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) > 0
ORDER BY user_id, event_type
"""


@register("events_type_unpivot", oracle=_UNPIVOT_ORACLE)
def events_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) round trip: melting the pivoted table back
    recovers exactly the plain groupBy(user, type) aggregate — proving
    pivot and unpivot are lossless inverses (absent types yield NULL cells,
    dropped on the way back). unpivot is a narrow generate expression — no
    shuffle beyond the upstream pivot's own aggregate."""
    wide = events_type_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ["user_id"], list(_EVENT_TYPES), "event_type", "total_value"
        )
        .filter(F.col("total_value").isNotNull())
        .orderBy("user_id", "event_type")
    )


# Quantile-sketch twin of cardinality_sketch_check: the percentile_approx
# VALUE is engine-specific, but its rank-error CONTRACT (<= n/accuracy by
# construction of the GK/KLL sketch; we check a 10x-slack 1% band) is
# checkable exactly — compute the true rank of each estimated quantile
# and flag the band. Exact n per group is value-checked; a broken sketch
# flips within_bound and reds the row.
_QUANTILE_CHECK_ORACLE = """
SELECT o_orderstatus,
       CAST(p AS DOUBLE) AS pct,
       COUNT(*) AS n_orders,
       TRUE AS within_bound
FROM orders CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75, 0.95]) AS p) pcts
GROUP BY o_orderstatus, p ORDER BY o_orderstatus, pct
"""


@register("order_quantile_sketch_check", oracle=_QUANTILE_CHECK_ORACLE)
def order_quantile_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable contract of the quantile sketch: per order
    status, percentile_approx(accuracy=1000) estimates for 4 quantiles
    must land within a 1% true-rank band (10x the sketch's n/1000
    guarantee). The sketch is single-pass mergeable map-side state — the
    100TB path where exact percentiles need a per-group sort; the check
    joins the 12 estimated values back (broadcast) for one conditional
    re-aggregation."""
    pcts = [0.25, 0.5, 0.75, 0.95]
    o = table(spark, sf_dir, "orders")
    qs = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", pcts, 1000).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    pv = qs.select(
        "o_orderstatus",
        "n",
        F.posexplode("ap").alias("i", "v"),
    ).withColumn(
        "p", F.element_at(F.array(*[F.lit(float(x)) for x in pcts]), F.col("i") + 1)
    )
    ranks = (
        o.join(F.broadcast(pv), "o_orderstatus")
        .groupBy("o_orderstatus", "p", "n", "v")
        .agg(
            F.sum(F.when(F.col("o_totalprice") <= F.col("v"), 1).otherwise(0)).alias(
                "r"
            )
        )
    )
    return ranks.select(
        "o_orderstatus",
        F.col("p").alias("pct"),
        F.col("n").alias("n_orders"),
        (
            F.abs(F.col("r") - F.col("p") * F.col("n"))
            <= F.col("n") / 100.0 + 1.0
        ).alias("within_bound"),
    ).orderBy("o_orderstatus", "pct")


# --- classic TPC-H-shape analytics (Q3 / Q18 adaptations) -----------------
# The two canonical warehouse join+agg shapes the reference never had:
# a selective multi-way join with a revenue top-k (Q3) and a
# having-filtered semi-join back into the fact (Q18). Both use the
# exact-decimal sum discipline so double revenue totals hash-match.

_SHIP_PRIORITY_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


@register("shipping_priority_topk", oracle=_SHIP_PRIORITY_ORACLE)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: un-shipped-revenue top-10 for one market segment.
    The segment filter prunes customers BEFORE the join (broadcast), both
    date filters push to the scans, revenue is an exact-decimal sum (the
    top-k order is therefore deterministic at any parallelism), and the
    LIMIT plans as TakeOrdered — no global sort."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cut = F.lit("1998-06-01").cast("timestamp")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(
            o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_LARGE_VOLUME_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
"""


@register("large_volume_customers", oracle=_LARGE_VOLUME_ORACLE)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders whose total line quantity
    exceeds 300. The HAVING aggregate is computed once and drives a
    semi-join back into orders (the survivors are few — the join flips to
    broadcast under AQE); quantities are integer-valued doubles, so the
    native SUM is exact below 2^53 and the threshold is deterministic
    without the decimal discipline."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


_SMALL_QTY_ORACLE = """
WITH a AS (
  SELECT l_partkey,
         CAST(CAST(SUM(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
           / COUNT(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,18))) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(TRY_CAST(CAST(l.l_extendedprice AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
         / 7.0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l JOIN a USING (l_partkey)
WHERE l.l_quantity < 0.2 * a.aq
"""


@register("small_quantity_revenue", oracle=_SMALL_QTY_ORACLE)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems below
    20% of their part's average quantity. The per-part average is an
    EXACT decimal mean (davg) — with a native double AVG the partial-agg
    order could flip boundary rows in and out of the < 0.2*avg predicate
    and change the answer per run; with davg the threshold is
    deterministic on every engine and at any parallelism. One shuffle for
    the per-part averages, one partkey join (AQE picks broadcast when the
    part dim fits), one global exact-decimal sum."""
    li = table(spark, sf_dir, "lineitem")
    a = li.groupBy("l_partkey").agg(davg("l_quantity", "aq"))
    return (
        li.join(a, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            (dsum("l_extendedprice", "_s") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) ---------------

_BAG_SETOPS_ORACLE = """
WITH a AS (
  SELECT o_orderpriority AS p FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1995
),
b AS (
  SELECT o_orderpriority AS p FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1996
),
ops AS (
  SELECT 'a_except_all' AS op, p FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
  UNION ALL
  SELECT 'b_intersect_all', p FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
)
SELECT op, p AS o_orderpriority, COUNT(*) AS n
FROM ops GROUP BY op, p
ORDER BY op, o_orderpriority
"""


@register("priority_bag_setops", oracle=_BAG_SETOPS_ORACLE)
def priority_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — EXCEPT ALL / INTERSECT ALL — between
    the 1995 and 1996 order-priority bags: per priority the surplus
    (count_a − count_b, clamped at 0) and the overlap (min of counts),
    which the DISTINCT variants in nation_customer_supplier_setops
    cannot express. Spark's exceptAll/intersectAll plan as aggregate +
    generate (no join of the two facts beyond the counting), and the
    closing rollup makes the bag cardinalities value-checkable."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    )
    # each bag feeds BOTH set ops: materialized (single narrow column),
    # orders is scanned once per bag instead of once per (bag, op) —
    # 4 fact scans -> 2 (r14 plan audit). The set ops themselves stay
    # native exceptAll/intersectAll — exercising them is this query's
    # coverage purpose.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    a = materialize(o.filter(F.col("yr") == 1995).select("o_orderpriority"))
    b = materialize(o.filter(F.col("yr") == 1996).select("o_orderpriority"))
    ops = a.exceptAll(b).select(
        F.lit("a_except_all").alias("op"), "o_orderpriority"
    ).unionByName(
        a.intersectAll(b).select(
            F.lit("b_intersect_all").alias("op"), "o_orderpriority"
        )
    )
    return (
        ops.groupBy("op", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("op", "o_orderpriority")
    )
