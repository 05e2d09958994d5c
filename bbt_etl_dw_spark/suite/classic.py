"""Classic warehouse shapes: correlated-subquery families (EXISTS /
NOT EXISTS / scalar subqueries), value-share HAVING against a global total,
GROUPING SETS, rank-family windows, time-range rolling windows, CDC
snapshot diffing, and time-series resample / year-over-year growth.

The reference's query surface (SURVEY §2.3/§2.4) stops at equi-joins and
plain group-bys; these are the standard warehouse shapes a user migrating a
dashboard would write next. Each is expressed the way it should run at
100 TB: correlated EXISTS as a semi/anti hash join (never a per-row probe),
scalar subqueries as broadcast one-row joins, rolling windows as partitioned
range frames over pre-aggregated daily rows (never a window over the raw
fact table). All money math uses the exact-decimal discipline from
functions/numeric.py so every query carries a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.ckpt import materialize
from bbt_etl_dw_spark.functions.numeric import (
    DEC,
    SQL_DEC,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from bbt_etl_dw_spark.suite import register

def _attach_scalar(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach a ONE-ROW aggregate to every row of ``df`` as a broadcast
    cross join — the canonical scalar-subquery plan. This intentionally
    plans as BroadcastNestedLoopJoin with a 1-row build side: linear work
    (one in-memory comparison per probe row, exactly what the downstream
    filter costs anyway), not a quadratic join. Catalyst constant-folds
    any literal-equi-key disguise back to BNLJ, so the plan lint instead
    allow-lists the queries using this helper (SCALAR_SUBQUERY_ALLOWED in
    tests/test_plan_lint.py)."""
    return df.crossJoin(F.broadcast(scalar))


# --------------------------------------------------------------------------
# EXISTS → left-semi join (TPC-H Q4 shape)
# --------------------------------------------------------------------------

_PRIORITY_EXISTS_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("order_priority_exists_counts", oracle=_PRIORITY_EXISTS_ORACLE)
def order_priority_exists_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders (one quarter) that have at least one line shipped
    >60 days after ordering, counted per priority. The correlated EXISTS
    is a LEFT SEMI hash join on orderkey with the date comparison as a
    residual condition — one shuffle, no per-row subquery, and the quarter
    filter pushes down to the orders scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# NOT EXISTS + scalar subquery → anti join + broadcast one-row agg (Q22 shape)
# --------------------------------------------------------------------------

_IDLE_RICH_ORACLE = f"""
WITH thr AS (
    SELECT {sql_davg('c_acctbal', 'v')}
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_dsum('c.c_acctbal', 'total_bal')}
FROM customer c, thr
WHERE c.c_acctbal > thr.v
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("idle_rich_customers", oracle=_IDLE_RICH_ORACLE)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no order since
    2000-01-01, summarized per segment. The scalar AVG subquery becomes a
    broadcast one-row cross join (computed with the exact-decimal mean so
    the > threshold comparison is bit-identical to the oracle), and NOT
    EXISTS becomes a LEFT ANTI join against the date-filtered orders —
    the filter pushes into the orders scan, so the anti join's build side
    is only the recent slice."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "v"))
    return (
        _attach_scalar(c, thr)
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Value share vs global total (Q11 shape)
# --------------------------------------------------------------------------

_NATION_SHARE_ORACLE = f"""
WITH nr AS (
    SELECT n.n_name AS nation,
           SUM(TRY_CAST(CAST((l.l_extendedprice * (1 - l.l_discount)) AS VARCHAR) AS {SQL_DEC})) AS rev_dec
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
), tot AS (SELECT SUM(rev_dec) AS tot_dec FROM nr)
SELECT nation,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(tot_dec AS VARCHAR) AS DOUBLE) AS share
FROM nr, tot
WHERE CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
        / CAST(CAST(tot_dec AS VARCHAR) AS DOUBLE) > 0.04
ORDER BY nation
"""


@register("nation_revenue_share", oracle=_NATION_SHARE_ORACLE)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: nations whose revenue share exceeds 4% of the global
    total. The global total is the exact-decimal sum of the per-nation
    exact-decimal sums (order-independent at any parallelism, and only
    |nations| rows ever reach the second agg), broadcast back as a one-row
    cross join; the share is one IEEE division of two canonical doubles,
    so the HAVING cut is bit-stable cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    geo = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", "n_name"
        )
    )
    nr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(geo, o.o_custkey == geo.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).try_cast(DEC)
            ).alias("rev_dec")
        )
    )
    # the nation-grain rollup feeds the global total AND the share
    # projection: materialized (|nations| rows), the lineitem⋈orders
    # pipeline runs once instead of twice (r14 plan audit)
    nr = materialize(nr)
    tot = nr.agg(F.sum("rev_dec").alias("tot_dec"))
    share = F.col("rev_dec").cast("string").cast("double") / F.col("tot_dec").cast(
        "string"
    ).cast("double")
    return (
        _attach_scalar(nr, tot)
        .select(
            "nation",
            F.col("rev_dec").cast("string").cast("double").alias("revenue"),
            share.alias("share"),
        )
        .filter(F.col("share") > 0.04)
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Market-share ratio per year (Q8 shape)
# --------------------------------------------------------------------------

_MARKET_SHARE_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
       {sql_dsum("CASE WHEN n.n_name = 'NATION_7' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", 'nation_revenue')},
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'total_revenue')},
       CAST(CAST(SUM(TRY_CAST(CAST((CASE WHEN n.n_name = 'NATION_7' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(TRY_CAST(CAST((l.l_extendedprice * (1 - l.l_discount)) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) AS market_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY order_year
ORDER BY order_year
"""


@register("supplier_market_share_by_year", oracle=_MARKET_SHARE_ORACLE)
def supplier_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_7 suppliers' share of total revenue per order year.
    Supplier→nation resolves as a broadcast pre-join (dim-side), the
    conditional numerator folds into the same single hash agg as the
    denominator (no second pass over the fact), and the share is one IEEE
    division of two exact-decimal sums."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("n_name") == "NATION_7", rev).otherwise(F.lit(0.0))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.sum(nat_rev.try_cast(DEC)).alias("_num_dec"),
            F.sum(rev.try_cast(DEC)).alias("_den_dec"),
        )
    )
    num = F.col("_num_dec").cast("string").cast("double")
    den = F.col("_den_dec").cast("string").cast("double")
    return agg.select(
        "order_year",
        num.alias("nation_revenue"),
        den.alias("total_revenue"),
        (num / den).alias("market_share"),
    ).orderBy("order_year")


# --------------------------------------------------------------------------
# Correlated EXISTS/NOT-EXISTS pair rewritten as aggregation (Q21 shape)
# --------------------------------------------------------------------------

_SOLE_RETURN_ORACLE = """
WITH per_supp AS (
    SELECT l_orderkey, l_suppkey,
           MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
    FROM lineitem
    GROUP BY l_orderkey, l_suppkey
), per_order AS (
    SELECT l_orderkey,
           COUNT(*) AS n_supp,
           SUM(has_r) AS n_ret_supp,
           MAX(CASE WHEN has_r = 1 THEN l_suppkey END) AS sole_supp
    FROM per_supp
    GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_sole_return_orders
FROM per_order p
JOIN supplier s ON p.sole_supp = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_ret_supp = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY n_sole_return_orders DESC, s.s_suppkey
"""


@register("sole_return_suppliers", oracle=_SOLE_RETURN_ORACLE, bench=True)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: in multi-supplier orders, the supplier who alone shipped
    returned ('R') lines — ranked by how often they were the sole returner.
    TPC-H writes this as EXISTS + NOT EXISTS self-joins on the fact; at
    scale that's two extra fact shuffles, so the engine rewrites it as a
    two-level aggregation: per (order, supplier) flags first (map-side
    combinable), then per-order counts — the fact shuffles ONCE, and when
    exactly one supplier is flagged, MAX(flagged suppkey) IS that supplier,
    so no join back to the fact is needed."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_ret_supp"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("sole_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(s), F.col("sole_supp") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_sole_return_orders"))
        .orderBy(F.desc("n_sole_return_orders"), "s_suppkey")
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping flags (beyond rollup/cube)
# --------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@register("revenue_grouping_sets", oracle=_GROUPING_SETS_ORACLE)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (flag, status), (status), grand total —
    with GROUPING() disambiguation flags, the piece of the multi-level-agg
    family rollup/cube can't express (it skips the (l_returnflag) level).
    One Expand + one hash agg; rows replicate only per matching set."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum(rev, "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Rolling time-range window over pre-aggregated days
# --------------------------------------------------------------------------

_ROLLING_ORACLE = f"""
WITH daily AS (
    SELECT o_orderpriority,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day_idx,
           SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC})) AS daily_dec
    FROM orders
    GROUP BY o_orderpriority, day_idx
)
SELECT o_orderpriority, day_idx,
       CAST(CAST(daily_dec AS VARCHAR) AS DOUBLE) AS daily_revenue,
       CAST(CAST(SUM(daily_dec) OVER (
            PARTITION BY o_orderpriority ORDER BY day_idx
            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS rolling_7d_revenue
FROM daily
ORDER BY o_orderpriority, day_idx
"""


@register("priority_rolling_7d_revenue", oracle=_ROLLING_ORACLE)
def priority_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per order priority as a RANGE frame (6
    PRECEDING on an integer day index — days with no orders correctly
    widen the gap, which a ROWS frame would get wrong). The window runs
    over PRE-AGGREGATED daily rows — |priorities|x|days|, not the raw
    fact — so at 100 TB the fact table is touched once by a partial-agg
    shuffle and the window state stays tiny. Daily sums are kept as exact
    decimals INTO the window so the rolling sum is order-independent too."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.sum(F.col("o_totalprice").try_cast(DEC)).alias("daily_dec"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "day_idx",
        F.col("daily_dec").cast("string").cast("double").alias("daily_revenue"),
        F.sum("daily_dec").over(w).cast("string").cast("double").alias(
            "rolling_7d_revenue"
        ),
    ).orderBy("o_orderpriority", "day_idx")


# --------------------------------------------------------------------------
# CDC snapshot diff (operators/diff.py)
# --------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = """
WITH cls AS (
    SELECT s.*, substring(md5(CAST(s_suppkey AS VARCHAR)), 1, 1) AS d
    FROM supplier s
), new_snap AS (
    SELECT s_suppkey,
           CASE WHEN d = '2' THEN s_name || '*' ELSE s_name END AS s_name,
           s_nationkey,
           CASE WHEN d IN ('0', '1') THEN s_acctbal + 100.0 ELSE s_acctbal END AS s_acctbal
    FROM cls WHERE d <> 'f'
    UNION ALL
    SELECT s_suppkey + 1000000, 'NEW_' || CAST(s_suppkey AS VARCHAR),
           s_nationkey, 0.0
    FROM cls WHERE d = 'e'
), j AS (
    SELECT COALESCE(o.s_suppkey, n.s_suppkey) AS s_suppkey,
           CASE WHEN o.s_suppkey IS NULL THEN 'insert'
                WHEN n.s_suppkey IS NULL THEN 'delete'
                WHEN NOT (o.s_name IS NOT DISTINCT FROM n.s_name)
                  OR NOT (o.s_nationkey IS NOT DISTINCT FROM n.s_nationkey)
                  OR NOT (o.s_acctbal IS NOT DISTINCT FROM n.s_acctbal)
                THEN 'update' END AS op,
           list_filter([
               CASE WHEN NOT (o.s_name IS NOT DISTINCT FROM n.s_name) THEN 's_name' END,
               CASE WHEN NOT (o.s_nationkey IS NOT DISTINCT FROM n.s_nationkey) THEN 's_nationkey' END,
               CASE WHEN NOT (o.s_acctbal IS NOT DISTINCT FROM n.s_acctbal) THEN 's_acctbal' END
           ], x -> x IS NOT NULL) AS diffs,
           o.s_name AS old_s_name, o.s_nationkey AS old_s_nationkey,
           o.s_acctbal AS old_s_acctbal,
           n.s_name AS new_s_name, n.s_nationkey AS new_s_nationkey,
           n.s_acctbal AS new_s_acctbal
    FROM supplier o FULL OUTER JOIN new_snap n ON o.s_suppkey = n.s_suppkey
)
SELECT s_suppkey, op,
       COALESCE(array_to_string(
           CASE WHEN op = 'update' THEN diffs ELSE CAST([] AS VARCHAR[]) END,
           ','), '') AS changed_cols,
       old_s_name, old_s_nationkey, old_s_acctbal,
       new_s_name, new_s_nationkey, new_s_acctbal
FROM j
WHERE op IS NOT NULL
ORDER BY s_suppkey
"""


@register("supplier_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE)
def supplier_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction (operators/diff.py): diff the supplier dim against a
    deterministically mutated next-day snapshot (md5-class of the key:
    'f' rows deleted, '0'/'1' balance-updated, '2' renamed, 'e' rows
    cloned as inserts under shifted keys) and emit the insert / delete /
    update change set with per-row changed-column lists. One full-outer
    hash join; unchanged keys never reach the output."""
    from bbt_etl_dw_spark.operators.diff import snapshot_diff

    s = table(spark, sf_dir, "supplier")
    d = F.substring(F.md5(F.col("s_suppkey").cast("string")), 1, 1)
    cls = s.withColumn("d", d)
    mutated = cls.filter(F.col("d") != "f").select(
        "s_suppkey",
        F.when(F.col("d") == "2", F.concat(F.col("s_name"), F.lit("*")))
        .otherwise(F.col("s_name"))
        .alias("s_name"),
        "s_nationkey",
        F.when(F.col("d").isin("0", "1"), F.col("s_acctbal") + 100.0)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
    )
    inserted = cls.filter(F.col("d") == "e").select(
        (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
        F.concat(F.lit("NEW_"), F.col("s_suppkey").cast("string")).alias("s_name"),
        "s_nationkey",
        F.lit(0.0).alias("s_acctbal"),
    )
    new_snap = mutated.unionByName(inserted)
    diff = snapshot_diff(
        s,
        new_snap,
        keys=["s_suppkey"],
        compare_cols=["s_name", "s_nationkey", "s_acctbal"],
    )
    # The operator returns changed_cols as array<string> (callers want it
    # structured); flatten to a comma-joined string at the suite boundary so
    # the driver's pandas canonicalizer can sort/hash the column. The array
    # order is deterministic (compare_cols registration order), so no sort
    # is needed before joining.
    return diff.withColumn(
        "changed_cols", F.array_join(F.col("changed_cols"), ",")
    ).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# Count-distribution histogram incl. zero groups (TPC-H Q13 shape)
# --------------------------------------------------------------------------

_ORDER_HISTOGRAM_ORACLE = """
WITH per_cust AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
    GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


@register("customer_order_count_histogram", oracle=_ORDER_HISTOGRAM_ORACLE)
def customer_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts, INCLUDING
    zero-order customers — the left join + COUNT(right-side key) idiom
    (COUNT(*) would wrongly count the unmatched row). The status filter
    lives in the JOIN condition, not a WHERE (a WHERE would silently turn
    the left join inner). Two hash aggs, the second over |customers| rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderstatus != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# --------------------------------------------------------------------------
# Rank-family windows: ntile / percent_rank / cume_dist
# --------------------------------------------------------------------------

_DECILES_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(10) OVER w AS INTEGER) AS decile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_acctbal, c_custkey
"""


@register("customer_balance_deciles", oracle=_DECILES_ORACLE)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows per segment: ntile(10) deciles, percent_rank,
    cume_dist over account balance with the key as deterministic
    tie-break (without it ntile boundaries are run-dependent). Partitioned
    window — the per-segment sort distributes; both rank ratios are one
    integer division, so values are bit-identical cross-engine."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    ).orderBy("c_mktsegment", "c_acctbal", "c_custkey")


# --------------------------------------------------------------------------
# Time-series: calendar-spine resample with LOCF gap fill
# --------------------------------------------------------------------------

_RESAMPLE_ORACLE = f"""
WITH b AS (
    SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
           CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
    FROM events
), hours AS (
    SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour FROM b
), grid AS (
    SELECT hours.hour, t.event_type
    FROM hours, (SELECT DISTINCT event_type FROM events) AS t
), hourly AS (
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n,
           SUM(TRY_CAST(CAST(value AS VARCHAR) AS {SQL_DEC})) AS vdec
    FROM events
    GROUP BY hour, event_type
)
SELECT grid.hour, grid.event_type,
       COALESCE(h.n, 0) AS n_events,
       CAST(CAST(h.vdec AS VARCHAR) AS DOUBLE) AS hourly_value,
       CAST(CAST(last_value(h.vdec IGNORE NULLS) OVER (
            PARTITION BY grid.event_type ORDER BY grid.hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS value_filled
FROM grid LEFT JOIN hourly h USING (hour, event_type)
ORDER BY event_type, hour
"""


@register("events_hourly_resampled", oracle=_RESAMPLE_ORACLE)
def events_hourly_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events onto a dense hourly grid per event type: hours with
    no events appear with n_events=0 and carry the last known hourly value
    forward (LOCF). The spine is GENERATED (§2.1 S6 sequence generator)
    from one bounded min/max/collect_set agg — explode(sequence) then
    explode(types), two Generate nodes, NO cross join — so the grid costs
    |hours|x|types| rows regardless of fact size; hourly sums stay exact
    decimals INTO the gap-fill window so filled values are bit-stable. At
    100 TB the same plan partitions by (type, day-range); the window state
    is one decimal per type."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
        F.sort_array(F.collect_set("event_type")).alias("types"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        "types",
    ).select("hour", F.explode("types").alias("event_type"))
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").try_cast(DEC)).alias("vdec"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("vdec").cast("string").cast("double").alias("hourly_value"),
            F.last("vdec", ignorenulls=True)
            .over(w)
            .cast("string")
            .cast("double")
            .alias("value_filled"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# Year-over-year growth (lag window over pre-aggregated years)
# --------------------------------------------------------------------------

_YOY_ORACLE = f"""
WITH yearly AS (
    SELECT o_orderpriority,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC})) AS rev_dec
    FROM orders
    GROUP BY o_orderpriority, order_year
)
SELECT o_orderpriority, order_year,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(lag(rev_dec) OVER w AS VARCHAR) AS DOUBLE) AS prev_revenue,
       (CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
        - CAST(CAST(lag(rev_dec) OVER w AS VARCHAR) AS DOUBLE))
         / CAST(CAST(lag(rev_dec) OVER w AS VARCHAR) AS DOUBLE) AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_year)
ORDER BY o_orderpriority, order_year
"""


@register("orders_yoy_growth", oracle=_YOY_ORACLE)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per order priority: lag window over
    PRE-AGGREGATED (priority, year) decimal sums — |priorities|x|years|
    rows of window state, one fact shuffle; the growth ratio is arithmetic
    on canonical doubles, so the whole result is hash-exact."""
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_orderpriority",
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(F.sum(F.col("o_totalprice").try_cast(DEC)).alias("rev_dec"))
    w = Window.partitionBy("o_orderpriority").orderBy("order_year")
    rev = F.col("rev_dec").cast("string").cast("double")
    prev = F.lag("rev_dec").over(w).cast("string").cast("double")
    return yearly.select(
        "o_orderpriority",
        "order_year",
        rev.alias("revenue"),
        prev.alias("prev_revenue"),
        ((rev - prev) / prev).alias("yoy_growth"),
    ).orderBy("o_orderpriority", "order_year")


# --------------------------------------------------------------------------
# Dynamic partition pruning, gated in-plan
# --------------------------------------------------------------------------

# Per-process cache for the partitioned fact the DPP query probes: one
# mkdtemp + one write per (process, sf_dir) instead of per invocation —
# suite enumerations (driver sim, plan lint, invariants) reuse it — and an
# atexit rmtree so repeated runs don't accumulate fact copies in /tmp.
# Per-process (not a fixed shared path) keeps concurrent sessions from
# overwriting a directory another session is still lazily scanning.
_DPP_FACT_CACHE: dict[str, str] = {}


def _dpp_fact_path(spark: SparkSession, sf_dir: str, li: DataFrame) -> str:
    import atexit
    import shutil
    import tempfile

    if sf_dir in _DPP_FACT_CACHE:
        return _DPP_FACT_CACHE[sf_dir]
    path = tempfile.mkdtemp(prefix="bbt_dpp_fact_")
    li.select(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).write.mode("overwrite").partitionBy("ship_year").parquet(path)
    _DPP_FACT_CACHE[sf_dir] = path
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path

_DPP_ORACLE = f"""
WITH yrs AS (
    SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y
    FROM orders WHERE o_orderdate >= TIMESTAMP '1999-07-01'
)
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN yrs ON CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) = yrs.y
GROUP BY ship_year
ORDER BY ship_year
"""


@register("lineitem_dpp_revenue", oracle=_DPP_ORACLE)
def lineitem_dpp_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, proven in-plan: the fact is written
    partitioned by ship year (per-run dir), then joined to a RUNTIME-only
    dimension (distinct years of recent orders — unknowable at plan time);
    the builder RAISES unless Spark injects a dynamicpruning subquery into
    the fact scan's PartitionFilters, so a DPP regression is a red driver
    row, not a silent full scan. At 100 TB this is the difference between
    scanning 3 year-partitions and scanning the whole fact when the
    pruning values only exist at runtime."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    fact_path = _dpp_fact_path(spark, sf_dir, li)

    fact = spark.read.parquet(fact_path)
    yrs = F.broadcast(
        o.filter(F.col("o_orderdate") >= F.lit("1999-07-01").cast("timestamp"))
        .select(F.year("o_orderdate").cast("int").alias("y"))
        .distinct()
    )
    out = (
        fact.join(yrs, fact.ship_year == yrs.y)
        .groupBy("ship_year")
        .agg(
            dsum("rev", "revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("ship_year")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "no dynamicpruning filter reached the partitioned fact scan — "
            "dynamic partition pruning regressed:\n" + plan
        )
    return out


# --------------------------------------------------------------------------
# Bucketed co-located join, gated in-plan (completes the layout trilogy:
# static partition pruning = ann_ivf_partitioned_topk, dynamic = 
# lineitem_dpp_revenue, shuffle-free co-location = here)
# --------------------------------------------------------------------------

_BUCKETED_CACHE: dict[str, bool] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders bucketed by the join key once per (process,
    sf_dir) into a mkdtemp-backed external table (in-memory catalog — no
    metastore files land in the driver's cwd); atexit cleanup."""
    import atexit
    import shutil
    import tempfile

    suffix = "".join(c if c.isalnum() else "_" for c in sf_dir)
    li_name, o_name = f"li_bkt_{suffix}", f"o_bkt_{suffix}"
    # trust the SESSION catalog, not only the process cache: a caller that
    # rebuilt its SparkSession (fresh in-memory catalog) must re-register
    if not (
        _BUCKETED_CACHE.get(sf_dir)
        and spark.catalog.tableExists(li_name)
        and spark.catalog.tableExists(o_name)
    ):
        wh = tempfile.mkdtemp(prefix="bbt_bucketed_")
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        for df, name, key in ((li, li_name, "l_orderkey"), (o, o_name, "o_orderkey")):
            (
                df.write.mode("overwrite")
                .format("parquet")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{wh}/{name}")
                .saveAsTable(name)
            )
        _BUCKETED_CACHE[sf_dir] = True
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
    return li_name, o_name


_BUCKETED_ORACLE = f"""
SELECT o.o_orderpriority,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("bucketed_priority_revenue", oracle=_BUCKETED_ORACLE, bench=True)
def bucketed_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketing: both tables pre-bucketed
    (8 buckets) and sorted on the join key, so the sort-merge join reads
    bucket-aligned files with ZERO exchanges before the join — the
    'co-locate joins via bucketing' scale path for repeated big joins. The
    builder RAISES unless the joined plan is an SMJ with no Exchange
    upstream of it, so a layout/planner regression is a red driver row.
    (The merge hint mirrors real scale, where neither fact broadcasts.)"""
    li_name, o_name = _bucketed_tables(spark, sf_dir)
    li_b = spark.table(li_name).hint("merge")
    o_b = spark.table(o_name).hint("merge")
    joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" not in plan or "Exchange" in plan:
        raise AssertionError(
            "bucketed join did not plan as exchange-free SortMergeJoin — "
            "co-location regressed:\n" + plan
        )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Runtime bloom-filter join pruning, gated in-plan (the row-level member of
# the pruning family: static partition = ann_ivf_partitioned_topk, dynamic
# partition = lineitem_dpp_revenue, row-level semi-join reduction = here)
# --------------------------------------------------------------------------

_BLOOM_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY order_year
ORDER BY order_year
"""


@register("bloom_pruned_join", oracle=_BLOOM_ORACLE, bench=True)
def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction, proven in-plan: a
    selective dimension-side filter (urgent orders) injects a
    bloom_filter_might_contain predicate into the FACT scan stage, so
    non-matching lineitems drop BEFORE the shuffle instead of after the
    join — at 100 TB this is the difference between shuffling the whole
    fact and shuffling the ~20% that can match (Spark's
    InjectRuntimeFilter, the row-level sibling of dynamic partition
    pruning). The builder RAISES unless the bloom filter reached the
    plan. The plan executes eagerly inside the builder (localCheckpoint)
    while the enabling thresholds are set, and every touched conf is
    restored before returning — session state leaks to no other query.
    (Broadcast must be off for the join: with a broadcast dim the fact
    never shuffles and a bloom filter would be pure overhead — Spark
    correctly only injects into shuffle joins, which is exactly the
    non-broadcastable-dim regime this query models.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # the sf0.01 fact is far below the default 10GB application-side
        # threshold; lower it so injection triggers at test scale
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey", "o_orderdate")
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
                ),
                F.count(F.lit(1)).alias("n_lineitems"),
            )
            .orderBy("order_year")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "bloom_filter" not in plan.lower():
            raise AssertionError(
                "no bloom_filter_might_contain reached the fact side — "
                "runtime filter injection regressed:\n" + plan
            )
        # execute NOW, while the enabling confs hold (the driver's later
        # action would otherwise re-plan under restored confs)
        from bbt_etl_dw_spark.operators.ckpt import materialize

        return materialize(out)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# Rank WITH ties (TPC-H Q15 shape): top revenue supplier(s) per year
# --------------------------------------------------------------------------

_TOP_SUPPLIER_TIES_ORACLE = f"""
WITH rev AS (
    SELECT l.l_suppkey,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    GROUP BY l.l_suppkey, ship_year
), rk AS (
    SELECT s.s_suppkey, s.s_name, r.ship_year, r.revenue,
           RANK() OVER (PARTITION BY r.ship_year ORDER BY r.revenue DESC) AS rnk
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
)
SELECT ship_year, s_suppkey, s_name, revenue
FROM rk WHERE rnk = 1
ORDER BY ship_year, s_suppkey
"""


@register("top_supplier_per_year_with_ties", oracle=_TOP_SUPPLIER_TIES_ORACLE)
def top_supplier_per_year_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the maximum-revenue supplier of each ship year, keeping
    ALL suppliers that tie for the maximum — RANK(), not ROW_NUMBER()
    (the tie-dropping bug a row_number port would silently introduce; the
    reference's equi-join surface cannot express this at all). Revenue is
    the exact-decimal sum so the tie comparison itself is bit-exact
    cross-engine. Plan: one fact shuffle into the per-(supplier, year)
    agg, dim broadcast after the agg (join the SMALL aggregate, never the
    fact, to the supplier names), one dim-sized window."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(
            F.col("l_suppkey"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy("ship_year").orderBy(F.col("revenue").desc())
    return (
        rev.join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .select("ship_year", "s_suppkey", "s_name", "revenue")
        .orderBy("ship_year", "s_suppkey")
    )


# --------------------------------------------------------------------------
# Nation-pair trade flows (TPC-H Q7 shape)
# --------------------------------------------------------------------------

_TRADE_FLOWS_ORACLE = f"""
WITH geo_s AS (
    SELECT s.s_suppkey, n.n_name AS supp_nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
), geo_c AS (
    SELECT c.c_custkey, n.n_name AS cust_nation
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT gs.supp_nation, gc.cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'volume')},
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN geo_s gs ON l.l_suppkey = gs.s_suppkey
JOIN geo_c gc ON o.o_custkey = gc.c_custkey
WHERE gs.supp_nation < gc.cust_nation
GROUP BY gs.supp_nation, gc.cust_nation, ship_year
ORDER BY gs.supp_nation, gc.cust_nation, ship_year
"""


@register("nation_pair_trade_flows", oracle=_TRADE_FLOWS_ORACLE)
def nation_pair_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipped volume between ordered nation PAIRS (supplier
    nation < customer nation) per ship year — the cross-nation trade-flow
    matrix. Plan: the only fact⋈fact join (lineitem⋈orders) shuffles
    once; both geo lookups broadcast (supplier and customer dims joined
    to nation FIRST, so the fact-side joins attach one string each, not a
    join chain); the asymmetric pair filter runs pre-aggregation inside
    codegen. Exact-decimal volume."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    geo_s = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    geo_c = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(geo_s, li.l_suppkey == geo_s.s_suppkey)
        .join(geo_c, o.o_custkey == geo_c.c_custkey)
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Per-group-min correlated subquery (TPC-H Q2 shape)
# --------------------------------------------------------------------------

_MIN_COST_SUPPLIER_ORACLE = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice * (1.0 - l_discount) / l_quantity) AS supply_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.supply_cost, s.s_acctbal
FROM part p
JOIN ps ON ps.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 10 AND p.p_type = 'SMALL'
  AND ps.supply_cost = (SELECT MIN(ps2.supply_cost)
                        FROM ps ps2 WHERE ps2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_name
"""


@register("min_cost_supplier_per_part", oracle=_MIN_COST_SUPPLIER_ORACLE)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small part, the supplier(s) offering the minimum
    observed unit cost (the tables have no partsupp, so supply cost is
    derived: MIN discounted unit price per (part, supplier) over lineitem).
    The correlated per-group-min subquery is rewritten as a per-part MIN
    aggregate joined back — keeping ALL suppliers that tie at the minimum,
    exactly as the correlated form does (the oracle runs the subquery
    verbatim). Plan: the fact is semi-join-pruned by the broadcast part
    filter BEFORE its one shuffle into the (part, supplier) agg — the
    scale win Catalyst cannot infer through the correlated form, since
    only filtered parts ever need costing; the per-part min and the
    join-back operate on the already-aggregated (dim-sized) rows; all dim
    attachments broadcast. Unit cost uses MIN over identical per-row IEEE
    expressions — exact cross-engine without the decimal machinery (MIN,
    unlike SUM, is order-independent)."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    unit_cost = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        / F.col("l_quantity")
    )
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_cost).alias("supply_cost"))
    )
    # the (part, supplier) cost rollup feeds the per-part min AND the
    # tie-keeping join-back — materialized (dim-grain), the semi-pruned
    # fact aggregation runs once, not twice (r14 plan audit)
    ps = materialize(ps)
    min_pp = ps.groupBy("l_partkey").agg(F.min("supply_cost").alias("min_cost"))
    winners = ps.join(min_pp, "l_partkey").filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        winners.join(F.broadcast(p), winners.l_partkey == p.p_partkey)
        .join(F.broadcast(s), winners.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "supply_cost", "s_acctbal")
        .orderBy("p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# Nested semi-join chain with correlated HAVING (TPC-H Q20 shape)
# --------------------------------------------------------------------------

_DOMINANT_SUPPLIER_ORACLE = f"""
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_partkey, l.l_suppkey
    HAVING SUM(TRY_CAST(CAST(l.l_quantity AS VARCHAR) AS {SQL_DEC}))
         > (SELECT SUM(TRY_CAST(CAST(l2.l_quantity AS VARCHAR) AS {SQL_DEC}))
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l2.l_shipdate <  TIMESTAMP '1998-01-01')
         - SUM(TRY_CAST(CAST(l.l_quantity AS VARCHAR) AS {SQL_DEC}))
)
ORDER BY s.s_suppkey
"""


@register("dominant_part_suppliers", oracle=_DOMINANT_SUPPLIER_ORACLE)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the two-level nested semi-join chain — suppliers who
    shipped MORE THAN HALF of some small part's total 1997 volume (the
    tables have no partsupp.availqty, so "excess stock" becomes majority
    share: q > total - q, the same correlated-threshold-in-HAVING shape).
    Rewrite: part filter broadcast-semi-prunes the fact BEFORE its single
    shuffle into the (part, supplier) quantity agg; the per-part total is
    a second aggregate OVER THE PAIR AGGREGATE (dim-sized rows, never a
    second fact pass — the oracle's correlated subquery re-scans lineitem
    per group); the majority test joins the two small aggregates; the
    surviving supplier keys semi-join the supplier dim. Quantity sums are
    exact decimals kept IN decimal through the threshold comparison
    (q > t - q is exact; a double sum would make the strict inequality
    partitioning-dependent at the boundary)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier")
    pair = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").try_cast(DEC)).alias("qd"))
    )
    # the (part, supplier) quantity rollup feeds the per-part total AND
    # the majority join — materialized (dim-grain), the semi-pruned fact
    # aggregation runs once, not twice (r14 plan audit)
    pair = materialize(pair)
    tot = pair.groupBy("l_partkey").agg(F.sum("qd").alias("td"))
    winners = (
        pair.join(tot, "l_partkey")
        .filter(F.col("qd") > F.col("td") - F.col("qd"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(winners), s.s_suppkey == winners.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Pivot (wide dashboard matrix) and unpivot (wide -> long melt)
# --------------------------------------------------------------------------

_PRIORITY_PIVOT_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC}))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS VARCHAR) AS DOUBLE)
            AS urgent,
       CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC}))
            FILTER (WHERE o_orderpriority = '2-HIGH') AS VARCHAR) AS DOUBLE)
            AS high,
       CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC}))
            FILTER (WHERE o_orderpriority = '3-MEDIUM') AS VARCHAR) AS DOUBLE)
            AS medium,
       CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC}))
            FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS VARCHAR) AS DOUBLE)
            AS not_specified,
       CAST(CAST(SUM(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS {SQL_DEC}))
            FILTER (WHERE o_orderpriority = '5-LOW') AS VARCHAR) AS DOUBLE)
            AS low
FROM orders
GROUP BY order_year
ORDER BY order_year
"""

_PRIORITIES = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "not_specified"),
    ("5-LOW", "low"),
]


@register("orders_priority_pivot", oracle=_PRIORITY_PIVOT_ORACLE)
def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: the year x priority revenue matrix every dashboard wants
    wide. The pivot values are EXPLICIT — with an inferred value list
    Spark first runs a distinct job over the pivot column AND the output
    schema becomes data-dependent (a new priority value appearing at
    100 TB would silently add a column and break every consumer);
    explicit values make the pivot a single pass with a fixed contract.
    A year with no orders of some priority yields NULL in that cell on
    both engines (empty SUM). Exact-decimal sums per cell."""
    o = table(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", [v for v, _ in _PRIORITIES])
        .agg(dsum("o_totalprice", "v"))
    )
    return wide.select(
        "order_year", *[F.col(v).alias(a) for v, a in _PRIORITIES]
    ).orderBy("order_year")


_EVENTS_UNPIVOT_ORACLE = f"""
WITH wide AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n_events,
           {sql_dsum('value', 'total_value')},
           CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
    FROM events
    GROUP BY event_type
)
SELECT event_type, metric, metric_value FROM (
    SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM wide
    UNION ALL
    SELECT event_type, 'total_value', total_value FROM wide
    UNION ALL
    SELECT event_type, 'n_users', n_users FROM wide
)
ORDER BY event_type, metric
"""


@register("events_type_metrics_unpivot", oracle=_EVENTS_UNPIVOT_ORACLE)
def events_type_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): a wide per-event-type metric block turned long —
    the wide-to-long reshape feeding any metrics store or chart library.
    The unpivot runs AFTER aggregation, on the dim-sized wide frame
    (5 rows here, |event_type| in general), so the melt costs nothing at
    any scale — melting the raw fact first and aggregating per metric
    would triple the fact pass. Value columns unify to double; the exact
    decimal sum is cast at the boundary as usual."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        dsum("value", "total_value"),
        F.countDistinct("user_id").cast("double").alias("n_users"),
    )
    return wide.unpivot(
        "event_type",
        ["n_events", "total_value", "n_users"],
        "metric",
        "metric_value",
    ).orderBy("event_type", "metric")


# --------------------------------------------------------------------------
# Local-supplier volume: customer and supplier in the SAME nation (Q5 shape)
# --------------------------------------------------------------------------

_LOCAL_SUPPLIER_ORACLE = f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'local_revenue')}
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY local_revenue DESC, nation
"""


@register("local_supplier_volume", oracle=_LOCAL_SUPPLIER_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue per nation from orders where the customer and the
    line's supplier live in the SAME nation (the reference suite's join
    family, SURVEY §2.3, stops at star joins — this is the snowflake
    variant with a cross-dimension equality). The c_nationkey=s_nationkey
    predicate is NOT a join key between two fact-sized sides: customer and
    supplier each attach their nationkey via ordinary key joins (AQE
    broadcasts them at dim scale; at extreme scale they are legitimate
    key shuffles, exactly like classic Q5), and the equality filters as
    a residual row predicate. The year filter pushes down to the orders
    scan and gates the fact before any shuffle."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "local_revenue"))
        .orderBy(F.desc("local_revenue"), "nation")
    )


# --------------------------------------------------------------------------
# Forecast revenue change: pure scan-aggregate with range predicates (Q6)
# --------------------------------------------------------------------------

_FORECAST_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'potential_revenue')},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24.0
"""


@register("forecast_revenue_change", oracle=_FORECAST_ORACLE, bench=True)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the canonical scan-aggregate — revenue that would have
    been gained by eliminating small discounts on low-quantity lines. No
    join, no shuffle beyond the final 1-row reduce; the whole query is a
    parquet scan with ALL THREE range predicates pushed down
    (min/max row-group pruning on shipdate/discount/quantity) plus a
    3-column ReadSchema. At 100 TB this is the query whose entire cost is
    I/O — the plan gate in tests/test_plans.py pins the pushdown so a
    regression to a post-scan filter is loud."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "potential_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Profit decomposition by supplier nation and year (Q9 shape)
# --------------------------------------------------------------------------

# The test lake has no partsupp table (TESTDATA.md), so ps_supplycost is
# proxied by a deterministic unit-cost expression on the part dim:
# 60% of retail price. The SHAPE under test — LIKE-filtered part dim,
# profit arithmetic mixing fact and dim columns, group by supplier
# nation x order year — is Q9's.
_NATION_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity', 'profit')}
FROM lineitem l
JOIN part p     ON l.l_partkey  = p.p_partkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE 'red%'
GROUP BY nation, order_year
ORDER BY nation, order_year DESC
"""


@register("nation_profit_by_year", oracle=_NATION_PROFIT_ORACLE)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on 'red%' parts per supplier nation per year,
    profit = discounted price minus a unit-cost proxy (0.6 x retail; the
    lake has no partsupp table — see oracle comment). The LIKE-pruned
    part dim joins FIRST so non-matching lineitem rows die before the
    orderkey shuffle (the selective dim gates the fact — the join-order
    property tests/test_cbo.py proves the cost-based optimizer finds;
    here it is declared). The pruned part frame carries no broadcast
    hint — AQE sizes it (fact-proportional at extreme scale);
    supplier⋈nation folds into one broadcast map per the repo's
    supplier-dim convention. One fact shuffle total (lineitem⋈orders)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("nation", F.desc("order_year"))
    )


# --------------------------------------------------------------------------
# Returned-item top customers (Q10 shape)
# --------------------------------------------------------------------------

_RETURNED_TOP_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'lost_revenue')}
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, nation
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


@register("returned_item_top_customers", oracle=_RETURNED_TOP_ORACLE, bench=True)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: the 20 customers who returned the most revenue in one
    quarter. High-cardinality group-by (customer) followed by a global
    top-k: the agg shuffles on custkey, then TakeOrderedAndProject keeps
    20 rows per partition and merges on the driver — no global sort at any
    scale. Both selective predicates (quarter on orders, 'R' flag on
    lineitem) push to their scans BEFORE the orderkey shuffle; the tie on
    equal revenue breaks by custkey so the LIMIT is deterministic
    cross-engine. The customer-derived geo frame carries NO broadcast
    hint — customer is fact-proportional at extreme scale, so AQE sizes
    the join (the standing discipline from the round-6 batch-5 review);
    nation, a true dim, is hinted."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", F.col("n_name").alias("nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "nation")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "lost_revenue"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Two-bucket CASE-count after a fact join (Q12 shape)
# --------------------------------------------------------------------------

# The lake's lineitem has no l_shipmode/commitdate/receiptdate
# (TESTDATA.md), so the Q12 grouping attribute is l_linestatus and the
# "late shipment" predicate is shipdate > orderdate + 90 days. The SHAPE —
# join fact to orders, group by a lineitem attribute, split the count into
# critical / non-critical priority buckets with CASE — is Q12's.
_LINESTATUS_PRIORITY_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("linestatus_priority_counts", oracle=_LINESTATUS_PRIORITY_ORACLE)
def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: late shipments (>90 days after ordering) per line
    status, with the order count split into high/low priority CASE
    buckets inside ONE hash aggregate — the two conditional counts share
    the single fact pass instead of two filtered scans. The year filter
    pushes to the orders scan; the lateness predicate is a residual on the
    orderkey join (it references both sides, so it can't push further —
    exactly where it belongs)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Promo revenue share: conditional ratio aggregate (Q14 shape)
# --------------------------------------------------------------------------

_PROMO_SHARE_ORACLE = f"""
SELECT {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", 'promo_revenue')},
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'total_revenue')},
       100.0 * CAST(CAST(SUM(TRY_CAST(CAST((CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(TRY_CAST(CAST((l.l_extendedprice * (1 - l.l_discount)) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate <  TIMESTAMP '1997-06-01'
"""


@register("promo_revenue_share", oracle=_PROMO_SHARE_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage of one quarter's revenue from PROMO-type
    parts. The conditional numerator and unconditional denominator fold
    into the SAME single hash aggregate (one fact pass); the part join is
    AQE-sized (no unconditional hint — part is fact-proportional); the
    quarter filter pushes to the lineitem scan. The percentage is one
    IEEE division of two exact-decimal sums, so the ratio is bit-stable
    cross-engine (the davg/dsum discipline, functions/numeric.py)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(promo.try_cast(DEC)).alias("_num_dec"),
        F.sum(rev.try_cast(DEC)).alias("_den_dec"),
    )
    num = F.col("_num_dec").cast("string").cast("double")
    den = F.col("_den_dec").cast("string").cast("double")
    return agg.select(
        num.alias("promo_revenue"),
        den.alias("total_revenue"),
        (100.0 * num / den).alias("promo_share_pct"),
    )


# --------------------------------------------------------------------------
# Supplier counts by part attributes with a NOT-IN exclusion (Q16 shape)
# --------------------------------------------------------------------------

# No partsupp table: the part→supplier relation under test is the one the
# fact records (distinct l_partkey/l_suppkey pairs), and the Q16
# "complaints" exclusion list is suppliers with negative account balance.
_SUPPLIER_COUNT_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type <> 'ECONOMY'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("part_supplier_counts", oracle=_SUPPLIER_COUNT_ORACLE)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many distinct suppliers ship each (brand, type,
    size) combination, excluding blacklisted suppliers (negative balance
    — the lake's analog of Q16's complaints LIKE). The NOT IN is a
    LEFT ANTI hash join against the blacklist (NOT IN's
    three-valued-logic trap is avoided because s_suppkey is non-null by
    construction; the anti join is the correct plan either way; AQE
    broadcasts the blacklist at dim scale). The <>/IN part predicates
    push into the part scan BEFORE the fact join, and COUNT(DISTINCT suppkey) expands to the standard two-level
    agg — partial distinct on (group, suppkey), then count — so no
    buffer ever holds a full supplier set."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#4")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Disjunctive bracket predicate join (Q19 shape)
# --------------------------------------------------------------------------

_BRACKET_ORACLE = f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'bracket_revenue')},
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1.0 AND 11.0)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10.0 AND 20.0)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20.0 AND 30.0)
"""


@register("disjunctive_bracket_revenue", oracle=_BRACKET_ORACLE)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue from three OR'd brand/size/quantity brackets —
    the classic disjunctive join predicate. Catalyst's CNF conversion
    extracts the single-side implications: the part scan keeps only the
    three brands (and size >= 1), the lineitem scan keeps quantity in the
    union range [1, 30] — both pushed to parquet — while the full
    cross-side disjunction evaluates as a residual on the single
    AQE-sized hash join. Writing the OR verbatim and letting the optimizer split it is
    the point: hand-splitting into three unioned joins would scan the
    fact three times."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1.0, 11.0))
        | ((b == "Brand#23") & sz.between(1, 25) & q.between(10.0, 20.0))
        | ((b == "Brand#34") & sz.between(1, 35) & q.between(20.0, 30.0))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "bracket_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
