"""Advanced-analytics shapes: group-wise OLS trend fitting, exact
distributed percentiles, market-basket co-occurrence, trailing-window
EWMA smoothing, and blocked fuzzy dimension matching.

These extend the warehouse layer past the reference's aggregate surface
(SURVEY §2.4 stops at sum/max/count/describe) with the next tier of
analytics a dashboard user reaches for — each expressed as the plan
that survives 100 TB: sufficient-statistics aggregation for regression
(5 numbers per group cross the wire), a single ranked shuffle for exact
percentiles, an equi-self-join bounded by basket width for
co-occurrence, a single keyed window for EWMA, and broadcast blocking
for fuzzy matching. All numeric output follows the exact-decimal /
fixed-IEEE-sequence discipline so every query carries a bit-exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import dsum, sql_dsum
from bbt_etl_dw_spark.operators.basket import cooccurrence_pairs, item_cosine_topk
from bbt_etl_dw_spark.operators.ckpt import materialize
from bbt_etl_dw_spark.operators.graphstats import sql_triangle_ctes, triangle_stats
from bbt_etl_dw_spark.operators.er import blocked_fuzzy_lookup
from bbt_etl_dw_spark.operators.smooth import trailing_ewma
from bbt_etl_dw_spark.operators.stats import (
    exact_group_percentiles,
    group_ols_slope,
    mann_whitney_u,
    sql_mann_whitney_ctes,
    sql_ols_exprs,
    sql_percentile_exprs,
)
from bbt_etl_dw_spark.suite import register

# --------------------------------------------------------------------------
# Group-wise OLS: revenue trend per supplier nation (regr_slope shape)
# --------------------------------------------------------------------------

_OLS = sql_ols_exprs("order_year", "revenue")

_TREND_ORACLE = f"""
WITH yearly AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  GROUP BY nation, order_year
)
SELECT nation,
       {_OLS['n_points']} AS n_points,
       {_OLS['slope']} AS slope,
       {_OLS['intercept']} AS intercept
FROM yearly
GROUP BY nation
ORDER BY nation
"""


@register("nation_yearly_revenue_trend", oracle=_TREND_ORACLE)
def nation_yearly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regr_slope shape: least-squares revenue-vs-year trend per supplier
    nation. Stage 1 is the Q9-style star aggregation (supplier⋈nation
    folded into one broadcast map, ONE fact shuffle on the group keys);
    stage 2 fits the line from sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) — a second aggregation over nation×year rows, i.e. dim-scale
    input. The sums are map-side combinable, which is the only
    regression formulation that works at 100 TB: no per-group value
    lists, just 5 numbers per group across the wire."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    yearly = (
        li.join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    return group_ols_slope(yearly, ["nation"], "order_year", "revenue").orderBy(
        "nation"
    )


# --------------------------------------------------------------------------
# Exact percentiles per group (percentile_cont shape, sort-based)
# --------------------------------------------------------------------------

_PCTS = {"p25": 0.25, "p50": 0.5, "p90": 0.9}

_PCT_FRAGS = ",\n       ".join(sql_percentile_exprs(_PCTS))

_PCT_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DOUBLE) AS _v,
         ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(o_totalprice AS DOUBLE)) - 1 AS _rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS _cnt
  FROM orders
  WHERE CAST(o_totalprice AS DOUBLE) IS NOT NULL
    AND NOT isnan(CAST(o_totalprice AS DOUBLE))
)
SELECT o_orderpriority,
       {_PCT_FRAGS}
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("order_price_percentiles", oracle=_PCT_ORACLE)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile_cont(0.25/0.5/0.9) of order value per priority,
    via distributed sort: ONE hash-partitioned sort on the group key
    serves both window functions (rank + group size), then only the
    floor/ceil-ranked rows of each percentile reach the closing
    aggregate. The exact complement of the approx-sketch path
    (order_quantile_sketch_check): same answer contract, full-precision,
    at the cost of a sort instead of a mergeable sketch."""
    o = table(spark, sf_dir, "orders")
    return exact_group_percentiles(
        o, ["o_orderpriority"], "o_totalprice", _PCTS
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Market-basket co-occurrence over order lineitems
# --------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
pairs AS (
  SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS pair_n
  FROM bi a JOIN bi b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY item_a, item_b
  HAVING COUNT(*) >= 2
),
freq AS (SELECT i, COUNT(*) AS n FROM bi GROUP BY i),
tot AS (SELECT COUNT(DISTINCT b) AS total FROM bi)
SELECT p.item_a, p.item_b, p.pair_n, fa.n AS n_a, fb.n AS n_b,
       CAST(p.pair_n AS DOUBLE) / CAST(t.total AS DOUBLE) AS support,
       (CAST(p.pair_n AS DOUBLE) * CAST(t.total AS DOUBLE))
         / (CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)) AS lift
FROM pairs p
JOIN freq fa ON p.item_a = fa.i
JOIN freq fb ON p.item_b = fb.i
CROSS JOIN tot t
ORDER BY p.pair_n DESC, p.item_a, p.item_b
LIMIT 25
"""


@register("order_part_cooccurrence", oracle=_BASKET_ORACLE, bench=True)
def order_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: the 25 strongest part pairs by co-purchase
    count, with support and lift. Pair generation is an equi-self-join
    on orderkey whose fanout is C(basket,2) — bounded by order width,
    never corpus² — and the (order, part) projection deduplicates first
    so multi-line parts cannot inflate counts. Item frequencies are
    dim-cardinality and broadcast; the basket total is a one-row
    broadcast scalar. The LIMIT tie-breaks on (count desc, keys) so the
    cut is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    return (
        cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_pair_count=2)
        .orderBy(F.desc("pair_n"), "item_a", "item_b")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Trailing-window EWMA per user over purchase events
# --------------------------------------------------------------------------

_EWMA_ORACLE = """
SELECT event_id, user_id, ts_us, value,
       (CASE WHEN len(lf) > 0 THEN list_reduce(
           lf, (acc, x) -> CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * acc
       ) END) AS ewma
FROM (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         list_filter(list(CAST(value AS DOUBLE)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 31 PRECEDING AND CURRENT ROW),
             x -> x IS NOT NULL) AS lf
  FROM events
  WHERE event_type = 'purchase'
)
ORDER BY user_id, ts_us, event_id
"""


@register("events_purchase_ewma", oracle=_EWMA_ORACLE, bench=True)
def events_purchase_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(α=0.5) of purchase value per user over the trailing 32
    events — the recursive smoother no SQL frame expresses, computed as
    a JVM array fold over a bounded sliding window (operators/smooth.py:
    one shuffle, K doubles per row, bit-exact across engines because
    α=0.5 makes both fold multiplications exact). Timestamps surface as
    epoch microseconds per the repo's timezone discipline."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    sm = trailing_ewma(
        e, ["user_id"], ["ts", "event_id"], "value", alpha=0.5, k=32
    )
    return sm.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "ewma",
    ).orderBy("user_id", "ts_us", "event_id")


# --------------------------------------------------------------------------
# Blocked fuzzy dimension matching (entity resolution)
# --------------------------------------------------------------------------

# Dirty aliases exercising each matcher path: exact hit, deletion /
# insertion / substitution / punctuation typos, an equal-distance tie
# (NATION__5 is distance 1 from both NATION_5 and NATION_15 — the
# n_nationkey tie-break must pick NATION_5 deterministically), a
# first-character typo (MATION_9: blocking recall miss by design), a
# case mismatch (levenshtein is case-sensitive; distance 6 > max_dist),
# and a no-candidate string.
_ALIASES = (
    "NATION_3",
    "NATON_7",
    "NATION-12",
    "NATIONN_21",
    "NATIPN_15",
    "NATI0N_24",
    "NATION__5",
    "MATION_9",
    "nation_4",
    "ATLANTIS",
)

_ALIAS_VALUES = ", ".join(f"('{a}')" for a in _ALIASES)

_FUZZY_ORACLE = f"""
WITH aliases(alias) AS (VALUES {_ALIAS_VALUES}),
cand AS (
  SELECT a.alias, n.n_nationkey, n.n_name,
         levenshtein(a.alias, n.n_name) AS d
  FROM aliases a
  JOIN nation n
    ON substr(a.alias, 1, 1) = substr(n.n_name, 1, 1)
   AND abs(CAST(FLOOR(CAST(LENGTH(a.alias) AS DOUBLE) / 4) AS BIGINT)
         - CAST(FLOOR(CAST(LENGTH(n.n_name) AS DOUBLE) / 4) AS BIGINT)) <= 1
  WHERE levenshtein(a.alias, n.n_name) <= 2
),
best AS (
  SELECT alias, n_nationkey, n_name, d,
         ROW_NUMBER() OVER (PARTITION BY alias ORDER BY d, n_nationkey) AS rk
  FROM cand
)
SELECT a.alias, b.n_nationkey, b.n_name AS matched_nation,
       b.d AS match_dist
FROM aliases a
LEFT JOIN best b ON a.alias = b.alias AND b.rk = 1
ORDER BY a.alias
"""


@register("nation_fuzzy_aliases", oracle=_FUZZY_ORACLE)
def nation_fuzzy_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dimension normalization: dirty nation aliases matched to
    the canonical dim by blocked edit distance (operators/er.py). The
    canonical side broadcasts with ±1 length-band expansion, so the
    probe side — fact-proportional in production — joins on the block
    key without shuffling and never sees a nested-loop comparison.
    Unmatched aliases (first-char typo defeats blocking; case-sensitive
    distance over budget; no candidate) surface with NULLs for audit
    instead of dropping."""
    aliases = spark.createDataFrame(
        [(a,) for a in _ALIASES], "alias string"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = blocked_fuzzy_lookup(
        aliases, "alias", nation, "n_name", "n_nationkey",
        max_dist=2, band_width=4,
    )
    return out.select(
        "alias",
        "n_nationkey",
        F.col("n_name").alias("matched_nation"),
        "match_dist",
    ).orderBy("alias")


# --------------------------------------------------------------------------
# Pearson correlation per group (sufficient-statistics, regr family)
# --------------------------------------------------------------------------

from bbt_etl_dw_spark.operators.stats import (  # noqa: E402
    mad_outlier_summary,
    pearson_corr,
    sql_pearson_corr,
)

_CORR_ORACLE = f"""
SELECT l_returnflag,
       COUNT(CASE WHEN TRY_CAST(CAST(CAST(l_quantity AS DOUBLE) AS VARCHAR)
                        AS DECIMAL(38,18)) IS NOT NULL THEN 1 END) AS n_lines,
       {sql_pearson_corr('l_quantity', 'l_extendedprice')} AS corr_qty_price,
       {sql_pearson_corr('l_quantity', 'l_discount')} AS corr_qty_discount
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("lineitem_correlations", oracle=_CORR_ORACLE)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per return flag: quantity↔extended-price and
    quantity↔discount (this synthetic lake generates the three columns
    independently, so both are ≈0 — the independence finding is the
    point; tests/test_analytics_ops.py proves ±1/0 recovery on
    constructed data). Computed from sufficient statistics in ONE
    map-side-combinable aggregation pass (operators/stats.pearson_corr)
    — Spark's built-in ``corr`` is a merge-order-dependent co-moment
    recurrence, unusable under the engine's bit-reproducibility
    contract."""
    li = table(spark, sf_dir, "lineitem")
    n_lines = F.count(
        F.when(
            F.col("l_quantity").cast("double").try_cast("decimal(38,18)").isNotNull(),
            1,
        )
    ).alias("n_lines")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n_lines,
            pearson_corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
            pearson_corr("l_quantity", "l_discount").alias("corr_qty_discount"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Robust outlier profile: median / MAD per group
# --------------------------------------------------------------------------

_MED_FRAG = sql_percentile_exprs({"median": 0.5})[0]
_MAD_FRAG = sql_percentile_exprs({"mad": 0.5})[0]

_MAD_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         CAST(value AS DOUBLE) AS _v,
         ROW_NUMBER() OVER (
             PARTITION BY event_type
             ORDER BY CAST(value AS DOUBLE)) - 1 AS _rn,
         COUNT(*) OVER (PARTITION BY event_type) AS _cnt
  FROM events
  WHERE CAST(value AS DOUBLE) IS NOT NULL
    AND NOT isnan(CAST(value AS DOUBLE))
),
med AS (SELECT event_type, {_MED_FRAG} FROM ranked GROUP BY event_type),
dev AS (
  SELECT e.event_type, CAST(e.value AS DOUBLE) AS v,
         ABS(CAST(e.value AS DOUBLE) - m.median) AS adev, m.median
  FROM events e JOIN med m USING (event_type)
),
ranked2 AS (
  SELECT event_type, adev AS _v,
         ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY adev) - 1 AS _rn,
         COUNT(*) OVER (PARTITION BY event_type) AS _cnt
  FROM dev
  WHERE adev IS NOT NULL AND NOT isnan(adev)
),
madt AS (SELECT event_type, {_MAD_FRAG} FROM ranked2 GROUP BY event_type)
SELECT d.event_type,
       COUNT(d.v) AS n_rows,
       MAX(d.median) AS median,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > CAST(3.0 AS DOUBLE) * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN madt m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("events_value_outliers_mad", oracle=_MAD_ORACLE)
def events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier profile of event value per type — the
    data-quality complement of z-score anomaly rules: median and MAD
    cannot be dragged by the very outliers being counted (events.value
    is heavy-tailed, so the counts are non-trivially exercised: ~11% of
    rows sit beyond 3 MAD at sf0.01). Two ranked shuffles (one per
    percentile pass), group-level medians broadcast back onto the rows
    (operators/stats.mad_outlier_summary)."""
    e = table(spark, sf_dir, "events")
    return mad_outlier_summary(
        e, ["event_type"], "value", k=3.0
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# PageRank over the nation trade-flow graph (iterative linear algebra)
# --------------------------------------------------------------------------

def _pagerank_oracle(damping: float, iters: int) -> str:
    """Unrolled replay of operators/pagerank.pagerank: every iteration's
    contributions, dangling mass, and update arithmetic mirrored
    operation-for-operation (the kmeans-replay technique applied to a
    second iterative algorithm). Literals carry Python's exact double
    repr — e.g. 1-0.85 is 0.15000000000000002, not 0.15."""
    d = f"CAST({damping!r} AS DOUBLE)"
    base = f"CAST({1.0 - damping!r} AS DOUBLE)"
    zero = "CAST(0 AS DOUBLE)"
    sql = f"""
WITH geo_s AS (
  SELECT s.s_suppkey, n.n_name AS supp_nation
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
), geo_c AS (
  SELECT c.c_custkey, n.n_name AS cust_nation
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), e AS (
  SELECT gs.supp_nation AS src, gc.cust_nation AS dst,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'w')}
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN geo_s gs ON l.l_suppkey = gs.s_suppkey
  JOIN geo_c gc ON o.o_custkey = gc.c_custkey
  GROUP BY src, dst
),
outw AS (SELECT src, {sql_dsum('w', 'out_w')} FROM e GROUP BY src),
frac AS (SELECT e.src, e.dst, e.w / o2.out_w AS f FROM e JOIN outw o2 USING (src)),
v AS (SELECT n_name AS vid FROM nation),
nn AS (SELECT COUNT(*) AS n FROM v),
srcs AS (SELECT DISTINCT src FROM e),
p0 AS (SELECT vid, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS p FROM v, nn)"""
    prev = "p0"
    for it in range(1, iters + 1):
        sql += f""",
c{it} AS (
  SELECT f.dst, {sql_dsum('p.p * f.f', 'inw')}
  FROM frac f JOIN {prev} p ON p.vid = f.src GROUP BY f.dst
),
d{it} AS (
  SELECT {sql_dsum('p.p', 'dm')}
  FROM {prev} p LEFT JOIN srcs s ON p.vid = s.src WHERE s.src IS NULL
),
p{it} AS (
  SELECT p.vid,
         ({base} + {d} * COALESCE(dd.dm, {zero})) / CAST(nn.n AS DOUBLE)
           + {d} * COALESCE(c.inw, {zero}) AS p
  FROM {prev} p
  LEFT JOIN c{it} c ON p.vid = c.dst
  CROSS JOIN d{it} dd CROSS JOIN nn
)"""
        prev = f"p{it}"
    sql += f"""
SELECT vid AS nation, p AS pagerank FROM {prev} ORDER BY nation
"""
    return sql


@register("nation_trade_pagerank", oracle=_pagerank_oracle(0.85, 3))
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the directed nation→nation trade-flow
    graph (edge weight = exact-decimal revenue supplier-nation →
    customer-nation), damping 0.85, 3 iterations, dangling mass
    redistributed uniformly. The engine's second iterative-algorithm
    family (operators/pagerank.py — the Pregel-in-DataFrames pattern:
    one keyed edges⋈ranks join + one dst aggregation per iteration);
    the oracle replays all three iterations bit-exactly."""
    from bbt_etl_dw_spark.operators.pagerank import pagerank

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
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(geo_s, li.l_suppkey == geo_s.s_suppkey)
        .join(geo_c, o.o_custkey == geo_c.c_custkey)
        .groupBy(
            F.col("supp_nation").alias("src"),
            F.col("cust_nation").alias("dst"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "weight"))
    )
    verts = n.select(F.col("n_name").alias("id"))
    pr = pagerank(verts, edges, damping=0.85, iters=3)
    return pr.select(F.col("id").alias("nation"), "pagerank").orderBy("nation")


# --------------------------------------------------------------------------
# Equi-depth histogram per group (optimizer-statistics shape)
# --------------------------------------------------------------------------

_NBUCKETS = 8
_HIST_QS = {f"q{j}": j / _NBUCKETS for j in range(1, _NBUCKETS)}

_HIST_FRAGS = ",\n       ".join(sql_percentile_exprs(_HIST_QS))

_HIST_BUCKET_SQL = " + ".join(
    f"(CASE WHEN CAST(o.o_totalprice AS DOUBLE) > b.q{j} THEN 1 ELSE 0 END)"
    for j in range(1, _NBUCKETS)
)

_HIST_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DOUBLE) AS _v,
         ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(o_totalprice AS DOUBLE)) - 1 AS _rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS _cnt
  FROM orders
  WHERE CAST(o_totalprice AS DOUBLE) IS NOT NULL
    AND NOT isnan(CAST(o_totalprice AS DOUBLE))
),
bnd AS (
  SELECT o_orderpriority,
       {_HIST_FRAGS}
  FROM ranked GROUP BY o_orderpriority
),
assigned AS (
  SELECT o.o_orderpriority,
         CAST(o.o_totalprice AS DOUBLE) AS v,
         1 + {_HIST_BUCKET_SQL} AS bucket
  FROM orders o JOIN bnd b USING (o_orderpriority)
)
SELECT o_orderpriority, CAST(bucket AS INT) AS bucket,
       COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
FROM assigned
GROUP BY o_orderpriority, bucket
ORDER BY o_orderpriority, bucket
"""


@register("order_price_equidepth_histogram", oracle=_HIST_ORACLE)
def order_price_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order value per priority —
    the statistic a cost-based optimizer keeps for selectivity
    estimation, built from the exact-percentile machinery: 7 interior
    boundaries per group from ONE ranked shuffle, broadcast back onto
    the rows, bucket = 1 + Σ[v > qⱼ] (ties land in the lower bucket on
    both engines). Per-bucket counts plus observed [lo, hi] — the
    payload a planner needs."""
    o = table(spark, sf_dir, "orders")
    bnd = exact_group_percentiles(o, ["o_orderpriority"], "o_totalprice", _HIST_QS)
    v = F.col("o_totalprice").cast("double")
    bucket = F.lit(1)
    for j in range(1, _NBUCKETS):
        bucket = bucket + F.when(v > F.col(f"q{j}"), 1).otherwise(0)
    return (
        o.join(F.broadcast(bnd), "o_orderpriority")
        .select("o_orderpriority", v.alias("v"), bucket.cast("int").alias("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("o_orderpriority", "bucket")
    )


# --------------------------------------------------------------------------
# Welch two-sample t-test (A/B-test shape)
# --------------------------------------------------------------------------

from bbt_etl_dw_spark.operators.stats import (  # noqa: E402
    sql_welch_t_test,
    welch_t_test,
)

_TTEST_ORACLE = f"""
SELECT{sql_welch_t_test("event_type", "value", "purchase", "click")}
FROM events
WHERE event_type IN ('purchase', 'click')
"""


@register("purchase_click_value_ttest", oracle=_TTEST_ORACLE)
def purchase_click_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test shape: Welch's unequal-variance t between purchase and
    click event values — ONE aggregation pass over six conditional
    sufficient statistics (operators/stats.welch_t_test), nothing but
    those six numbers crossing the wire; t and Welch–Satterthwaite dof
    in a fixed IEEE sequence the oracle replays bit-exactly."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    return welch_t_test(ev, "event_type", "value", "purchase", "click")


# --------------------------------------------------------------------------
# CUSUM changepoint detection over a daily revenue series
# --------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

from bbt_etl_dw_spark.functions.numeric import sql_davg  # noqa: E402

_DAY_US = 24 * 3600 * 1000000

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name AS nation,
         epoch_us(o.o_orderdate) // {_DAY_US} AS day,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY nation, day
),
mu AS (
  SELECT nation, {sql_davg('revenue', 'mu')} FROM daily GROUP BY nation
),
walk AS (
  SELECT d.nation, d.day, m.mu,
         CAST(ROW_NUMBER() OVER w AS DOUBLE) AS t,
         CAST(CAST(SUM(TRY_CAST(CAST(d.revenue AS VARCHAR) AS DECIMAL(38,18))) OVER w
              AS VARCHAR) AS DOUBLE) AS cum
  FROM daily d JOIN mu m USING (nation)
  WINDOW w AS (PARTITION BY d.nation ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT nation, day, ABS(cum - t * mu) AS cusum,
         COUNT(*) OVER (PARTITION BY nation) AS n_days
  FROM walk
)
SELECT nation, day AS changepoint_day, cusum AS cusum_peak,
       CAST(n_days AS BIGINT) AS n_days
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY nation ORDER BY cusum DESC, day) = 1
ORDER BY nation
"""


@register("nation_revenue_changepoint", oracle=_CUSUM_ORACLE)
def nation_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per supplier nation over the 1997
    daily revenue series: S_t = |Σ_{i≤t}(x_i) − t·x̄| peaks at the most
    likely mean-shift point. Entirely window-expressible (the
    non-clamped CUSUM statistic is a prefix sum minus a ramp — no
    recursion): one fact shuffle to daily grain, one keyed window for
    the exact-decimal cumulative sum, argmax by (statistic, day). Day
    keys are epoch-day integers (timezone-immune)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    daily = (
        li.join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr(f"unix_micros(o_orderdate) div {_DAY_US}").alias("day"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    from bbt_etl_dw_spark.functions.numeric import davg

    # (nation, day)-grain rollup feeds the per-nation mean AND the CUSUM
    # walk — materialized, the fact joins run once, not twice (r14 audit)
    daily = materialize(daily)
    mu = daily.groupBy("nation").agg(davg("revenue", "mu"))
    w = (
        Window.partitionBy("nation")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        F.sum(F.col("revenue").try_cast("decimal(38,18)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    walk = (
        daily.join(F.broadcast(mu), "nation")
        .select(
            "nation",
            "day",
            (cum - F.row_number().over(w).cast("double") * F.col("mu")).alias("_s"),
        )
        .withColumn("cusum", F.abs(F.col("_s")))
        .withColumn(
            "n_days", F.count(F.lit(1)).over(Window.partitionBy("nation"))
        )
    )
    wpick = Window.partitionBy("nation").orderBy(F.col("cusum").desc(), "day")
    return (
        walk.withColumn("_rk", F.row_number().over(wpick))
        .filter(F.col("_rk") == 1)
        .select(
            "nation",
            F.col("day").alias("changepoint_day"),
            F.col("cusum").alias("cusum_peak"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (quantile-boundary scoring)
# --------------------------------------------------------------------------

_RFM_PCTS = {"b20": 0.2, "b40": 0.4, "b60": 0.6, "b80": 0.8}

_DAY_IDX_SQL = "(epoch_us(o_orderdate) // 86400000000)"


def _rfm_bnd_ctes(metric_sql: str, prefix: str) -> str:
    """Ranked CTE + 1-row boundary CTE for one RFM metric over the
    per-customer aggregate (the sql_percentile_exprs contract)."""
    pct = ",\n         ".join(sql_percentile_exprs(_RFM_PCTS))
    return f"""
{prefix}_rank AS (
  SELECT CAST({metric_sql} AS DOUBLE) AS _v,
         ROW_NUMBER() OVER (ORDER BY CAST({metric_sql} AS DOUBLE)) - 1 AS _rn,
         COUNT(*) OVER () AS _cnt
  FROM per_cust
  WHERE CAST({metric_sql} AS DOUBLE) IS NOT NULL
    AND NOT isnan(CAST({metric_sql} AS DOUBLE))
),
{prefix}_bnd AS (
  SELECT {pct}
  FROM {prefix}_rank
)"""


def _rfm_score_sql(metric_sql: str, bnd: str) -> str:
    v = f"CAST({metric_sql} AS DOUBLE)"
    terms = " + ".join(
        f"(CASE WHEN {v} > {bnd}.{b} THEN 1 ELSE 0 END)" for b in _RFM_PCTS
    )
    return f"(1 + {terms})"


_RFM_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX({_DAY_IDX_SQL}) AS last_day,
         COUNT(*) AS frequency,
         {sql_dsum('o_totalprice', 'monetary')}
  FROM orders GROUP BY o_custkey
),{_rfm_bnd_ctes('last_day', 'r')},{_rfm_bnd_ctes('frequency', 'f')},{_rfm_bnd_ctes('monetary', 'm')},
scored AS (
  SELECT c.o_custkey, c.monetary,
         {_rfm_score_sql('c.last_day', 'r')} AS r_score,
         {_rfm_score_sql('c.frequency', 'f')} AS f_score,
         {_rfm_score_sql('c.monetary', 'm')} AS m_score
  FROM per_cust c CROSS JOIN r_bnd r CROSS JOIN f_bnd f CROSS JOIN m_bnd m
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       {sql_dsum('monetary', 'segment_monetary')},
       MIN(o_custkey) AS min_custkey
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@register("customer_rfm_segments", oracle=_RFM_ORACLE, bench=True)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per-customer
    order aggregates scored 1-5 against their own quintile boundaries,
    rolled up to segment counts. The fact reduces to the per-customer
    table in ONE shuffle; each metric's boundaries come from ONE ranked
    pass over that table (exact percentile_cont — at crawl scale the
    drop-in is the mergeable quantile sketch, same contract as
    order_quantile_sketch_check) and re-attach as 1-row broadcasts, so
    scoring is a map stage — no per-row rank window over customers.
    Recency is an epoch-day index (unix_micros div), immune to session
    timezones; monetary sums are exact-decimal."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("unix_micros(o_orderdate) div 86400000000")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice"), "monetary"),
    )
    # per_cust feeds FOUR subtrees (three boundary frames + the scored
    # pass) and exchange reuse does not fire across them (r14 plan audit:
    # the before-plan scanned and aggregated `orders` four times). One
    # materialization of the customer-grain rollup makes the fact
    # contribute exactly one scan + one shuffle; the three rank windows
    # then sort the skinny materialized frame, not the fact.
    per_cust = materialize(per_cust)

    def bounds(metric: str, prefix: str) -> DataFrame:
        b = exact_group_percentiles(
            per_cust.withColumn("_g", F.lit(1)), ["_g"], metric, _RFM_PCTS
        ).drop("_g")
        return b.select(
            *[F.col(k).alias(f"{prefix}_{k}") for k in _RFM_PCTS]
        )

    def score(metric: str, prefix: str):
        v = F.col(metric).cast("double")
        s = F.lit(1)
        for k in _RFM_PCTS:
            s = s + F.when(v > F.col(f"{prefix}_{k}"), 1).otherwise(0)
        return s

    scored = (
        per_cust.crossJoin(F.broadcast(bounds("last_day", "r")))
        .crossJoin(F.broadcast(bounds("frequency", "f")))
        .crossJoin(F.broadcast(bounds("monetary", "m")))
        .select(
            "o_custkey",
            "monetary",
            score("last_day", "r").alias("r_score"),
            score("frequency", "f").alias("f_score"),
            score("monetary", "m").alias("m_score"),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("monetary"), "segment_monetary"),
            F.min("o_custkey").alias("min_custkey"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Triangle counting / clustering coefficients on the nation trade graph
# --------------------------------------------------------------------------

_TRADE_EDGE_SQL = """
SELECT gs.supp_nation AS src, gc.cust_nation AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN (SELECT s.s_suppkey, n.n_name AS supp_nation
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey) gs
    ON l.l_suppkey = gs.s_suppkey
  JOIN (SELECT c.c_custkey, n.n_name AS cust_nation
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) gc
    ON o.o_custkey = gc.c_custkey
"""

_TRIANGLES_ORACLE = f"""
WITH {sql_triangle_ctes(_TRADE_EDGE_SQL)}
SELECT vertex AS nation, degree, n_triangles, clustering
FROM tri_stats
ORDER BY nation
"""


@register("nation_trade_triangles", oracle=_TRIANGLES_ORACLE)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle count and local clustering coefficient over
    the supplier-nation ⋈ customer-nation trade graph — the third graph
    operator (after pagerank and dedup-cluster label propagation), and
    the non-iterative one. The fact reduces to a distinct nation-pair
    edge list first (one shuffle); triangle enumeration is the
    DEGREE-ORDERED wedge join (operators/graphstats.py) whose candidate
    count is O(|E|^1.5) regardless of hubs — the formulation that holds
    on a billion-edge co-occurrence graph, exercised here on the
    dim-scale trade graph where an exact SQL replay exists."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    geo_s = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("src")
        )
    )
    geo_c = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("dst")
        )
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(geo_s, li.l_suppkey == geo_s.s_suppkey)
        .join(geo_c, o.o_custkey == geo_c.c_custkey)
        .select("src", "dst")
    )
    return (
        triangle_stats(edges)
        .select(
            F.col("vertex").alias("nation"), "degree", "n_triangles", "clustering"
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U: returned vs delivered quantity distributions
# --------------------------------------------------------------------------

_MWU_ORACLE = f"""
WITH {sql_mann_whitney_ctes(
    source_sql="SELECT l_returnflag, l_quantity FROM lineitem",
    group_sql="l_returnflag",
    value_sql="l_quantity",
    group_a="R",
    group_b="N",
)}
SELECT n_a, n_b, u_a, u_b, z_stat FROM mwu
"""


@register("lineitem_quantity_mannwhitney", oracle=_MWU_ORACLE)
def lineitem_quantity_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do returned lineitems (R) ship
    different quantities than delivered ones (N)? The nonparametric
    partner of purchase_click_value_ttest, on a column where ties are
    the NORM (50 integral quantity values), so the midrank + tie
    correction path is non-trivially exercised. The fact collapses to
    its value histogram in one hash-agg; ranks come from a window over
    DISTINCT VALUES only — a billion-row sample never global-sorts
    (operators/stats.mann_whitney_u), and the doubled-rank sums ride
    DECIMAL(38,0) so no n² overflow exists at any scale."""
    li = table(spark, sf_dir, "lineitem")
    return mann_whitney_u(li, "l_returnflag", "l_quantity", "R", "N")


# --------------------------------------------------------------------------
# Item-to-item cosine neighbors (collaborative filtering primitive)
# --------------------------------------------------------------------------

_NEIGHBORS_K = 3
_NEIGHBORS_MIN_PAIR = 2

_NEIGHBORS_ORACLE = f"""
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS pair_n
  FROM bi a JOIN bi b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY a.i, b2.i
  HAVING COUNT(*) >= {_NEIGHBORS_MIN_PAIR}
),
freq AS (SELECT i, COUNT(*) AS n FROM bi GROUP BY i),
both_dirs AS (
  SELECT p.item_a AS item, p.item_b AS neighbor, p.pair_n,
         fa.n AS n_self, fb.n AS n_other
  FROM pairs p JOIN freq fa ON p.item_a = fa.i JOIN freq fb ON p.item_b = fb.i
  UNION ALL
  SELECT p.item_b, p.item_a, p.pair_n, fb.n, fa.n
  FROM pairs p JOIN freq fa ON p.item_a = fa.i JOIN freq fb ON p.item_b = fb.i
),
scored AS (
  SELECT item, neighbor, pair_n,
         CAST(pair_n AS DOUBLE)
           / sqrt(CAST(n_self AS DOUBLE) * CAST(n_other AS DOUBLE)) AS cos_sim
  FROM both_dirs
)
SELECT item, neighbor, pair_n, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY item ORDER BY cos_sim DESC, neighbor) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {_NEIGHBORS_K}
ORDER BY item, rank
"""


@register("part_basket_neighbors", oracle=_NEIGHBORS_ORACLE, bench=True)
def part_basket_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 "bought together" neighbors per part by binary-basket
    cosine — the item-item collaborative-filtering primitive layered on
    the co-occurrence operator (one basket-keyed self-join bounded by
    order width; operators/basket.item_cosine_topk). The symmetrize step
    is a union, not a second join; the rank window sees only surviving
    pairs. sqrt is correctly rounded by IEEE-754 decree, so cosine
    scores carry a bit-exact oracle — the reason this family scores with
    cosine and the log-family scores stay pytest-only."""
    li = table(spark, sf_dir, "lineitem")
    return item_cosine_topk(
        li, "l_orderkey", "l_partkey", k=_NEIGHBORS_K,
        min_pair_count=_NEIGHBORS_MIN_PAIR,
    ).orderBy("item", "rank")


# --------------------------------------------------------------------------
# Time-decay weighted customer revenue (recency-scored LTV shape)
# --------------------------------------------------------------------------

_DECAY_HALF_LIFE_DAYS = 180

_DECAY_ORACLE = f"""
WITH days AS (
  SELECT o_custkey, o_totalprice,
         (epoch_us(o_orderdate) // 86400000000) AS day
  FROM orders
),
ref AS (SELECT MAX(day) AS ref_day FROM days),
weighted AS (
  SELECT d.o_custkey,
         d.o_totalprice,
         CAST((r.ref_day - d.day) // {_DECAY_HALF_LIFE_DAYS} AS BIGINT) AS k
  FROM days d CROSS JOIN ref r
)
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'raw_revenue')},
       {sql_dsum(
           f"(CASE WHEN k >= 63 THEN CAST(0.0 AS DOUBLE) "
           f"ELSE CAST(o_totalprice AS DOUBLE) "
           f"/ CAST((CAST(1 AS BIGINT) << k) AS DOUBLE) END)",
           'decayed_revenue',
       )}
FROM weighted
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("customer_decayed_revenue", oracle=_DECAY_ORACLE)
def customer_decayed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed customer revenue: each order's value halves every
    180 days of age relative to the newest order — the exponential-decay
    LTV score, computed WITHOUT pow/exp (libm, not oracle-able): the
    half-life decay 2^-k for integral k is an exact bit-shift
    (1<<k, capped at 63 where the weight underflows to an exact 0), and
    the single weight division + product are correctly-rounded IEEE ops
    feeding an exact-decimal sum. The reference day attaches as a 1-row
    broadcast scalar; one customer-keyed shuffle; epoch-day integer
    arithmetic throughout."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("unix_micros(o_orderdate) div 86400000000")
    days = o.select("o_custkey", "o_totalprice", day.alias("day"))
    ref = days.agg(F.max("day").alias("ref_day"))
    k = F.expr(f"(ref_day - day) div {_DECAY_HALF_LIFE_DAYS}").cast("long")
    weight_div = F.col("o_totalprice").cast("double") / F.expr(
        "cast(shiftleft(cast(1 as bigint), cast(k as int)) as double)"
    )
    decayed = F.when(F.col("k") >= 63, F.lit(0.0)).otherwise(weight_div)
    return (
        days.crossJoin(F.broadcast(ref))
        .withColumn("k", k)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "raw_revenue"),
            dsum(decayed, "decayed_revenue"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Linear gap-fill of per-nation daily revenue (densified 1995 series)
# --------------------------------------------------------------------------

# epoch days for 1995-01-01 .. 1995-12-31 (integer day arithmetic only —
# no session-timezone exposure on either engine)
_GAPFILL_DAY_LO = 9131
_GAPFILL_DAY_HI = 9495

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name,
         (epoch_us(o.o_orderdate) // 86400000000) AS day,
         {sql_dsum('o.o_totalprice', 'rev')}
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE (epoch_us(o.o_orderdate) // 86400000000)
        BETWEEN {_GAPFILL_DAY_LO} AND {_GAPFILL_DAY_HI}
  GROUP BY n.n_name, day
),
bounds AS (
  SELECT n_name, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY n_name
),
spine AS (
  SELECT n_name, CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS day
  FROM bounds
),
j AS (
  SELECT s.n_name, s.day, d.rev
  FROM spine s LEFT JOIN daily d ON s.n_name = d.n_name AND s.day = d.day
),
f AS (
  SELECT n_name, day, rev,
         last_value(rev IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
           OVER w_prev AS pb,
         first_value(rev IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
           OVER w_next AS nb
  FROM j
  WINDOW
    w_prev AS (PARTITION BY n_name ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY n_name ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT n_name, day,
       CASE WHEN rev IS NOT NULL THEN rev
            ELSE pv + (nv - pv)
                 * (CAST(day - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
       END AS filled,
       rev IS NULL AS interpolated
FROM f
ORDER BY n_name, day
"""


@register("nation_revenue_gapfill", oracle=_GAPFILL_ORACLE, bench=True)
def nation_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified per-nation daily revenue for 1995: every nation's
    series covers every day in its own observed [min, max] span, with
    missing days LINEARLY INTERPOLATED between the nearest observed
    neighbours (``operators/timeseries.gap_fill_linear``) — the step a
    forecasting pipeline runs before any model that assumes a regular
    grid. The fact reduces FIRST (one shuffle to the (nation, day)
    rollup — the frame every later step touches is dim x days, not the
    fact); the spine is per-key ``sequence``+``explode`` (never a global
    calendar cross join); both fill windows share ONE hash partitioning
    on the nation key. Observed revenues pass through bit-unchanged;
    interpolation is a fixed IEEE sequence on exact-decimal sums."""
    from bbt_etl_dw_spark.operators.timeseries import gap_fill_linear

    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    ).filter(F.col("day").between(_GAPFILL_DAY_LO, _GAPFILL_DAY_HI))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "day")
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    return gap_fill_linear(daily, ["n_name"], "day", "rev", out_col="filled").orderBy(
        "n_name", "day"
    )


# --------------------------------------------------------------------------
# BFS hop distances over the supplier-customer trade graph
# --------------------------------------------------------------------------

_BFS_MAX_HOPS = 4
_BFS_SOURCE = "s1"

_BFS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS s_node,
                  'c' || CAST(o.o_custkey AS VARCHAR) AS c_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT s_node AS src, c_node AS dst FROM pairs
  UNION
  SELECT c_node AS src, s_node AS dst FROM pairs
),
bfs(node, hops) AS (
  SELECT '{_BFS_SOURCE}' AS node, 0 AS hops
  UNION
  SELECT e.dst, b.hops + 1
  FROM edges e JOIN bfs b ON e.src = b.node
  WHERE b.hops < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS INT) AS hops
FROM bfs GROUP BY node ORDER BY node
"""


@register("trade_graph_bfs_hops", oracle=_BFS_ORACLE)
def trade_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from supplier s1 over the bipartite supplier-customer
    trade graph (an edge per distinct supplier/customer pair that shares
    a lineitem): hops 1 = s1's customers, 2 = co-suppliers, ... out to
    4 — the blast-radius / recommendation-expansion traversal. Frontier
    expansion (``operators/traversal.bfs_hops``): per round ONE
    node-keyed equi-join against the edge list + one anti-join against
    visited, frontier/visited localCheckpoint()ed so lineage stays O(1);
    the loop stops at frontier exhaustion or the hop cap, never scans
    paths the oracle's recursive CTE wouldn't. Unreachable nodes are
    absent, not sentinel-coded."""
    from bbt_etl_dw_spark.operators.traversal import bfs_hops

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s_node"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst")
    ).unionByName(
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
    )
    sources = spark.createDataFrame([(_BFS_SOURCE,)], "node string")
    return bfs_hops(edges, sources, _BFS_MAX_HOPS).orderBy("node")


# --------------------------------------------------------------------------
# Revenue-weighted quantity percentiles per return flag
# --------------------------------------------------------------------------

from bbt_etl_dw_spark.operators.stats import (  # noqa: E402
    sql_weighted_percentile_ctes,
)

_WPCT = {"wq25": 0.25, "wq50": 0.5, "wq75": 0.75}

_WEIGHTED_PCT_ORACLE = f"""
WITH {sql_weighted_percentile_ctes(
    source_sql="SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem",
    group_sql="l_returnflag",
    value_sql="l_quantity",
    weight_sql="l_extendedprice",
)}
SELECT l_returnflag,
       {', '.join(
           f"MIN(CASE WHEN _cumw >= _w * CAST({q!r} AS DOUBLE) THEN _v END)"
           f" AS {name}" for name, q in _WPCT.items()
       )}
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("quantity_weighted_percentiles", oracle=_WEIGHTED_PCT_ORACLE, bench=True)
def quantity_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted quantity quartiles per return flag: 'half the
    REVENUE ships in lines of at most N units' — the mass-weighted
    complement of the row-counted lineitem_quantity_percentiles.
    Lower-bound mass quantile (min value whose cumulative weight crosses
    p*W — always an observed value); ONE shuffle, with the cumulative
    and total weight windows plus the closing aggregate sharing a single
    hash partitioning on the flag. Exact-decimal weight accumulation;
    the threshold compare runs in identically-derived doubles on both
    engines (operators/stats.weighted_group_percentiles)."""
    from bbt_etl_dw_spark.operators.stats import weighted_group_percentiles

    li = table(spark, sf_dir, "lineitem")
    return weighted_group_percentiles(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice", _WPCT
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Trailing 7-day revenue per nation (RANGE window frame over day values)
# --------------------------------------------------------------------------

from bbt_etl_dw_spark.functions.numeric import DEC as _DEC  # noqa: E402
from bbt_etl_dw_spark.functions.numeric import SQL_DEC as _SQL_DEC  # noqa: E402

_TRAIL7_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name,
         (epoch_us(o.o_orderdate) // 86400000000) AS day,
         {sql_dsum('o.o_totalprice', 'rev')}
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE (epoch_us(o.o_orderdate) // 86400000000)
        BETWEEN {_GAPFILL_DAY_LO} AND {_GAPFILL_DAY_HI}
  GROUP BY n.n_name, day
)
SELECT n_name, day, rev,
       CAST(CAST(SUM(TRY_CAST(CAST(rev AS VARCHAR) AS {_SQL_DEC})) OVER (
           PARTITION BY n_name ORDER BY day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
         ) AS VARCHAR) AS DOUBLE) AS rev_7d
FROM daily
ORDER BY n_name, day
"""


@register("nation_trailing_7d_revenue", oracle=_TRAIL7_ORACLE)
def nation_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-CALENDAR-day revenue per nation over the sparse 1995
    daily series — a RANGE window frame over day VALUES, not a rows
    frame: on a sparse series 'last 7 rows' silently spans months, so
    the frame must be value-bounded (the complement of
    nation_revenue_gapfill, which instead densifies the grid). One fact
    shuffle to the (nation, day) rollup, one nation-keyed window; the
    trailing sum re-accumulates exact decimals so the window total is
    order-independent and bit-equal to the oracle's RANGE frame."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    ).filter(F.col("day").between(_GAPFILL_DAY_LO, _GAPFILL_DAY_HI))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "day")
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "n_name",
        "day",
        "rev",
        F.sum(F.col("rev").try_cast(_DEC)).over(w)
        .cast("string").cast("double").alias("rev_7d"),
    ).orderBy("n_name", "day")


# --------------------------------------------------------------------------
# Trailing z-score anomalies on per-nation daily revenue
# --------------------------------------------------------------------------

_ZANOM_MIN_HISTORY = 8
_ZANOM_TOP_K = 20
_ZANOM_WDEC = f"TRY_CAST(CAST(rev AS VARCHAR) AS {_SQL_DEC})"
_ZANOM_FRAME = """PARTITION BY n_name ORDER BY day
           RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING"""

_ZANOM_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name,
         (epoch_us(o.o_orderdate) // 86400000000) AS day,
         {sql_dsum('o.o_totalprice', 'rev')}
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE (epoch_us(o.o_orderdate) // 86400000000)
        BETWEEN {_GAPFILL_DAY_LO} AND {_GAPFILL_DAY_HI}
  GROUP BY n.n_name, day
),
trail AS (
  SELECT n_name, day, rev,
         CAST(COUNT(rev) OVER ({_ZANOM_FRAME}) AS DOUBLE) AS n,
         CAST(CAST(SUM({_ZANOM_WDEC}) OVER ({_ZANOM_FRAME})
              AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(TRY_CAST(CAST(rev * rev AS VARCHAR) AS {_SQL_DEC}))
              OVER ({_ZANOM_FRAME}) AS VARCHAR) AS DOUBLE) AS ss
  FROM daily
),
scored AS (
  SELECT n_name, day, rev,
         s / n AS trail_mean,
         CASE WHEN n >= {_ZANOM_MIN_HISTORY}
                   AND (ss - (s * s) / n) / (n - 1.0) > 0.0
              THEN (rev - s / n) / sqrt((ss - (s * s) / n) / (n - 1.0))
         END AS z
  FROM trail
)
SELECT n_name, day, rev, trail_mean, z
FROM scored WHERE z IS NOT NULL
ORDER BY ABS(z) DESC, n_name, day
LIMIT {_ZANOM_TOP_K}
"""


@register("nation_revenue_zscore_anomalies", oracle=_ZANOM_ORACLE)
def nation_revenue_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trailing z-score anomalies in per-nation daily revenue:
    each day scored against its own nation's trailing 28-CALENDAR-day
    history (RANGE frame ending at 1 PRECEDING, so a spike never
    suppresses itself; minimum 8 observed days of history). This is the
    ops-dashboard 'is today weird?' detector — the global twin of the
    MAD outlier and CUSUM operators, localized per key and per day. ONE
    fact shuffle to the rollup, one nation-keyed window computing
    count/sum/sum-of-squares as exact decimals; mean/variance/z close
    in a fixed IEEE sequence, variance guarded > 0; the cut is a
    per-partition heap on |z| with a full tie-break."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    ).filter(F.col("day").between(_GAPFILL_DAY_LO, _GAPFILL_DAY_HI))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "day")
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    w = Window.partitionBy("n_name").orderBy("day").rangeBetween(-28, -1)
    sd = lambda col: F.sum(col.try_cast(_DEC)).over(w).cast("string").cast("double")
    trail = daily.select(
        "n_name", "day", "rev",
        F.count("rev").over(w).cast("double").alias("n"),
        sd(F.col("rev")).alias("s"),
        sd(F.col("rev") * F.col("rev")).alias("ss"),
    )
    var = (F.col("ss") - (F.col("s") * F.col("s")) / F.col("n")) / (
        F.col("n") - F.lit(1.0)
    )
    z = F.when(
        (F.col("n") >= _ZANOM_MIN_HISTORY) & (var > 0.0),
        (F.col("rev") - F.col("s") / F.col("n")) / F.sqrt(var),
    )
    return (
        trail.select(
            "n_name", "day", "rev",
            (F.col("s") / F.col("n")).alias("trail_mean"),
            z.alias("z"),
        )
        .filter(F.col("z").isNotNull())
        .orderBy(F.abs(F.col("z")).desc(), "n_name", "day")
        .limit(_ZANOM_TOP_K)
    )


# --------------------------------------------------------------------------
# Pareto / ABC analysis of brand revenue
# --------------------------------------------------------------------------

_PARETO_ORACLE = f"""
WITH brands AS (
  SELECT p.p_brand,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
ranked AS (
  SELECT p_brand, revenue,
         CAST(ROW_NUMBER() OVER w AS INT) AS rank,
         CAST(CAST(SUM(TRY_CAST(CAST(revenue AS VARCHAR) AS {_SQL_DEC}))
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS cum_rev,
         CAST(CAST(SUM(TRY_CAST(CAST(revenue AS VARCHAR) AS {_SQL_DEC}))
              OVER () AS VARCHAR) AS DOUBLE) AS total_rev
  FROM brands
  WINDOW w AS (ORDER BY revenue DESC, p_brand)
)
SELECT p_brand, rank, revenue,
       cum_rev / total_rev AS cum_share,
       CASE WHEN cum_rev / total_rev <= 0.8 THEN 'A'
            WHEN cum_rev / total_rev <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY rank
"""


@register("brand_revenue_pareto", oracle=_PARETO_ORACLE)
def brand_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of brands by revenue: descending
    cumulative-share curve with the classic A (first 80% of revenue) /
    B (to 95%) / C split — the assortment-analysis readout. ONE fact
    shuffle to the brand rollup; the ranking/cumulative windows are
    single-partition BY CONSTRUCTION but brand-cardinality (dim-scale,
    same contract as nation_ordered_ids); cumulative and total revenue
    re-accumulate exact decimals so the shares are order-independent
    and bit-equal to the oracle."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brands = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    order = [F.desc("revenue"), F.asc("p_brand")]
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = F.col("revenue").try_cast(_DEC)
    cum = F.sum(dec).over(w_run).cast("string").cast("double")
    tot = F.sum(dec).over(w_all).cast("string").cast("double")
    share = (cum / tot).alias("cum_share")
    return brands.select(
        "p_brand",
        F.row_number().over(Window.orderBy(*order)).cast("int").alias("rank"),
        "revenue",
        share,
        F.when(cum / tot <= 0.8, "A")
        .when(cum / tot <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy("rank")


# --------------------------------------------------------------------------
# Year-over-year price-volume decomposition per brand
# --------------------------------------------------------------------------

_PVM_Y0, _PVM_Y1 = 1995, 1996

_PVM_ORACLE = f"""
WITH by_year AS (
  SELECT p.p_brand,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
         {sql_dsum('l.l_quantity', 'qty')},
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'rev')}
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE EXTRACT(year FROM o.o_orderdate) IN ({_PVM_Y0}, {_PVM_Y1})
  GROUP BY p.p_brand, yr
),
wide AS (
  SELECT p_brand,
         MAX(CASE WHEN yr = {_PVM_Y0} THEN qty END) AS q0,
         MAX(CASE WHEN yr = {_PVM_Y0} THEN rev END) AS r0,
         MAX(CASE WHEN yr = {_PVM_Y1} THEN qty END) AS q1,
         MAX(CASE WHEN yr = {_PVM_Y1} THEN rev END) AS r1
  FROM by_year GROUP BY p_brand
)
SELECT p_brand, q0, r0, q1, r1,
       r1 - r0 AS delta_rev,
       (q1 - q0) * (r0 / q0) AS volume_effect,
       ((r1 / q1) - (r0 / q0)) * q1 AS price_effect
FROM wide
WHERE q0 IS NOT NULL AND q1 IS NOT NULL
ORDER BY p_brand
"""


@register("brand_price_volume_mix", oracle=_PVM_ORACLE)
def brand_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue-bridge decomposition per brand
    (1995 vs 1996): delta revenue split into a VOLUME effect
    ((q1-q0) at old unit price) and a PRICE effect ((p1-p0) at new
    volume) — the two-factor bridge that sums to the delta exactly in
    algebra ((q1-q0)p0 + (p1-p0)q1 = r1-r0) and to IEEE rounding here.
    ONE fact shuffle to the (brand, year) rollup; the pivot is a 2-row
    conditional aggregate per brand; brands missing either year drop
    (no basis for a bridge). Exact-decimal sums; the unit prices and
    effects close in a fixed IEEE sequence."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("o_orderdate").cast("int")
    by_year = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .filter(yr.isin(_PVM_Y0, _PVM_Y1))
        .groupBy("p_brand", yr.alias("yr"))
        .agg(
            dsum(F.col("l_quantity"), "qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "rev"),
        )
    )
    pick = lambda y, c: F.max(F.when(F.col("yr") == y, F.col(c)))
    wide = by_year.groupBy("p_brand").agg(
        pick(_PVM_Y0, "qty").alias("q0"),
        pick(_PVM_Y0, "rev").alias("r0"),
        pick(_PVM_Y1, "qty").alias("q1"),
        pick(_PVM_Y1, "rev").alias("r1"),
    )
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    return (
        wide.filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
        .select(
            "p_brand", "q0", "r0", "q1", "r1",
            (F.col("r1") - F.col("r0")).alias("delta_rev"),
            ((F.col("q1") - F.col("q0")) * p0).alias("volume_effect"),
            ((p1 - p0) * F.col("q1")).alias("price_effect"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov distance: returned vs delivered quantity distributions
# --------------------------------------------------------------------------

_KS_ORACLE = """
WITH vals AS (
  SELECT l_quantity AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_b
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY l_quantity
),
cum AS (
  SELECT v,
         SUM(c_a) OVER w AS cum_a,
         SUM(c_b) OVER w AS cum_b,
         SUM(c_a) OVER () AS n_a,
         SUM(c_b) OVER () AS n_b
  FROM vals
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(n_b) AS BIGINT) AS n_b,
       MAX(ABS(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))) AS ks_d
FROM cum
"""


@register("quantity_ks_distance", oracle=_KS_ORACLE)
def quantity_ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between returned (R) and
    delivered (N) quantity distributions — the DISTRIBUTION leg of the
    drift/test trio on this exact pairing (means: Welch t; ranks:
    Mann-Whitney U). Same scale discipline as MWU: the fact reduces to
    per-DISTINCT-VALUE conditional counts first (one hash aggregate;
    l_quantity has ~50 distinct values), so the empirical-CDF windows
    run over the dim-scale value list, never a global row sort. The
    supremum gap closes as exact-integer cumulative counts divided once
    per side — fixed IEEE ops, bit-equal to the oracle."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    vals = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("bigint").alias("c_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a").cast("double")
        - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
    )
    return cum.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.max(gap).alias("ks_d"),
    )


# --------------------------------------------------------------------------
# Naive-forecast backtest: last-month vs same-month-last-year baselines
# --------------------------------------------------------------------------

_BACKTEST_ORACLE = f"""
WITH monthly AS (
  SELECT (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 12
          + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) - 1) AS m,
         {sql_dsum('o_totalprice', 'rev')}
  FROM orders GROUP BY m
),
joined AS (
  SELECT 'a_last_month' AS method, a.rev AS actual, p.rev AS predicted
  FROM monthly a JOIN monthly p ON p.m = a.m - 1
  UNION ALL
  SELECT 'b_last_year', a.rev, p.rev
  FROM monthly a JOIN monthly p ON p.m = a.m - 12
),
err AS (
  SELECT method, actual, ABS(actual - predicted) AS abs_err FROM joined
)
SELECT method, COUNT(*) AS n_months,
       {sql_dsum('abs_err', 'sum_abs_err')},
       {sql_dsum('actual', 'sum_actual')}
FROM err GROUP BY method ORDER BY method
"""


@register("monthly_forecast_backtest", oracle=_BACKTEST_ORACLE)
def monthly_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the two naive forecasting baselines every real model
    must beat — predict each month's revenue as last month's
    (random-walk) vs the same month last year's (seasonal naive) — with
    total absolute error and actual mass per method (MAE and the
    WMAPE numerator/denominator; the division is the reader's one
    downstream op, kept unreduced so methods with different month
    counts compare honestly). ONE fact shuffle to the ~80-row monthly
    rollup; each baseline is an equi self-join on the integer month
    index (year*12+month — no date arithmetic, no tz exposure);
    exact-decimal sums throughout."""
    o = table(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
        - 1
    )
    # ~80-row monthly rollup feeds the actuals and both baselines —
    # materialized, the orders aggregation runs once, not 3x (r14 audit)
    monthly = materialize(
        o.groupBy(m.alias("m")).agg(dsum(F.col("o_totalprice"), "rev"))
    )
    a = monthly.select(F.col("m").alias("am"), F.col("rev").alias("actual"))

    def baseline(name: str, lag: int) -> DataFrame:
        p = monthly.select((F.col("m") + lag).alias("am"),
                           F.col("rev").alias("predicted"))
        return a.join(p, "am").select(
            F.lit(name).alias("method"),
            "actual",
            F.abs(F.col("actual") - F.col("predicted")).alias("abs_err"),
        )

    err = baseline("a_last_month", 1).unionByName(baseline("b_last_year", 12))
    return (
        err.groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            dsum(F.col("abs_err"), "sum_abs_err"),
            dsum(F.col("actual"), "sum_actual"),
        )
        .orderBy("method")
    )


# --------------------------------------------------------------------------
# Daily open-order backlog (sweep-line concurrent-interval counting)
# --------------------------------------------------------------------------

_BACKLOG_ORACLE = f"""
WITH spans AS (
  SELECT o.o_orderkey,
         (epoch_us(o.o_orderdate) // 86400000000) AS start_day,
         MAX(epoch_us(l.l_shipdate) // 86400000000) AS close_day
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, start_day
),
deltas AS (
  SELECT start_day AS day, 1 AS delta, 1 AS opened, 0 AS closed FROM spans
  UNION ALL
  SELECT close_day + 1, -1, 0, 1 FROM spans
),
daily AS (
  SELECT day,
         CAST(SUM(delta) AS BIGINT) AS net,
         CAST(SUM(opened) AS BIGINT) AS n_opened,
         CAST(SUM(closed) AS BIGINT) AS n_closed
  FROM deltas GROUP BY day
),
run AS (
  SELECT day, n_opened, n_closed,
         CAST(SUM(net) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_orders
  FROM daily
)
SELECT day, n_opened, n_closed, open_orders
FROM run
WHERE day BETWEEN {_GAPFILL_DAY_LO} AND {_GAPFILL_DAY_HI}
ORDER BY day
"""


@register("orders_open_backlog_daily", oracle=_BACKLOG_ORACLE)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog during 1995: how many orders are placed
    but not yet fully shipped on each day — concurrent-interval counting
    via the sweep line (+1 at order day, -1 the day after the LAST line
    ships), which never joins intervals against days: the fact reduces
    to per-order spans (one orderkey shuffle), spans become +/-1 deltas,
    and one dim-scale running sum over the day rollup yields the
    concurrency. The 1995 slice filters AFTER the running sum (the
    backlog on Jan 1 carries history); closing on n_closed keys to the
    day the order STOPS being open. Orders with no lineitems have no
    ship date and are excluded (never-fulfilled is an anomaly row, not
    a backlog fact — see order_total_reconciliation's orphan bucket)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("start_day"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("unix_micros(l_shipdate) div 86400000000").alias("ship_day"),
    )
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "start_day")
        .agg(F.max("ship_day").alias("close_day"))
    )
    # order-grain span frame feeds both sweep-line delta branches —
    # materialized, the orders⋈lineitem agg runs once (r14 plan audit)
    spans = materialize(spans)
    deltas = spans.select(
        F.col("start_day").alias("day"),
        F.lit(1).alias("delta"), F.lit(1).alias("opened"), F.lit(0).alias("closed"),
    ).unionByName(
        spans.select(
            (F.col("close_day") + 1).alias("day"),
            F.lit(-1).alias("delta"), F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net"),
        F.sum("opened").cast("bigint").alias("n_opened"),
        F.sum("closed").cast("bigint").alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day", "n_opened", "n_closed",
            F.sum("net").over(w).cast("bigint").alias("open_orders"),
        )
        .filter(F.col("day").between(_GAPFILL_DAY_LO, _GAPFILL_DAY_HI))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Shipping lead-time percentiles per order priority (unit-weight mass path)
# --------------------------------------------------------------------------

_LEADTIME_PCT = {"lt_p50": 0.5, "lt_p90": 0.9, "lt_p99": 0.99}

_LEADTIME_SRC = """SELECT o.o_orderpriority,
       (epoch_us(l.l_shipdate) // 86400000000)
         - (epoch_us(o.o_orderdate) // 86400000000) AS gap_days,
       1 AS unit
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"""

_LEADTIME_ORACLE = f"""
WITH {sql_weighted_percentile_ctes(
    source_sql=_LEADTIME_SRC,
    group_sql="o_orderpriority",
    value_sql="gap_days",
    weight_sql="unit",
)}
SELECT o_orderpriority,
       {', '.join(
           f"MIN(CASE WHEN _cumw >= _w * CAST({q!r} AS DOUBLE) THEN _v END)"
           f" AS {name}" for name, q in _LEADTIME_PCT.items()
       )}
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("leadtime_percentiles_by_priority", oracle=_LEADTIME_ORACLE)
def leadtime_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping lead time (order date -> line ship date, whole days)
    p50/p90/p99 per order priority — the SLA readout. Five group keys
    over a fact-sized input is EXACTLY the shape the value-binned mass
    path exists for (the naive per-row rank window funnels the fact
    through 5 tasks — see weighted_group_percentiles' scale note):
    with unit weights the mass quantile is the classic lower-bound
    percentile, the fact reduces map-side to priority x distinct-gap
    cells (~hundreds), and the windows touch only that rollup.
    Epoch-day integer arithmetic; exact-decimal unit-weight sums."""
    from bbt_etl_dw_spark.operators.stats import weighted_group_percentiles

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("unix_micros(l_shipdate) div 86400000000").alias("ship_day"),
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("order_day"),
    )
    gaps = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        (F.col("ship_day") - F.col("order_day")).alias("gap_days"),
        F.lit(1).alias("unit"),
    )
    return weighted_group_percentiles(
        gaps, ["o_orderpriority"], "gap_days", "unit", _LEADTIME_PCT
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Return-rate leaderboard with Wilson lower bounds
# --------------------------------------------------------------------------

_WILSON_Z = 1.96  # identical literal both engines -> identical double

_WILSON_ORACLE = f"""
WITH per_brand AS (
  SELECT p.p_brand,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
scored AS (
  SELECT p_brand, n_lines, n_returned,
         CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS phat,
         CAST({_WILSON_Z!r} AS DOUBLE) AS z,
         CAST(n_lines AS DOUBLE) AS n
  FROM per_brand
)
SELECT p_brand, n_lines, n_returned, phat,
       (phat + (z * z) / (2.0 * n)
        - z * sqrt(phat * (1.0 - phat) / n
                   + (z * z) / (4.0 * n * n)))
         / (1.0 + (z * z) / n) AS wilson_lower
FROM scored
ORDER BY wilson_lower DESC, p_brand
"""


@register("brand_return_rate_wilson", oracle=_WILSON_ORACLE)
def brand_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate leaderboard per brand ranked by the WILSON LOWER
    BOUND, not the raw proportion — the confidence-adjusted ranking that
    stops a 2-of-3 brand outranking a 300-of-1000 one (the standard fix
    for small-sample leaderboards). One fact shuffle to per-brand
    (lines, returns); the bound is a fixed IEEE sequence (sqrt is
    correctly rounded; z = 1.96 parses to the same double from the same
    literal on both engines), so the oracle is bit-exact including the
    ORDER the leaderboard ranks in."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint").alias("n_returned"),
        )
    )
    n = F.col("n_lines").cast("double")
    phat = F.col("n_returned").cast("double") / n
    z = F.lit(float(_WILSON_Z))
    wilson = (
        phat + (z * z) / (F.lit(2.0) * n)
        - z * F.sqrt(phat * (F.lit(1.0) - phat) / n
                     + (z * z) / (F.lit(4.0) * n * n))
    ) / (F.lit(1.0) + (z * z) / n)
    return per_brand.select(
        "p_brand", "n_lines", "n_returned",
        phat.alias("phat"), wilson.alias("wilson_lower"),
    ).orderBy(F.desc("wilson_lower"), "p_brand")


# --------------------------------------------------------------------------
# Gini concentration of orders across customers (value-binned exact ranks)
# --------------------------------------------------------------------------

_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS x FROM orders GROUP BY o_custkey
),
bins AS (
  SELECT x AS v, COUNT(*) AS c FROM per_cust GROUP BY x
),
ranked AS (
  SELECT v, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS k
  FROM bins
),
sums AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(v * c) AS BIGINT) AS sx,
         CAST(SUM(v * (c * k + (c * (c + 1)) // 2)) AS BIGINT) AS srx
  FROM ranked
)
SELECT n AS n_customers, sx AS total_orders,
       (2.0 * CAST(srx AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
FROM sums
"""


@register("customer_order_gini", oracle=_GINI_ORACLE)
def customer_order_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-count concentration across customers —
    the inequality readout behind 'do 20% of customers place 80% of
    orders?' (its share-curve partner is brand_revenue_pareto). The
    naive Gini is an all-pairs |x_i - x_j| sum; the exact rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) needs a GLOBAL sort — so this
    computes it from the VALUE-BINNED form: per distinct order count v
    with multiplicity c and cumulative count k below, the bin's rank
    mass is c·k + c(c+1) div 2 — INTEGER division, so the arithmetic
    stays exact past 2^53 where a float-division detour would round —
    all in BIGINT off a
    ~50-row bin rollup (two map-side-combining aggregates; the one
    window runs over the bins). A single IEEE division closes it."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("x"))
    bins = per_cust.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = bins.select(
        "v", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint").alias("k")
    )
    sums = ranked.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("sx"),
        F.sum(
            F.col("v")
            * (F.col("c") * F.col("k")
               + F.expr("(c * (c + 1)) div 2"))
        ).cast("bigint").alias("srx"),
    )
    return sums.select(
        F.col("n").alias("n_customers"),
        F.col("sx").alias("total_orders"),
        (
            (F.lit(2.0) * F.col("srx").cast("double")
             - (F.col("n") + 1).cast("double") * F.col("sx").cast("double"))
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Nation revenue movers: rank shifts 1995 -> 1996
# --------------------------------------------------------------------------

_MOVERS_ORACLE = f"""
WITH by_year AS (
  SELECT n.n_name,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
         {sql_dsum('o.o_totalprice', 'rev')}
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
  GROUP BY n.n_name, yr
),
wide AS (
  SELECT n_name,
         MAX(CASE WHEN yr = 1995 THEN rev END) AS rev95,
         MAX(CASE WHEN yr = 1996 THEN rev END) AS rev96
  FROM by_year GROUP BY n_name
),
ranked AS (
  SELECT n_name, rev95, rev96,
         CAST(ROW_NUMBER() OVER (ORDER BY rev95 DESC, n_name) AS INT) AS rank95,
         CAST(ROW_NUMBER() OVER (ORDER BY rev96 DESC, n_name) AS INT) AS rank96
  FROM wide WHERE rev95 IS NOT NULL AND rev96 IS NOT NULL
)
SELECT n_name, rev95, rev96, rank95, rank96,
       rank95 - rank96 AS rank_gain
FROM ranked
ORDER BY rank_gain DESC, n_name
"""


@register("nation_revenue_movers", oracle=_MOVERS_ORACLE)
def nation_revenue_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movers report: each nation's revenue rank in 1995 vs 1996 and the
    rank gain — the league-table shift readout behind 'who is winning
    share'. One fact shuffle to the (nation, year) rollup, a 2-column
    conditional pivot, and two DIM-SCALE rank windows (25 rows,
    name-tie-broken); nations missing either year drop (no basis for a
    shift). Exact-decimal revenue; deterministic ordering throughout."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").cast("int").alias("yr")
    ).filter(F.col("yr").isin(1995, 1996))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    by_year = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "yr")
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    wide = by_year.groupBy("n_name").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("rev"))).alias("rev95"),
        F.max(F.when(F.col("yr") == 1996, F.col("rev"))).alias("rev96"),
    ).filter(F.col("rev95").isNotNull() & F.col("rev96").isNotNull())
    r95 = F.row_number().over(Window.orderBy(F.desc("rev95"), "n_name")).cast("int")
    r96 = F.row_number().over(Window.orderBy(F.desc("rev96"), "n_name")).cast("int")
    return (
        wide.select(
            "n_name", "rev95", "rev96",
            r95.alias("rank95"), r96.alias("rank96"),
        )
        .withColumn("rank_gain", F.col("rank95") - F.col("rank96"))
        .orderBy(F.desc("rank_gain"), "n_name")
    )
