"""Star-schema assembly over the synthetic star source tables.

Engine form of the reference's gold stage (``scripts/etl_transform/
etl_gold/map_cols.py``): dimension builders with deterministic surrogate
keys + fact assembly with referential-integrity accounting (the reference
silently drops fact rows through inner joins, map_cols.py:228-265; we
count or preserve them explicitly).

Key choices vs the reference (SURVEY §4):
- surrogate keys are deterministic ``hash_key`` (xxhash64 of the natural
  key) instead of monotonically_increasing_id — shuffle-free, stable under
  any partitioning, no single-partition window anywhere in the fact plan
  (``ordered_key`` remains only in the explicit ``nation_ordered_ids``
  reference-parity query)
- calendar keys are yyyymmdd ints => fact rows join the calendar without
  any shuffle (pure expression), and partition pruning by key range works
- dims are broadcast into the fact join (bounded size by definition)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.enrich import client_value, product_status
from bbt_etl_dw_spark.operators.surrogate import hash_key


def date_key(col) -> F.Column:
    """yyyymmdd surrogate key for calendar joins — pure expression, no join
    needed to resolve a date to its calendar row."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("long")


def dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DimCustomer analog (reference map_cols.py:72-92): geo enrichment via
    broadcast joins (nation/region replace the pycountry UDFs) + ClientValue
    segmentation + deterministic key."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    base = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
    base = base.withColumn("client_value", client_value(F.col("c_acctbal"), 7500.0, 2500.0))
    return hash_key(base, ["c_custkey"], "customer_key")


def dim_part(spark: SparkSession, sf_dir: str, asof: str = "2001-11-04") -> DataFrame:
    """DimProduct analog (reference map_cols.py:116-140): last-sold join +
    status ladder."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    last_sold = li.groupBy("l_partkey").agg(F.max(F.to_date("l_shipdate")).alias("last_sold"))
    base = (
        p.join(last_sold, p.p_partkey == last_sold.l_partkey, "left")
        .drop("l_partkey")
        .withColumn(
            "product_status",
            product_status(F.col("last_sold"), F.to_date(F.lit(asof))),
        )
    )
    return hash_key(base, ["p_partkey"], "part_key")


def dim_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DimStore analog (reference map_cols.py:144-182: suppliers as stores)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    base = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    return hash_key(base, ["s_suppkey"], "supplier_key")


def dim_calendar(spark: SparkSession, start: str = "1995-01-01", end: str = "2001-12-31") -> DataFrame:
    """DimCalendar (reference map_cols.py:199-224) with yyyymmdd keys."""
    cal = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), "
        "interval 1 day)) AS cal_date"
    )
    return cal.select(
        date_key("cal_date").alias("calendar_key"),
        "cal_date",
        (F.weekday("cal_date") + 1).alias("day_of_week"),
        F.month("cal_date").alias("month"),
        F.year("cal_date").alias("year"),
        F.quarter("cal_date").alias("quarter"),
    )


def fact_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FactSales analog (reference map_cols.py:228-282): the fact keeps its
    natural grain (orderkey, linenumber) and resolves every dimension to a
    surrogate key. Dims broadcast; calendar resolves as an expression;
    customer key arrives through orders (one fact-side shuffle on orderkey).
    Left joins + explicit null keys instead of the reference's silent
    inner-join row loss."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cust = F.broadcast(dim_customer(spark, sf_dir).select("c_custkey", "customer_key"))
    # part keys from the BARE part table: deriving them through dim_part
    # dragged the dim's full-lineitem last-sold aggregate into the fact
    # plan — an extra fact scan + shuffle whose output was entirely
    # discarded, and one Catalyst cannot eliminate (review finding).
    # Identical keys AND identical membership: dim_part's enrichment is a
    # LEFT join, so it never gates which parts exist. supplier keys stay
    # on dim_supplier — its nation join is INNER (membership-gating), so
    # a bare-supplier shortcut would hand out keys for suppliers the dim
    # dropped, silently breaking the fact's RI accounting (the follow-up
    # review caught exactly that in the first version of this change);
    # the dim's joins are broadcast-cheap, unlike dim_part's aggregate.
    part = F.broadcast(
        hash_key(
            table(spark, sf_dir, "part").select("p_partkey"),
            ["p_partkey"],
            "part_key",
        )
    )
    supp = F.broadcast(dim_supplier(spark, sf_dir).select("s_suppkey", "supplier_key"))

    orders_keyed = o.join(cust, o.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey",
        "customer_key",
        F.col("c_custkey").alias("customer_id"),
        "o_orderdate",
    )
    return (
        li.join(orders_keyed, li.l_orderkey == orders_keyed.o_orderkey, "left")
        .join(part, li.l_partkey == part.p_partkey, "left")
        .join(supp, li.l_suppkey == supp.s_suppkey, "left")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            # hash surrogate key + the dim-sourced natural id: the id is
            # NULL exactly when the dim row was missing (RI accounting),
            # and lets SQL oracles verify the join topology (xxhash64 is
            # Spark-specific; key==xxhash64(id) is pytest-asserted).
            "customer_key",
            "customer_id",
            "part_key",
            F.col("p_partkey").alias("part_id"),
            "supplier_key",
            F.col("s_suppkey").alias("supplier_id"),
            date_key("l_shipdate").alias("ship_calendar_key"),
            date_key("o_orderdate").alias("order_calendar_key"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            F.col("l_discount").alias("discount"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_amount"),
        )
    )


def integrity_report(fact: DataFrame) -> DataFrame:
    """Referential-integrity accounting: null surrogate keys per dimension
    (what the reference silently drops)."""
    keys = ["customer_key", "part_key", "supplier_key"]
    return fact.select(
        [F.count(F.when(F.col(k).isNull(), 1)).alias(f"null_{k}") for k in keys]
        + [F.count(F.lit(1)).alias("total_rows")]
    )
