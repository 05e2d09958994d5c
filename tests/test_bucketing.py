"""Bucketed-table co-located join: pre-bucketing both sides on the join
key lets the sort-merge join read bucket-aligned files with NO exchange on
either side — the 'co-locate joins via bucketing' scale path. Asserted on
the physical plan, and results checked against the plain join."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    for df, name, key in ((li, "li_bucketed", "l_orderkey"), (o, "o_bucketed", "o_orderkey")):
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    return wh


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    # force SMJ (at real scale neither side broadcasts); bucketing must
    # satisfy the join's distribution with zero exchanges
    li_b = spark.table("li_bucketed").hint("merge")
    o_b = spark.table("o_bucketed").hint("merge")
    joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # co-located: zero shuffles

    # same result as the unbucketed join
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()
    from bbt_etl_dw_spark.functions.numeric import dsum

    # exact (order-independent) sums: plain double sums differ between the
    # two plans' row orders
    got = joined.agg(dsum("l_extendedprice", "s"), F.sum("o_custkey")).first()
    want = plain.agg(dsum("l_extendedprice", "s"), F.sum("o_custkey")).first()
    assert got == want
