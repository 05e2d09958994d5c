"""Gaps-and-islands interval merge (operators/intervals.py): hand cases,
a brute-force hypothesis reference (incl. NESTED intervals, the case a
lag-based implementation splits wrongly), and coverage semantics."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.intervals import (
    interval_coverage,
    merge_intervals,
)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_merge(ivals, gap=0):
    """Python reference: sort, sweep with a running frontier."""
    out = []
    for s, e in sorted(ivals):
        if out and s <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


def test_merge_hand_cases(spark):
    rows = [
        # key 1: [0,5] overlaps [3,8]; [10,12] separate; nested [11,11]
        (1, 0, 5), (1, 3, 8), (1, 10, 12), (1, 11, 11),
        # key 2: touching intervals merge at gap=0
        (2, 0, 1), (2, 1, 2),
        # key 3: null bound dropped
        (3, None, 5), (3, 7, 9),
    ]
    df = spark.createDataFrame(rows, "k int, s int, e int")
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == {(1, 0, 8, 2), (1, 10, 12, 2), (2, 0, 2, 2), (3, 7, 9, 1)}
    # gap=2 bridges key 1's islands
    got2 = {
        (r["k"], r["island_start"], r["island_end"])
        for r in merge_intervals(df, ["k"], "s", "e", gap=2).collect()
    }
    assert (1, 0, 12) in got2


def test_nested_interval_does_not_split_island(spark):
    """The lag-based bug: a short interval nested in a long one must not
    reset the frontier. [0,100], [5,6], [10,11] is ONE island."""
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 5, 6), (1, 10, 11)], "k int, s int, e int"
    )
    got = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(got) == 1 and got[0]["island_start"] == 0 and got[0]["island_end"] == 100


def test_timestamp_gap(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
         (1, "2024-01-01 10:45:00", "2024-01-01 11:00:00")],
        "k int, s string, e string",
    ).select("k", F.col("s").cast("timestamp"), F.col("e").cast("timestamp"))
    apart = merge_intervals(df, ["k"], "s", "e").count()
    merged = merge_intervals(
        df, ["k"], "s", "e", gap=F.expr("INTERVAL 30 MINUTES")
    ).count()
    assert (apart, merged) == (2, 1)


def test_coverage_counts_union_not_sum(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 15), (1, 20, 21)], "k int, s int, e int"
    )
    r = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert (r["covered"], r["n_islands"]) == (16, 2)  # union 15 + 1, not 21


@_SLOW
@given(
    ivals=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)).map(
            lambda t: (t[0], t[0] + t[1])
        ),
        min_size=1,
        max_size=40,
    ),
    gap=st.integers(0, 3),
)
def test_merge_matches_python_reference(spark, ivals, gap):
    df = spark.createDataFrame([(1, s, e) for s, e in ivals], "k int, s int, e int")
    got = {
        (r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df, ["k"], "s", "e", gap=gap).collect()
    }
    assert got == _ref_merge(ivals, gap)
