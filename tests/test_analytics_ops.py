"""Operator-level tests for the advanced-analytics family
(operators/stats.py, basket.py, smooth.py, er.py) — hand-computed
expectations on tiny frames, independent of the DuckDB oracle suite
(tests/test_suite_oracle.py covers the end-to-end queries)."""

import math

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.basket import cooccurrence_pairs
from bbt_etl_dw_spark.operators.er import blocked_fuzzy_lookup
from bbt_etl_dw_spark.operators.smooth import trailing_ewma
from bbt_etl_dw_spark.operators.stats import (
    exact_group_percentiles,
    group_ols_slope,
)


# --- group_ols_slope ------------------------------------------------------


def test_ols_recovers_exact_line(spark):
    # y = 3x + 7 exactly: slope/intercept must come back bit-exact
    rows = [("g", x, 3.0 * x + 7.0) for x in range(2000, 2008)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = group_ols_slope(df, ["g"], "x", "y").collect()[0]
    assert out.n_points == 8
    assert out.slope == 3.0
    assert out.intercept == 7.0


def test_ols_single_point_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 2000, 5.0), ("b", 2000, 1.0), ("b", 2001, 2.0)],
        "g string, x int, y double",
    )
    out = {r.g: r for r in group_ols_slope(df, ["g"], "x", "y").collect()}
    assert out["a"].slope is None  # 0/0 denominator -> NULL, not NaN
    assert out["b"].slope == 1.0


def test_ols_constant_x_multi_point_is_null(spark):
    # two points, same x: denominator n*Sxx - Sx^2 == 0
    df = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 9.0)], "g string, x int, y double"
    )
    out = group_ols_slope(df, ["g"], "x", "y").collect()[0]
    assert out.slope is None


def test_ols_null_and_nan_y_rows_fully_excluded(spark):
    # ADVICE r06: _n counted non-null y but Σx/Σx² summed ALL rows, so a
    # group with NULL y got a wrong non-NULL slope from mismatched
    # sufficient statistics. Pairwise deletion must gate EVERY sum: the
    # fit over {(1,1),(2,2),(3,3)} with extra NULL-y and NaN-y rows must
    # equal the clean fit exactly.
    dirty = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
         ("a", 100, None), ("a", 200, float("nan"))],
        "g string, x int, y double",
    )
    out = group_ols_slope(dirty, ["g"], "x", "y").collect()[0]
    assert out.n_points == 3
    assert out.slope == 1.0
    assert out.intercept == 0.0


def test_ols_product_overflow_rows_fully_excluded(spark):
    # r07 review: y=1e17 fits DECIMAL(38,18) but x*y ~ 2e20 overflows it;
    # the gate must drop such rows from EVERY sum, not just Σxy
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 2024, 1e17)],
        "g string, x int, y double",
    )
    out = group_ols_slope(df, ["g"], "x", "y").collect()[0]
    assert out.n_points == 3 and out.slope == 1.0


def test_pearson_product_overflow_rows_fully_excluded(spark):
    # v=1e10 fits DEC but v*v = 1e20 overflows it: pairwise deletion must
    # drop the row entirely (mismatched sums could fabricate a negative
    # variance -> NaN correlation)
    import math

    from bbt_etl_dw_spark.operators.stats import pearson_corr

    rows = [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0), ("g", 1e10, 1e10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = df.groupBy("g").agg(pearson_corr("x", "y").alias("r")).collect()[0]
    assert out.r is not None and math.isfinite(out.r)
    assert abs(out.r - 1.0) < 1e-12  # the clean rows are exactly linear


def test_benford_zero_in_range_returns_null_shares(spark):
    # r07 review: a column entirely below 1 has zero in-range values —
    # share_obs must be NULL, not an ANSI DIVIDE_BY_ZERO crash
    from bbt_etl_dw_spark.operators.stats import benford_digit_audit

    df = spark.createDataFrame([(0.5,), (0.25,)], "v double")
    rows = benford_digit_audit(df, "v").collect()
    assert all(r.share_obs is None for r in rows if r.digit >= 1)
    oor = [r for r in rows if r.digit == 0]
    assert oor and oor[0].n_obs == 2


# --- exact_group_percentiles ----------------------------------------------


def test_percentiles_interpolation(spark):
    # values 10,20,30,40 -> p50 idx = 1.5 -> 25.0; p25 idx 0.75 -> 17.5
    rows = [("g", v) for v in (40.0, 10.0, 30.0, 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_group_percentiles(
        df, ["g"], "v", {"p25": 0.25, "p50": 0.5, "p100": 1.0}
    ).collect()[0]
    assert out.p50 == 25.0
    assert out.p25 == 17.5
    assert out.p100 == 40.0


def test_percentiles_exclude_nan_values(spark):
    # r07 review: one NaN ranks last in Spark AND DuckDB but shifts every
    # index and poisons interpolation against v_hi=NaN — excluded like
    # NULLs (mann_whitney_u / weighted percentiles already do)
    rows = [("g", v) for v in (40.0, 10.0, float("nan"), 30.0, 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_group_percentiles(
        df, ["g"], "v", {"p50": 0.5, "p100": 1.0}
    ).collect()[0]
    assert out.p50 == 25.0
    assert out.p100 == 40.0


def test_percentiles_exclude_null_values(spark):
    # ADVICE r06: NULLs ranked first (Spark NULLS FIRST) and inflated
    # _cnt, skewing every percentile and diverging from DuckDB's NULLS
    # LAST. NULL rows must be excluded before ranking — same answer as
    # the NULL-free frame.
    rows = [("g", v) for v in (40.0, 10.0, None, 30.0, None, 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_group_percentiles(
        df, ["g"], "v", {"p25": 0.25, "p50": 0.5, "p100": 1.0}
    ).collect()[0]
    assert out.p50 == 25.0
    assert out.p25 == 17.5
    assert out.p100 == 40.0


def test_percentiles_match_builtin(spark):
    # cross-check the sort-based path against Spark's exact percentile()
    import random

    rng = random.Random(42)
    rows = [(f"g{i % 3}", rng.uniform(0, 1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    ours = {
        r.g: r
        for r in exact_group_percentiles(
            df, ["g"], "v", {"p50": 0.5, "p90": 0.9}
        ).collect()
    }
    ref = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.9)").alias("p90"),
        )
        .collect()
    }
    for g in ref:
        assert ours[g].p50 == pytest.approx(ref[g].p50, rel=1e-12)
        assert ours[g].p90 == pytest.approx(ref[g].p90, rel=1e-12)


# --- cooccurrence_pairs ---------------------------------------------------


def test_basket_counts_support_lift(spark):
    # baskets: {A,B,C}, {A,B}, {B,C}, {A}; pair AB appears twice
    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "B"), (3, "C"),
        (4, "A"),
    ]
    df = spark.createDataFrame(rows, "b int, i string")
    out = {
        (r.item_a, r.item_b): r
        for r in cooccurrence_pairs(df, "b", "i", min_pair_count=1).collect()
    }
    ab = out[("A", "B")]
    assert ab.pair_n == 2 and ab.n_a == 3 and ab.n_b == 3
    assert ab.support == 2.0 / 4.0
    assert ab.lift == (2 * 4) / (3 * 3)
    assert out[("B", "C")].pair_n == 2
    assert out[("A", "C")].pair_n == 1


def test_basket_dedups_multiline_items(spark):
    # same item on two lines of one basket must count once
    rows = [(1, "A"), (1, "A"), (1, "B")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = cooccurrence_pairs(df, "b", "i", min_pair_count=1).collect()
    assert len(out) == 1
    assert out[0].pair_n == 1 and out[0].n_a == 1


def test_basket_hot_basket_guard_raises(spark):
    """A pathological hot basket (one key holding more distinct items than
    max_basket_size) must fail LOUDLY instead of fanning out C(k,2) pairs
    from a single task (r07 review: the one scale-killer the plan lint
    cannot see, because the pair join is a legitimate equi-join)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    rows = [(0, f"item_{i}") for i in range(50)] + [(1, "A"), (1, "B")]
    df = spark.createDataFrame(rows, "b int, i string")
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="max_basket_size"):
        cooccurrence_pairs(df, "b", "i", min_pair_count=1, max_basket_size=10).collect()


def test_basket_guard_cap_and_none_pass(spark):
    # at or under the cap, and with the guard disabled, results are
    # identical to the unguarded path
    rows = [(0, f"item_{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "b int, i string")
    capped = cooccurrence_pairs(df, "b", "i", min_pair_count=1, max_basket_size=12)
    off = cooccurrence_pairs(df, "b", "i", min_pair_count=1, max_basket_size=None)
    assert capped.count() == off.count() == 12 * 11 // 2


# --- trailing_ewma --------------------------------------------------------


def _py_ewma(xs, alpha=0.5, k=32):
    acc = None
    out = []
    hist = []
    for x in xs:
        hist.append(x)
        acc = None
        for v in hist[-k:]:
            acc = v if acc is None else alpha * v + (1 - alpha) * acc
        out.append(acc)
    return out


def test_ewma_matches_reference_fold(spark):
    xs = [10.0, 20.0, 5.0, 80.0, 40.0]
    rows = [("u", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "u string, t int, v double")
    out = (
        trailing_ewma(df, ["u"], ["t"], "v", alpha=0.5, k=32)
        .orderBy("t")
        .collect()
    )
    expect = _py_ewma(xs)
    for r, e in zip(out, expect):
        assert r.ewma == e  # bit-exact: alpha=0.5 folds are exact scalings


def test_ewma_window_truncates_at_k(spark):
    # with k=2 only the last 2 values matter
    xs = [100.0, 1.0, 3.0]
    df = spark.createDataFrame(
        [("u", t, x) for t, x in enumerate(xs)], "u string, t int, v double"
    )
    out = trailing_ewma(df, ["u"], ["t"], "v", alpha=0.5, k=2).orderBy("t").collect()
    assert out[-1].ewma == 0.5 * 3.0 + 0.5 * 1.0  # 100.0 fell out of frame


def test_ewma_partitions_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 50.0), ("a", 2, 20.0)],
        "u string, t int, v double",
    )
    out = {
        (r.u, r.t): r.ewma
        for r in trailing_ewma(df, ["u"], ["t"], "v").collect()
    }
    assert out[("a", 2)] == 15.0
    assert out[("b", 1)] == 50.0


# --- blocked_fuzzy_lookup -------------------------------------------------


@pytest.fixture()
def canon(spark):
    return spark.createDataFrame(
        [(1, "ALPHA"), (2, "ALPHAS"), (3, "BRAVO"), (4, "CHARLIE")],
        "k int, name string",
    )


def test_fuzzy_exact_and_typo(spark, canon):
    probes = spark.createDataFrame([("ALPHA",), ("BRAV0",)], "s string")
    out = {
        r.s: r
        for r in blocked_fuzzy_lookup(
            probes, "s", canon, "name", "k", max_dist=2
        ).collect()
    }
    assert out["ALPHA"].k == 1 and out["ALPHA"].match_dist == 0
    assert out["BRAV0"].k == 3 and out["BRAV0"].match_dist == 1


def test_fuzzy_tie_breaks_on_key(spark, canon):
    # ALPHAX is distance 1 from both ALPHA (sub) and ALPHAS (sub):
    # deterministic winner is the lower key
    probes = spark.createDataFrame([("ALPHAX",)], "s string")
    r = blocked_fuzzy_lookup(probes, "s", canon, "name", "k", max_dist=2).collect()[0]
    assert r.k == 1


def test_fuzzy_band_expansion_across_boundary(spark, canon):
    # CHARLIE has len 7 (band 1); CHARLIEXX len 9 (band 2): the +/-1 band
    # expansion must still find it at distance 2
    probes = spark.createDataFrame([("CHARLIEXX",)], "s string")
    r = blocked_fuzzy_lookup(probes, "s", canon, "name", "k", max_dist=2).collect()[0]
    assert r.k == 4 and r.match_dist == 2


def test_fuzzy_unmatched_rows_survive_with_nulls(spark, canon):
    # first-char typo (XLPHA) defeats blocking; ZULU has no candidate
    probes = spark.createDataFrame([("XLPHA",), ("ZULU",)], "s string")
    out = blocked_fuzzy_lookup(probes, "s", canon, "name", "k", max_dist=2).collect()
    assert len(out) == 2
    assert all(r.k is None and r.match_dist is None for r in out)


def test_fuzzy_duplicate_probes_keep_cardinality(spark, canon):
    probes = spark.createDataFrame([("ALPHA",), ("ALPHA",)], "s string")
    out = blocked_fuzzy_lookup(probes, "s", canon, "name", "k", max_dist=2).collect()
    assert len(out) == 2
    assert all(r.k == 1 for r in out)


def test_fuzzy_rejects_max_dist_beyond_band_width(spark, canon):
    # r07 review: the ±1 band expansion cannot guarantee recall once the
    # edit budget can move a length across more than one band boundary —
    # loud raise instead of silent lost matches
    probes = spark.createDataFrame([("ALPHA",)], "s string")
    with pytest.raises(ValueError, match="band_width"):
        blocked_fuzzy_lookup(
            probes, "s", canon, "name", "k", max_dist=5, band_width=4
        )


def test_fuzzy_null_in_unrelated_probe_column_still_matches(spark, canon):
    # ADVICE r06 (medium): the join-back used an all-columns equality,
    # which is null-UNSAFE — a probe row with a NULL in an unrelated
    # column computed its match and then silently failed the join-back,
    # surfacing as unmatched. The surrogate-row-id join-back must keep it.
    probes = spark.createDataFrame(
        [("ALPHA", None), ("BRAV0", "note"), (None, "x")],
        "s string, extra string",
    )
    out = {r.extra: r for r in blocked_fuzzy_lookup(
        probes, "s", canon, "name", "k", max_dist=2
    ).collect()}
    assert len(out) == 3
    assert out[None].k == 1 and out[None].match_dist == 0  # NULL extra matches
    assert out["note"].k == 3 and out["note"].match_dist == 1
    # NULL probe string: no candidates, surfaces unmatched (not dropped)
    assert out["x"].k is None and out["x"].match_dist is None


# --- pearson_corr ---------------------------------------------------------


def test_corr_recovers_signs(spark):
    from bbt_etl_dw_spark.operators.stats import pearson_corr

    rows = []
    for x in range(20):
        rows.append(("pos", float(x), 2.0 * x + 1.0))
        rows.append(("neg", float(x), -3.0 * x + 40.0))
        rows.append(("flat", float(x), 7.0))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r.g: r.c
        for r in df.groupBy("g").agg(pearson_corr("x", "y").alias("c")).collect()
    }
    assert out["pos"] == pytest.approx(1.0, abs=1e-12)
    assert out["neg"] == pytest.approx(-1.0, abs=1e-12)
    assert out["flat"] is None  # zero variance -> NULL, not NaN/error


def test_corr_pairwise_deletion(spark):
    from bbt_etl_dw_spark.operators.stats import pearson_corr

    # the (None, 999) row must drop out of EVERY sum: remaining points
    # are perfectly linear
    rows = [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", None, 999.0), ("g", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = df.groupBy("g").agg(pearson_corr("x", "y").alias("c")).collect()[0]
    assert out.c == pytest.approx(1.0, abs=1e-12)


# --- mad_outlier_summary --------------------------------------------------


def test_mad_hand_computed(spark):
    from bbt_etl_dw_spark.operators.stats import mad_outlier_summary

    # values 1..9 plus a wild 1000: median 5.5, adevs of 1..9 are
    # 0.5..4.5 and 994.5 for the outlier -> MAD = median of
    # [0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5] = 2.5;
    # threshold 3*2.5=7.5 -> only 1000 exceeds it
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outlier_summary(df, ["g"], "v", k=3.0).collect()[0]
    assert out.n_rows == 10
    assert out.median == 5.5
    assert out.mad == 2.5
    assert out.n_outliers == 1


def test_mad_zero_on_majority_constant(spark):
    from bbt_etl_dw_spark.operators.stats import mad_outlier_summary

    # >50% identical values -> MAD 0 -> every deviating row is an
    # outlier (the documented failure mode, surfaced not hidden)
    rows = [("g", 5.0)] * 6 + [("g", 5.1), ("g", 4.9)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outlier_summary(df, ["g"], "v", k=3.0).collect()[0]
    assert out.mad == 0.0
    assert out.n_outliers == 2


# --- pagerank -------------------------------------------------------------


def _py_pagerank(vids, edges, d=0.85, iters=3):
    # reference implementation mirroring the operator's arithmetic order
    n = len(vids)
    out = {}
    for s_, _t, w in edges:
        out[s_] = out.get(s_, 0.0) + w
    p = {v: 1.0 / n for v in vids}
    srcs = set(out)
    for _ in range(iters):
        contrib = {}
        for s_, t, w in edges:
            contrib[t] = contrib.get(t, 0.0) + p[s_] * (w / out[s_])
        dm = sum(p[v] for v in vids if v not in srcs)
        p = {
            v: ((1.0 - d) + d * dm) / n + d * contrib.get(v, 0.0)
            for v in vids
        }
    return p


def test_pagerank_matches_reference_and_sums_to_one(spark):
    from bbt_etl_dw_spark.operators.pagerank import pagerank

    vids = ["a", "b", "c", "d"]
    # d is dangling (no out-edges); weighted edges incl. a self-loop
    edges = [
        ("a", "b", 3.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("c", "a", 1.0),
        ("c", "c", 1.0),
        ("b", "d", 2.0),
    ]
    v = spark.createDataFrame([(x,) for x in vids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.id: r.pagerank for r in pagerank(v, e, iters=3).collect()}
    want = _py_pagerank(vids, edges)
    assert set(got) == set(vids)
    for k in vids:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # the dangling sink still receives rank mass (from b) and keeps it
    # only through the uniform redistribution term
    assert got["d"] > (1.0 - 0.85) / 4


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from bbt_etl_dw_spark.operators.pagerank import pagerank

    # a -> b -> c -> a with equal weights: ranks stay exactly uniform
    v = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    got = [r.pagerank for r in pagerank(v, e, iters=4).collect()]
    assert all(p == pytest.approx(1.0 / 3.0, rel=1e-12) for p in got)


# --- welch_t_test ---------------------------------------------------------


def test_welch_t_hand_computed(spark):
    from bbt_etl_dw_spark.operators.stats import welch_t_test

    a = [1.0, 2.0, 3.0, 4.0]      # mean 2.5, var 5/3
    b = [10.0, 12.0, 14.0]        # mean 12, var 4
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    va, vb = 5.0 / 3.0, 4.0
    se2 = va / 4 + vb / 3
    t = (2.5 - 12.0) / math.sqrt(se2)
    dof = se2 * se2 / ((va / 4) ** 2 / 3 + (vb / 3) ** 2 / 2)
    assert r.n_a == 4 and r.n_b == 3
    assert r.mean_a == 2.5 and r.mean_b == 12.0
    assert r.t_stat == pytest.approx(t, rel=1e-12)
    assert r.dof == pytest.approx(dof, rel=1e-12)


def test_welch_t_degenerate_sides_null(spark):
    from bbt_etl_dw_spark.operators.stats import welch_t_test

    # n_b = 1: variance undefined -> NULL t/dof, means still reported
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"
    )
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert r.t_stat is None and r.dof is None
    assert r.mean_b == 5.0
    # both sides constant: se2 == 0 -> NULL (not a division error)
    df2 = spark.createDataFrame(
        [("a", 3.0), ("a", 3.0), ("b", 7.0), ("b", 7.0)], "g string, v double"
    )
    r2 = welch_t_test(df2, "g", "v", "a", "b").collect()[0]
    assert r2.t_stat is None


# --- time-series diagnostics (operators/timeseries.py) ---------------------


def test_autocorrelation_alternating_series(spark):
    """x = +1,-1,+1,... has mean 0, acf(1) = -1 (up to the n-k/n pair
    truncation: with the textbook constant denominator, r_k =
    (n-k)/n * (-1)^k exactly for this series)."""
    from bbt_etl_dw_spark.operators.timeseries import autocorrelation

    n = 10
    rows = [(t, 1.0 if t % 2 == 0 else -1.0) for t in range(n)]
    df = spark.createDataFrame(rows, "b bigint, x double")
    out = {r.lag: (r.n_pairs, r.acf) for r in
           autocorrelation(df, "b", "x", [1, 2, 3]).collect()}
    assert out[1] == (9, -0.9)
    assert out[2] == (8, 0.8)
    assert out[3] == (7, -0.7)


def test_autocorrelation_skips_gap_pairs(spark):
    """A missing bucket forms pairs only where both ends exist."""
    from bbt_etl_dw_spark.operators.timeseries import autocorrelation

    df = spark.createDataFrame(
        [(0, 1.0), (1, 3.0), (3, 1.0), (4, 3.0)], "b bigint, x double"
    )
    out = {r.lag: r.n_pairs for r in
           autocorrelation(df, "b", "x", [1, 2]).collect()}
    assert out[1] == 2  # (0,1) and (3,4); (1,3)/(3,?) gaps drop out
    assert out[2] == 1  # (1,3)


def test_autocorrelation_lag_hygiene(spark):
    """r07 review: duplicate lags must not double-count pairs (acf(1)
    would read -1.8, outside [-1,1]); a lag beyond the series span still
    returns a row with n_pairs=0 and NULL acf; NaN values are excluded
    from the mean's denominator (davg discipline) so deviations are not
    silently biased."""
    from bbt_etl_dw_spark.operators.timeseries import (
        autocorrelation,
        cross_correlation,
    )

    n = 10
    rows = [(t, 1.0 if t % 2 == 0 else -1.0) for t in range(n)]
    df = spark.createDataFrame(rows, "b bigint, x double")
    out = {r.lag: (r.n_pairs, r.acf) for r in
           autocorrelation(df, "b", "x", [1, 1, 1, 50]).collect()}
    assert out[1] == (9, -0.9)          # dedup: not tripled
    assert out[50] == (0, None)         # zero-pair lag surfaces
    # NaN row: mean over the REAL values (+1/-1 -> 0), acf unchanged
    nan_df = spark.createDataFrame(
        rows + [(100, float("nan"))], "b bigint, x double"
    )
    # the NaN bucket pairs with nothing (no bucket 99/101), so only the
    # mean could leak bias; with davg it cannot
    out2 = {r.lag: r.acf for r in
            autocorrelation(nan_df, "b", "x", [1]).collect()}
    assert abs(out2[1] - -0.9) < 1e-12
    xc = {r.lag: (r.n_pairs, r.xcorr) for r in
          cross_correlation(df, "b", "x", "x", [0, 0, 50]).collect()}
    assert xc[0] == (10, 1.0) and xc[50] == (0, None)


def test_gap_fill_linear_interpolates_and_passes_through(spark):
    from bbt_etl_dw_spark.operators.timeseries import gap_fill_linear

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 4, 18.0), ("b", 2, 5.0)],
        "k string, b bigint, v double",
    )
    rows = {(r.k, r.b): (r.filled, r.interpolated) for r in
            gap_fill_linear(df, ["k"], "b", "v").collect()}
    # observed rows pass through, flagged False
    assert rows[("a", 0)] == (10.0, False)
    assert rows[("a", 4)] == (18.0, False)
    assert rows[("b", 2)] == (5.0, False)
    # interior days interpolate linearly on the slope 2.0/day
    assert rows[("a", 1)] == (12.0, True)
    assert rows[("a", 2)] == (14.0, True)
    assert rows[("a", 3)] == (16.0, True)
    # no extrapolation beyond each key's own observed span
    assert len(rows) == 6


def test_cross_correlation_detects_shift(spark):
    """y = x shifted forward by 2 buckets -> xcorr peaks at exactly 1.0
    at lag +2 (y lags x), and lag 0 of (x, x) is exactly 1."""
    from bbt_etl_dw_spark.operators.timeseries import cross_correlation

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    rows = [(t, xs[t], xs[t - 2] if t >= 2 else 0.0) for t in range(len(xs))]
    df = spark.createDataFrame(rows, "b bigint, x double, y double")
    # identical series: lag 0 is exactly 1 (num == den, same IEEE ops)
    same = {r.lag: r.xcorr for r in cross_correlation(
        df.select("b", "x", F.col("x").alias("y")), "b", "x", "y", [0]
    ).collect()}
    assert same[0] == 1.0
    # shifted copy: restrict to the overlap so the pairs are exact copies
    shifted = df.filter("b >= 2")
    out = {r.lag: r.xcorr for r in cross_correlation(
        shifted, "b", "x", "y", [-2, 0, 2]
    ).collect()}
    best = max(out, key=lambda k: out[k])
    # not 1.0 exactly: the lag-k pair set loses k edge buckets while the
    # means/denominators stay full-series (textbook estimator), so the
    # claim is dominance, not identity
    assert best == 2 and out[2] > 0.8 and out[2] > out[0] + 0.2


def test_hhi_uniform_and_degenerate(spark):
    """Uniform over 4 categories -> hhi 0.25, top_share 0.25; a single
    category -> both exactly 1."""
    from bbt_etl_dw_spark.functions.numeric import dsum
    from pyspark.sql import functions as F

    def hhi(df, col):
        counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        cd = F.col("cnt").cast("double")
        row = counts.agg(
            F.sum("cnt").cast("double").alias("total"),
            dsum(cd * cd, "s2"),
            F.max("cnt").cast("double").alias("mx"),
        ).select(
            (F.col("s2") / (F.col("total") * F.col("total"))).alias("hhi"),
            (F.col("mx") / F.col("total")).alias("top_share"),
        ).head()
        return row.hhi, row.top_share

    uniform = spark.createDataFrame(
        [(c,) for c in "abcd" for _ in range(5)], "k string"
    )
    assert hhi(uniform, "k") == (0.25, 0.25)
    single = spark.createDataFrame([("z",)] * 7, "k string")
    assert hhi(single, "k") == (1.0, 1.0)


def test_weighted_percentiles_mass_semantics(spark):
    """Lower-bound mass quantile: one heavy row dominates — the weighted
    median is the heavy value even though it's the row-count minority."""
    from bbt_etl_dw_spark.operators.stats import weighted_group_percentiles

    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_group_percentiles(
        df, ["g"], "v", "w", {"p50": 0.5, "p10": 0.1}
    ).head()
    assert out.p50 == 3.0  # cum mass 1,2,12 vs W=12: first >= 6 is v=3
    assert out.p10 == 2.0  # threshold 1.2: cum at v=1 is 1.0 < 1.2


def test_gap_fill_span_guard_raises(spark):
    """A pathological bucket span (stray epoch-0 row) must fail loudly,
    not materialize a giant spine array."""
    from bbt_etl_dw_spark.operators.timeseries import gap_fill_linear

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 10_000_000, 2.0)], "k string, b bigint, v double"
    )
    try:
        gap_fill_linear(df, ["k"], "b", "v", max_span=1_000_000).collect()
        raise AssertionError("span guard did not fire")
    except Exception as e:  # Py4J wraps the SparkRuntimeException
        assert "max_span" in str(e)
    # and a sane span still works with the guard in the plan
    ok = gap_fill_linear(df.filter("b = 0"), ["k"], "b", "v").collect()
    assert len(ok) == 1


def test_gap_fill_never_emits_below_span_on_duplicate_buckets(spark):
    """Contract-violating duplicate (key, bucket) rows must not fabricate
    out-of-span buckets: the lead-based densify (r14) would otherwise
    build sequence(b, b-1) — a DESCENDING range under Spark's default
    step — and emit below-min buckets with NULL fill. The clamp keeps
    duplicates as in-span fan-out (the old spine-join behavior class)."""
    from bbt_etl_dw_spark.operators.timeseries import gap_fill_linear

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 1, 11.0), ("k", 4, 40.0)],
        "k string, b bigint, v double",
    )
    rows = gap_fill_linear(df, ["k"], "b", "v").collect()
    assert min(r["b"] for r in rows) == 1, rows
    assert max(r["b"] for r in rows) == 4, rows
