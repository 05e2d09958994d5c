"""Property tests (hypothesis vs brute-force references) for the round-6
operators: incremental summary maintenance and the broadcast-size guard's
estimate monotonicity."""

import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.summary import (
    append_summary_batch,
    fold_summary,
    read_summary,
)

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

KEYS = ["k"]
SPECS = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@_SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(0, 59), min_size=0, max_size=4),
    fold_after=st.integers(0, 4),
)
def test_summary_fold_equals_python_reference_any_batching(
    spark, tmp_path_factory, rows, cuts, fold_after
):
    """For ANY batch split of ANY row multiset (adversarial doubles
    included) and a compaction injected at ANY batch boundary, the folded
    summary equals a pure-Python exact reference: counts and extrema
    exactly, sums at the double rounding of the exact decimal total —
    the batching-independence claim the decimal partials exist for."""
    path = str(tmp_path_factory.mktemp("log") / "summary")
    bounds = sorted({0, len(rows), *[c % (len(rows) + 1) for c in cuts]})
    batches = [
        rows[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if rows[lo:hi]
    ] or [rows]
    for i, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "k int, v double")
        append_summary_batch(df, path, KEYS, SPECS)
        if i == min(fold_after, len(batches) - 1):
            fold_summary(spark, path, KEYS, SPECS)
    got = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in read_summary(spark, path, KEYS, SPECS).collect()
    }
    ref: dict[int, list] = {}
    for k, v in rows:
        e = ref.setdefault(k, [0, Decimal(0), v, v])
        e[0] += 1
        e[1] += Decimal(repr(v))  # shortest-repr string == Spark's cast
        e[2] = min(e[2], v)
        e[3] = max(e[3], v)
    assert set(got) == set(ref)
    for k, (n, s, lo, hi) in got.items():
        rn, rs, rlo, rhi = ref[k]
        assert n == rn and lo == rlo and hi == rhi
        assert math.isclose(s, float(rs), rel_tol=0, abs_tol=abs(float(rs)) * 1e-15 + 1e-9)


@_SLOW
@given(n_rows=st.integers(1, 50), width=st.integers(0, 200))
def test_broadcast_estimate_monotone_and_bounded(spark, n_rows, width):
    """The guard's size estimate grows with both row count and payload
    width, and never underestimates the raw string payload — the
    safe-direction property that makes it a guard rather than a guess."""
    from bbt_etl_dw_spark.operators.guards import (
        CardinalityError,
        assert_broadcastable,
    )

    df = spark.range(n_rows).select(
        F.col("id"), F.repeat(F.lit("x"), width).alias("s")
    )
    payload = n_rows * width
    # passes with a budget safely above the payload + per-row overhead
    assert_broadcastable(df, max_bytes=payload + n_rows * 64 + 64)
    if payload > 0:
        # must raise when the budget is below the raw payload alone
        try:
            assert_broadcastable(df, "payload", max_bytes=payload - 1)
            raise AssertionError("guard passed an under-budget frame")
        except CardinalityError:
            pass


# --- sixth-session query invariants ------------------------------------------


def test_pareto_cum_share_monotone_and_closes_at_one(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["brand_revenue_pareto"].builder(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    # the final cumulative decimal equals the total decimal -> x/x == 1.0
    assert shares[-1] == 1.0
    assert rows[0].abc_class == "A" and rows[-1].abc_class == "C"


def test_zscore_anomalies_sorted_by_abs_z(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["nation_revenue_zscore_anomalies"].builder(
        spark, sf_dir
    ).collect()
    zs = [abs(r.z) for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert all(r.z is not None for r in rows)


def test_price_volume_bridge_sums_to_delta(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["brand_price_volume_mix"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # algebraic identity up to IEEE rounding of the two effects
        assert abs((r.volume_effect + r.price_effect) - r.delta_rev) <= max(
            1e-9 * abs(r.delta_rev), 1e-6
        )


def test_stickiness_bounds(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["events_dau_mau_stickiness"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mau >= r.dau > 0
        assert 0.0 < r.stickiness <= 1.0


def test_reconciliation_buckets_cover_all_orders(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["order_total_reconciliation"].builder(
        spark, sf_dir
    ).collect()
    n_orders = table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_wilson_bound_below_phat_and_in_unit_interval(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["brand_return_rate_wilson"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lower <= 1.0
        if 0.0 < r.phat < 1.0:
            assert r.wilson_lower < r.phat  # shrinkage is strict off the edges
    lows = [r.wilson_lower for r in rows]
    assert lows == sorted(lows, reverse=True)


def test_ltv_curve_is_monotone_per_cohort(spark, sf_dir):
    from collections import defaultdict

    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["events_cohort_ltv_curve"].builder(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in sorted(rows, key=lambda r: (str(r.cohort_week), r.week_offset)):
        by_cohort[str(r.cohort_week)].append(r.cum_rev)
    for curve in by_cohort.values():
        assert curve == sorted(curve)  # cumulative revenue never decreases


def test_seasonal_decomposition_identity_and_positivity(spark, sf_dir):
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["events_seasonal_decomposition"].builder(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.trend > 0 and r.seasonal > 0
        # multiplicative identity holds exactly as computed
        recon = r.trend * r.seasonal * r.residual
        assert abs(recon - r.val) <= 1e-9 * abs(r.val)
