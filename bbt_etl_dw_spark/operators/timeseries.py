"""Series-level time-series diagnostics: autocorrelation (ACF) and
linear gap-fill (interpolation over a generated day spine).

Companions to the row-level smoothers (``operators/smooth.trailing_ewma``,
``operators/ffill.forward_fill``): these two operate on an already
AGGREGATED series (one row per time bucket, typically the output of a
fact-table rollup), which is how a warehouse actually computes them —
the fact table reduces once, and every lag/spine manipulation happens on
the bucket-level frame that is orders of magnitude smaller than the
fact. The reference (BBT-ETL-DW) has no time-series diagnostics at all;
these extend its date-dimension handling (see ``transform/date_utils``
semantics mapped in SURVEY.md §2.7) to the analysis layer.

Scale notes:

- ``autocorrelation`` never sorts or windows the series globally: each
  lag is an EQUI-join of the series against itself on
  ``bucket + lag`` (the lag dimension is a broadcast literal frame), so
  the plan is fact-rollup → one small shuffle per self-join side. The
  global mean/denominator attach as 1-row broadcast scalars — linear,
  not quadratic (plan-lint ``SCALAR_SUBQUERY_ALLOWED``).
- ``gap_fill_linear`` builds the per-key spine with ``sequence()`` +
  ``explode`` bounded by each key's own [min, max] bucket (never a
  global calendar cross join), then fills with two frame-bounded
  windows over ONE hash partitioning on the key. Memory per row is
  O(1); no collect, no UDF.

Cross-engine determinism: bucket ids are epoch-day integers
(``unix_micros DIV 86_400_000_000`` — no session-timezone exposure);
all sums are exact string-mediated decimals (functions/numeric);
the closing divisions/interpolations are fixed IEEE sequences on
identical inputs, bit-equal in any IEEE-754 engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import davg, dsum


def autocorrelation(
    series: DataFrame,
    bucket_col: str,
    value_col: str,
    lags: Sequence[int],
) -> DataFrame:
    """Sample autocorrelation of ``value_col`` at each of ``lags``.

    ``series`` must hold ONE row per ``bucket_col`` value (integer
    buckets; gaps allowed — a (t, t+k) pair only forms when both buckets
    exist, the standard irregular-series convention). Returns
    ``(lag, n_pairs, acf)`` ordered by lag, with the textbook estimator

        r_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2

    where mean and the denominator range over the FULL series (constant
    across lags), so r_0 would be exactly 1.

    Duplicate lags are deduplicated (each would otherwise double-count
    every pair, returning 2·r_k — an out-of-[-1,1] value; r07 review).
    A lag that forms ZERO pairs still returns a row (n_pairs=0, NULL
    acf) so callers zipping against their requested lags never misalign.
    The mean is ``davg`` (denominator counts the decimal cast): NaN/Inf
    rows null out of the exact-decimal numerator, so counting them in
    the denominator silently biased every deviation.
    """
    spark = series.sparkSession
    b, v = F.col(bucket_col), F.col(value_col)
    # `base` feeds the mean aggregate AND the deviation projection;
    # `dev` feeds the denominator and BOTH lag-join sides. Composed
    # lazily that re-executes the caller's entire series pipeline (a
    # fact rollup, typically) ~6x (r14 plan audit of events_daily_acf).
    # Both frames are series-grain (one row per bucket) — materialize.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    base = materialize(
        series.select(b.alias("__b"), v.cast("double").alias("__x"))
    )

    stats = base.agg(davg(F.col("__x"), "__mean"))
    dev = materialize(
        base.crossJoin(F.broadcast(stats))
        .select("__b", (F.col("__x") - F.col("__mean")).alias("__d"))
    )
    denom = dev.agg(dsum(F.col("__d") * F.col("__d"), "__den"))

    lag_dim = spark.createDataFrame(
        [(k,) for k in dict.fromkeys(int(k) for k in lags)], "lag bigint"
    )
    left = dev.crossJoin(F.broadcast(lag_dim)).select(
        "lag", (F.col("__b") + F.col("lag")).alias("__b2"), F.col("__d").alias("__d1")
    )
    right = dev.select(F.col("__b").alias("__b2"), F.col("__d").alias("__d2"))
    nums = (
        left.join(right, "__b2")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(F.col("__d1") * F.col("__d2"), "__num"),
        )
    )
    return (
        lag_dim.join(nums, "lag", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            (F.col("__num") / F.col("__den")).alias("acf"),
        )
        .orderBy("lag")
    )


def gap_fill_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    out_col: str = "filled",
    max_span: int = 1_000_000,
) -> DataFrame:
    """Densify an integer-bucketed series per key and linearly
    interpolate the missing buckets.

    ``df`` must hold at most one row per (key, bucket). For every key
    the output covers every bucket in that key's own [min, max] span
    (no extrapolation beyond observed ends). Returns the key columns
    plus ``(bucket_col, out_col, interpolated)`` where ``interpolated``
    marks generated rows. Observed values pass through bit-unchanged;
    a generated bucket gets

        prev + (next - prev) * (bucket - prev_bucket) / (next_bucket - prev_bucket)

    from its nearest observed neighbours on each side. A key whose
    bucket span exceeds ``max_span`` raises in-plan (see the guard
    comment below) rather than materializing an unbounded spine array.
    """
    keys = list(key_cols)
    b = F.col(bucket_col)
    observed = df.select(*keys, b.alias(bucket_col), F.col(value_col).alias("__v"))

    # Densify WITHOUT a spine join (r14): each observed row generates the
    # buckets [its own, next observed - 1] via lead + explode(sequence) —
    # per key these ranges are disjoint and exactly tile [min, max], and
    # a generated bucket carries the observed value iff it IS the
    # generating row's bucket (at most one row per (key, bucket) by
    # contract), so the dense frame is row-identical to the old
    # bounds-aggregate -> spine -> left-join construction. What this
    # removes: the per-key bounds aggregate, the spine exchange, the
    # join (and the double execution of the caller's entire upstream
    # pipeline that feeding `observed` to two subtrees caused — r14 plan
    # audit of nation_revenue_gapfill: orders scanned and aggregated
    # twice). The lead window shares the fill windows' partitioning, so
    # the whole operator now rides ONE exchange on the key columns.
    # Memory also improves: the old shape built one span-sized array per
    # KEY; this builds one gap-sized array per ROW.
    wk = Window.partitionBy(*keys)
    w_lead = wk.orderBy(bucket_col)
    # sequence() materializes arrays in a single row: a pathological span
    # (one stray epoch-0 row under a minute-grain bucket) would build a
    # multi-GB array. Fail loudly instead — the remedy (fix the stray
    # bucket, or coarsen the grain) is a data decision the operator must
    # not make silently. The guard keys on the PER-KEY span (max-min),
    # exactly as before, so it raises on exactly the same inputs.
    span = F.max(b).over(wk) - F.min(b).over(wk)
    guarded_start = F.when(span <= int(max_span), b).otherwise(
        F.raise_error(
            F.format_string(
                "gap_fill_linear: key span %s exceeds max_span="
                + str(int(max_span))
                + " buckets — stray bucket or too-fine grain",
                span.cast("string"),
            )
        )
    )
    # clamp at the row's own bucket: under the one-row-per-(key, bucket)
    # contract lead > b always holds, but a contract-VIOLATING duplicate
    # bucket would make sequence(b, b-1) run DESCENDING (default step -1)
    # and fabricate below-span buckets silently (r14 review finding) —
    # clamped, duplicates degrade to in-span fan-out like the old
    # spine-join shape
    gap_end = F.greatest(F.coalesce(F.lead(b).over(w_lead) - 1, b), b)
    # window expressions must resolve in their own projection before the
    # generator consumes them (explode over a windowspec is unresolvable)
    bounded = observed.select(
        *keys,
        b.alias("__ob"),
        F.col("__v").alias("__ov"),
        guarded_start.alias("__start"),
        gap_end.alias("__end"),
    )
    dense = bounded.select(
        *keys,
        F.col("__ob"),
        F.col("__ov"),
        F.explode(F.sequence(F.col("__start"), F.col("__end"))).alias(bucket_col),
    ).select(
        *keys,
        bucket_col,
        F.when(F.col(bucket_col) == F.col("__ob"), F.col("__ov")).alias("__v"),
    )

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_b = F.when(F.col("__v").isNotNull(), F.col(bucket_col))
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    prev_b = F.last(known_b, ignorenulls=True).over(w_prev)
    next_v = F.first("__v", ignorenulls=True).over(w_next)
    next_b = F.first(known_b, ignorenulls=True).over(w_next)

    frac = (F.col(bucket_col) - prev_b).cast("double") / (
        (next_b - prev_b).cast("double")
    )
    interp = prev_v + (next_v - prev_v) * frac
    return dense.select(
        *keys,
        bucket_col,
        F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(interp).alias(out_col),
        F.col("__v").isNull().alias("interpolated"),
    )


def cross_correlation(
    series: DataFrame,
    bucket_col: str,
    x_col: str,
    y_col: str,
    lags: Sequence[int],
) -> DataFrame:
    """Sample cross-correlation of two aligned series at each lag
    (positive lag = y LAGS x by that many buckets; lag 0 is the plain
    Pearson numerator over the common buckets):

        r_k = sum_t (x_t - mx)(y_{t+k} - my) / sqrt(den_x * den_y)

    with means/denominators over the FULL series (constant across lags,
    symmetric with :func:`autocorrelation`). ``series`` holds one row
    per bucket with both values. Same plan shape as autocorrelation:
    equi self-join on ``bucket + lag``, 1-row broadcast scalars, no
    global sort; the closing sqrt/division are correctly-rounded IEEE
    ops. Same lag hygiene as :func:`autocorrelation` (dedup; zero-pair
    lags surface with n_pairs=0/NULL) and the same davg mean discipline.
    Returns ``(lag, n_pairs, xcorr)`` ordered by lag."""
    spark = series.sparkSession
    # same shared-frame discipline as autocorrelation: base feeds the
    # means and the deviations, dev feeds the denominator and both lag
    # sides — series-grain frames, materialized once each
    from bbt_etl_dw_spark.operators.ckpt import materialize

    base = materialize(
        series.select(
            F.col(bucket_col).alias("__b"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
        )
    )
    stats = base.agg(
        davg(F.col("__x"), "__mx"),
        davg(F.col("__y"), "__my"),
    )
    dev = materialize(
        base.crossJoin(F.broadcast(stats)).select(
            "__b",
            (F.col("__x") - F.col("__mx")).alias("__dx"),
            (F.col("__y") - F.col("__my")).alias("__dy"),
        )
    )
    denom = dev.agg(
        dsum(F.col("__dx") * F.col("__dx"), "__den_x"),
        dsum(F.col("__dy") * F.col("__dy"), "__den_y"),
    )
    lag_dim = spark.createDataFrame(
        [(k,) for k in dict.fromkeys(int(k) for k in lags)], "lag bigint"
    )
    left = dev.crossJoin(F.broadcast(lag_dim)).select(
        "lag", (F.col("__b") + F.col("lag")).alias("__b2"), "__dx"
    )
    right = dev.select(F.col("__b").alias("__b2"), "__dy")
    nums = (
        left.join(right, "__b2")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(F.col("__dx") * F.col("__dy"), "__num"),
        )
    )
    return (
        lag_dim.join(nums, "lag", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            (F.col("__num") / F.sqrt(F.col("__den_x") * F.col("__den_y")))
            .alias("xcorr"),
        )
        .orderBy("lag")
    )
