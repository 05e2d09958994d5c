"""Distributed statistics operators: group-wise ordinary-least-squares
trend fitting and exact (linearly interpolated) percentiles.

Both are classic warehouse asks the reference's aggregate surface
(SURVEY §2.4: sum/max/count/describe) stops short of:

- ``group_ols_slope`` — per-group slope/intercept of y over x, the
  ``regr_slope`` / ``regr_intercept`` family, computed from sufficient
  statistics (n, Σx, Σy, Σxy, Σx²) in ONE aggregation pass per group.
  This is the map-side-combinable formulation — the only one that works
  at 100 TB, since the sums reduce partially on every executor and only
  5 numbers per group cross the wire.
- ``exact_group_percentiles`` — exact ``percentile_cont`` over a
  distributed sort, complementing the approx sketch path
  (``order_quantile_sketch_check``): rank every row inside its group
  (one hash-partitioned sort), keep only the floor/ceil ranks of each
  requested percentile, and interpolate. Shuffles the column being
  ranked exactly once; the aggregate that follows touches ≤ 2 rows per
  percentile per group.

Cross-engine determinism: money sums go through the exact-decimal
discipline (functions/numeric.py); the closing slope / interpolation
arithmetic is a fixed sequence of IEEE-double operations (each
individually correctly rounded), written in the same order in the Spark
builders and the DuckDB oracle strings, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import (  # noqa: F401
    DEC,
    SQL_DEC,
    _dec_to_double,  # shared string-mediated decimal→double discipline
)


def group_ols_slope(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares fit of ``y = slope*x + intercept``.

    ``x`` must be integral (year, day index, …); ``y`` is double. The
    x-sums accumulate exactly as BIGINT, the y-sums exactly as
    DECIMAL(38,18); the closing arithmetic

        slope = (n*Σxy - Σx*Σy) / (n*Σx² - Σx*Σx)

    runs in double after exact-sum conversion. Groups with < 2 distinct
    x values have a zero denominator and return NULL slope (0/0 = NaN is
    mapped to NULL so downstream fillna semantics stay sane).

    Output: group_cols + (n_points, slope, intercept).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("double")
    xy = x.cast("double") * y  # per-row product: 1 deterministic rounding

    # Pairwise deletion, applied to EVERY sufficient statistic (the
    # pearson_corr `both` pattern; ADVICE r06): a row with NULL/NaN y (or
    # NULL x) must not contribute to Σx/Σx² while being absent from
    # n/Σy/Σxy — mismatched sums silently skew the fit with no NULL to
    # warn downstream. The gate includes the PRODUCT cast (r07 review):
    # operands inside DECIMAL(38,18) range can still overflow it when
    # multiplied (x=2024, y≈1e17), which would drop the row from Σxy
    # only — the exact mismatch this gate exists to prevent.
    ok = (
        x.isNotNull()
        & y.try_cast(DEC).isNotNull()
        & xy.try_cast(DEC).isNotNull()
    )

    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(ok, y)).alias("_n"),
        F.sum(F.when(ok, x)).alias("_sx"),
        F.sum(F.when(ok, y.try_cast(DEC))).alias("_sy"),
        F.sum(F.when(ok, xy.try_cast(DEC))).alias("_sxy"),
        F.sum(F.when(ok, x * x)).alias("_sxx"),
    )
    n_d = F.col("_n").cast("double")
    sx_d = F.col("_sx").cast("double")
    sy_d = _dec_to_double(F.col("_sy"))
    sxy_d = _dec_to_double(F.col("_sxy"))
    sxx_d = F.col("_sxx").cast("double")

    num = n_d * sxy_d - sx_d * sy_d
    den = n_d * sxx_d - sx_d * sx_d
    # Guard the zero denominator (single point / constant x) BEFORE the
    # division: ANSI mode raises on divide-by-zero, and IEEE inf/NaN
    # would differ between engines anyway. CASE WHEN short-circuits
    # per-row, so the division never executes for degenerate groups.
    slope = F.when(den != 0.0, num / den)
    # same guard: den != 0 implies n >= 2, so n_d is never 0 here
    intercept = F.when(den != 0.0, (sy_d - slope * sx_d) / n_d)

    return agg.select(
        *group_cols,
        F.col("_n").alias("n_points"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def sql_ols_exprs(x: str, y: str) -> dict[str, str]:
    """Oracle-SQL twins of :func:`group_ols_slope`'s aggregate + closing
    arithmetic, for use inside a GROUP BY. Returns SELECT-list fragments
    keyed n_points / slope / intercept — the arithmetic mirrors the Spark
    expressions operation-for-operation."""
    # pairwise-deletion gate, mirroring the builder's `ok` exactly
    # (operands AND the xy product cast)
    y_dec = f"TRY_CAST(CAST(CAST(({y}) AS DOUBLE) AS VARCHAR) AS {SQL_DEC})"
    xy_gate = (
        f"TRY_CAST(CAST((CAST(CAST(({x}) AS BIGINT) AS DOUBLE) "
        f"* CAST(({y}) AS DOUBLE)) AS VARCHAR) AS {SQL_DEC})"
    )
    ok = (
        f"(CAST(({x}) AS BIGINT) IS NOT NULL AND {y_dec} IS NOT NULL "
        f"AND {xy_gate} IS NOT NULL)"
    )
    n_d = f"CAST(COUNT(CASE WHEN {ok} THEN CAST(({y}) AS DOUBLE) END) AS DOUBLE)"
    sx_d = f"CAST(SUM(CASE WHEN {ok} THEN CAST(({x}) AS BIGINT) END) AS DOUBLE)"
    dec = lambda e: (  # noqa: E731
        f"SUM(CASE WHEN {ok} THEN TRY_CAST(CAST(({e}) AS VARCHAR) AS {SQL_DEC}) END)"
    )
    sy_d = f"CAST(CAST({dec(f'CAST(({y}) AS DOUBLE)')} AS VARCHAR) AS DOUBLE)"
    xy = f"CAST(CAST(({x}) AS BIGINT) AS DOUBLE) * CAST(({y}) AS DOUBLE)"
    sxy_d = f"CAST(CAST({dec(xy)} AS VARCHAR) AS DOUBLE)"
    sxx_d = (
        f"CAST(SUM(CASE WHEN {ok} THEN "
        f"CAST(({x}) AS BIGINT) * CAST(({x}) AS BIGINT) END) AS DOUBLE)"
    )
    num = f"({n_d} * {sxy_d} - {sx_d} * {sy_d})"
    den = f"({n_d} * {sxx_d} - {sx_d} * {sx_d})"
    # zero-denominator guard BEFORE dividing, mirroring the builder
    slope = f"(CASE WHEN {den} <> 0.0 THEN {num} / {den} END)"
    intercept = f"(CASE WHEN {den} <> 0.0 THEN ({sy_d} - {slope} * {sx_d}) / {n_d} END)"
    return {
        "n_points": f"COUNT(CASE WHEN {ok} THEN CAST(({y}) AS DOUBLE) END)",
        "slope": slope,
        "intercept": intercept,
    }


def pearson_corr(x_col: str, y_col: str) -> Column:
    """Pearson correlation as ONE aggregate expression from sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²) — map-side combinable, exactly
    like :func:`group_ols_slope` (Spark's built-in ``corr`` uses a
    streaming co-moment recurrence whose result depends on merge order —
    not oracle-matchable). Rows where either side is NULL/NaN/Inf are
    excluded from EVERY sum (pairwise deletion, applied consistently).
    Zero variance on either side → NULL."""
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    x_dec = xd.try_cast(DEC)
    y_dec = yd.try_cast(DEC)
    # gate includes every PRODUCT cast (r07 review): v≈1e10 fits DEC but
    # v² = 1e20 overflows it, and a row dropped from Σxy/Σxx/Σyy only
    # yields mismatched sufficient statistics (possibly negative variance
    # → NaN) instead of a loud failure
    both = (
        x_dec.isNotNull()
        & y_dec.isNotNull()
        & (xd * yd).try_cast(DEC).isNotNull()
        & (xd * xd).try_cast(DEC).isNotNull()
        & (yd * yd).try_cast(DEC).isNotNull()
    )

    n_d = F.count(F.when(both, x_dec)).cast("double")
    sx = _dec_to_double(F.sum(F.when(both, x_dec)))
    sy = _dec_to_double(F.sum(F.when(both, y_dec)))
    sxy = _dec_to_double(F.sum(F.when(both, (xd * yd).try_cast(DEC))))
    sxx = _dec_to_double(F.sum(F.when(both, (xd * xd).try_cast(DEC))))
    syy = _dec_to_double(F.sum(F.when(both, (yd * yd).try_cast(DEC))))

    num = n_d * sxy - sx * sy
    den = F.sqrt(n_d * sxx - sx * sx) * F.sqrt(n_d * syy - sy * sy)
    return F.when(den != 0.0, num / den)


def sql_pearson_corr(x: str, y: str) -> str:
    """Oracle-SQL twin of :func:`pearson_corr` (same sums, same closing
    IEEE sequence)."""
    xd, yd = f"CAST(({x}) AS DOUBLE)", f"CAST(({y}) AS DOUBLE)"
    x_dec = f"TRY_CAST(CAST({xd} AS VARCHAR) AS {SQL_DEC})"
    y_dec = f"TRY_CAST(CAST({yd} AS VARCHAR) AS {SQL_DEC})"

    def pdec(e: str) -> str:
        return f"TRY_CAST(CAST(({e}) AS VARCHAR) AS {SQL_DEC})"

    both = (
        f"({x_dec} IS NOT NULL AND {y_dec} IS NOT NULL"
        f" AND {pdec(f'{xd} * {yd}')} IS NOT NULL"
        f" AND {pdec(f'{xd} * {xd}')} IS NOT NULL"
        f" AND {pdec(f'{yd} * {yd}')} IS NOT NULL)"
    )

    def gsum(e: str) -> str:
        return (
            f"CAST(CAST(SUM(CASE WHEN {both} THEN "
            f"TRY_CAST(CAST(({e}) AS VARCHAR) AS {SQL_DEC}) END) AS VARCHAR) AS DOUBLE)"
        )

    n_d = f"CAST(COUNT(CASE WHEN {both} THEN 1 END) AS DOUBLE)"
    sx, sy = gsum(xd), gsum(yd)
    sxy = gsum(f"{xd} * {yd}")
    sxx = gsum(f"{xd} * {xd}")
    syy = gsum(f"{yd} * {yd}")
    num = f"({n_d} * {sxy} - {sx} * {sy})"
    den = f"(sqrt({n_d} * {sxx} - {sx} * {sx}) * sqrt({n_d} * {syy} - {sy} * {sy}))"
    return f"(CASE WHEN {den} <> 0.0 THEN {num} / {den} END)"


def exact_group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles (``percentile_cont`` semantics) per
    group over a distributed sort.

    Each row is ranked within its group (ONE shuffle: the two window
    functions share a single hash partitioning on the group columns);
    for percentile p over n rows the target index is ``(n-1)*p`` and the
    result interpolates between the floor- and ceil-ranked values:
    ``v_lo + (v_hi - v_lo) * frac``. Only those ≤ 2 rows per percentile
    survive into the closing aggregate, so the reduce side is tiny no
    matter how large the groups are. Ties at the boundary ranks are
    benign: equal values interpolate to themselves regardless of which
    tied row takes which rank.

    Scale caveat: the rank window parallelizes across GROUPS — with few
    distinct group keys the fact funnels through #groups sort tasks.
    For low-cardinality groups prefer the mass-based
    :func:`weighted_group_percentiles` with unit weights (value-binned:
    the fact reduces map-side first) when lower-bound semantics are
    acceptable, or the mergeable sketch path
    (``order_quantile_sketch_check``) when approximation is.

    NULL and NaN values are EXCLUDED before ranking (``percentile_cont``
    semantics; ADVICE r06 + r07 review): Spark windows order NULLS FIRST
    while DuckDB's ROW_NUMBER defaults NULLS LAST, and a NaN ranks LAST
    in both engines but shifts every index and poisons any percentile
    that interpolates against it — one NaN row would silently skew the
    whole group (and mad_outlier_summary built on top). The ranked-CTE
    oracle contract mirrors this with ``WHERE _v IS NOT NULL AND NOT
    isnan(_v)`` (see :func:`sql_percentile_exprs`), exactly as
    ``weighted_group_percentiles`` and ``mann_whitney_u`` already guard.

    Output: group_cols + one double column per ``percentiles`` key.
    """
    v = F.col(value_col).cast("double")
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    w_rank = Window.partitionBy(*group_cols).orderBy(v)
    w_all = Window.partitionBy(*group_cols)
    ranked = df.withColumn("_rn", F.row_number().over(w_rank) - 1).withColumn(
        "_cnt", F.count(F.lit(1)).over(w_all)
    )

    aggs = []
    for name, p in percentiles.items():
        idx = (F.col("_cnt") - 1).cast("double") * F.lit(float(p))
        lo = F.floor(idx)  # long
        hi = F.ceil(idx)  # long
        frac = idx - lo.cast("double")
        v_lo = F.max(F.when(F.col("_rn") == lo, v))
        v_hi = F.max(F.when(F.col("_rn") == hi, v))
        aggs.append((v_lo + (v_hi - v_lo) * F.max(frac)).alias(name))
    return ranked.groupBy(*group_cols).agg(*aggs)


def sql_percentile_exprs(percentiles: dict[str, float]) -> list[str]:
    """Oracle-SQL twins of :func:`exact_group_percentiles`'s closing
    aggregates. The caller wraps these in a GROUP BY over a ranked CTE
    exposing ``_v`` (double value), ``_rn`` (0-based rank within group)
    and ``_cnt`` (group size); each fragment mirrors the Spark
    interpolation arithmetic operation-for-operation. CONTRACT: the
    ranked CTE must carry ``WHERE <value> IS NOT NULL AND NOT
    isnan(<value>)`` so ``_rn``/``_cnt`` range over exactly the rows the
    builder ranks (the builder excludes NULL and NaN values before
    ranking — NULLS FIRST vs NULLS LAST would diverge cross-engine, and
    a NaN shifts every index and poisons interpolation)."""
    outs = []
    for name, p in percentiles.items():
        # CAST the literal: DuckDB parses a bare `0.25` as DECIMAL, and
        # decimal-vs-double multiplication would break bit-parity.
        idx = f"(CAST((_cnt - 1) AS DOUBLE) * CAST({float(p)!r} AS DOUBLE))"
        lo = f"CAST(FLOOR({idx}) AS BIGINT)"
        hi = f"CAST(CEIL({idx}) AS BIGINT)"
        frac = f"({idx} - CAST({lo} AS DOUBLE))"
        v_lo = f"MAX(CASE WHEN _rn = {lo} THEN _v END)"
        v_hi = f"MAX(CASE WHEN _rn = {hi} THEN _v END)"
        outs.append(f"{v_lo} + ({v_hi} - {v_lo}) * MAX({frac}) AS {name}")
    return outs


def mad_outlier_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier profile per group: median / MAD (median absolute
    deviation) and the count of rows with ``|x - median| > k·MAD``.

    The robust complement of z-score anomaly rules (operators/anomalies)
    and winsorize capping (operators/clean): median and MAD are immune
    to the outliers they measure, where mean/stddev are dragged by them.
    Two ranked shuffles (one per percentile pass —
    :func:`exact_group_percentiles`), with the group-level medians
    broadcast back onto the rows (group cardinality is dim-scale by
    construction). Raw MAD is reported (multiply by 1.4826 for the
    normal-consistent sigma estimate); a group where >50% of values are
    identical has MAD 0, making every deviating row an outlier — that
    is the standard MAD failure mode, surfaced rather than hidden.

    Output: group_cols + (n_rows, median, mad, n_outliers).
    """
    v = F.col(value_col).cast("double")
    med = exact_group_percentiles(df, group_cols, value_col, {"median": 0.5})
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_absdev", F.abs(v - F.col("median"))
    )
    mad = exact_group_percentiles(dev, group_cols, "_absdev", {"mad": 0.5})
    scored = dev.join(F.broadcast(mad), group_cols)
    return scored.groupBy(*group_cols).agg(
        F.count(v).alias("n_rows"),
        F.max("median").alias("median"),
        F.max("mad").alias("mad"),
        F.sum(
            F.when(F.col("_absdev") > F.lit(float(k)) * F.col("mad"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two groups, in
    ONE aggregation pass over conditional sufficient statistics (n, Σx,
    Σx² per side — map-side combinable; nothing but six numbers crosses
    the wire). The inferential-stats sibling of :func:`pearson_corr`.

        s²ᵢ = (Σx²ᵢ - Σxᵢ²/nᵢ) / (nᵢ - 1)          (sample variance)
        t   = (m₁ - m₂) / sqrt(s²₁/n₁ + s²₂/n₂)
        dof = (s²₁/n₁ + s²₂/n₂)² /
              ((s²₁/n₁)²/(n₁-1) + (s²₂/n₂)²/(n₂-1))   (Welch–Satterthwaite)

    Sums are exact-decimal; the closing arithmetic is a fixed IEEE
    sequence (mirrored by :func:`sql_welch_t_test`), so t and dof are
    bit-reproducible. Either side with n < 2 or zero variance on both
    sides → NULL t/dof. Returns one row:
    (n_a, n_b, mean_a, mean_b, t_stat, dof).
    """
    v = F.col(value_col).cast("double")
    v_dec = v.try_cast(DEC)
    # row gate includes the v² cast (r07 review): v≈1e10 fits DEC but v²
    # overflows it — dropping the row from Σx² only would fabricate a
    # negative variance
    vv_dec = (v * v).try_cast(DEC)
    ok_row = v_dec.isNotNull() & vv_dec.isNotNull()

    def side(name: str):
        cond = (F.col(group_col) == name) & ok_row
        n = F.count(F.when(cond, v_dec))
        s = F.sum(F.when(cond, v_dec))
        ss = F.sum(F.when(cond, vv_dec))
        return n, s, ss

    na, sa, ssa = side(group_a)
    nb, sb, ssb = side(group_b)
    agg = df.agg(
        na.alias("_na"), sa.alias("_sa"), ssa.alias("_ssa"),
        nb.alias("_nb"), sb.alias("_sb"), ssb.alias("_ssb"),
    )

    def finish(n_col: str, s_col: str, ss_col: str):
        n_d = F.col(n_col).cast("double")
        s_d = _dec_to_double(F.col(s_col))
        ss_d = _dec_to_double(F.col(ss_col))
        mean = s_d / n_d
        var = (ss_d - s_d * s_d / n_d) / (n_d - F.lit(1.0))
        return n_d, mean, var

    na_d, ma, va = finish("_na", "_sa", "_ssa")
    nb_d, mb, vb = finish("_nb", "_sb", "_ssb")
    sea = va / na_d
    seb = vb / nb_d
    se2 = sea + seb
    ok = (F.col("_na") >= 2) & (F.col("_nb") >= 2) & (se2 > 0.0)
    t = F.when(ok, (ma - mb) / F.sqrt(se2))
    dof = F.when(
        ok,
        (se2 * se2)
        / (sea * sea / (na_d - F.lit(1.0)) + seb * seb / (nb_d - F.lit(1.0))),
    )
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.when(F.col("_na") > 0, ma).alias("mean_a"),
        F.when(F.col("_nb") > 0, mb).alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("dof"),
    )


def sql_welch_t_test(
    group_expr: str, value_expr: str, group_a: str, group_b: str
) -> str:
    """Oracle-SQL twin of :func:`welch_t_test` — a SELECT-list body (no
    FROM) mirroring every sum and every closing IEEE operation."""
    v = f"CAST(({value_expr}) AS DOUBLE)"
    v_dec = f"TRY_CAST(CAST({v} AS VARCHAR) AS {SQL_DEC})"
    vv_dec = f"TRY_CAST(CAST(({v} * {v}) AS VARCHAR) AS {SQL_DEC})"

    def side(name: str):
        cond = (
            f"(({group_expr}) = '{name}' AND {v_dec} IS NOT NULL "
            f"AND {vv_dec} IS NOT NULL)"
        )
        n = f"COUNT(CASE WHEN {cond} THEN {v_dec} END)"
        s = f"CAST(CAST(SUM(CASE WHEN {cond} THEN {v_dec} END) AS VARCHAR) AS DOUBLE)"
        ss = f"CAST(CAST(SUM(CASE WHEN {cond} THEN {vv_dec} END) AS VARCHAR) AS DOUBLE)"
        return n, s, ss

    na, sa, ssa = side(group_a)
    nb, sb, ssb = side(group_b)

    def finish(n, s, ss):
        n_d = f"CAST({n} AS DOUBLE)"
        mean = f"({s} / {n_d})"
        var = f"(({ss} - {s} * {s} / {n_d}) / ({n_d} - 1.0))"
        return n_d, mean, var

    na_d, ma, va = finish(na, sa, ssa)
    nb_d, mb, vb = finish(nb, sb, ssb)
    sea = f"({va} / {na_d})"
    seb = f"({vb} / {nb_d})"
    se2 = f"({sea} + {seb})"
    ok = f"({na} >= 2 AND {nb} >= 2 AND {se2} > 0.0)"
    return f"""
       {na} AS n_a,
       {nb} AS n_b,
       (CASE WHEN {na} > 0 THEN {ma} END) AS mean_a,
       (CASE WHEN {nb} > 0 THEN {mb} END) AS mean_b,
       (CASE WHEN {ok} THEN ({ma} - {mb}) / sqrt({se2}) END) AS t_stat,
       (CASE WHEN {ok} THEN ({se2} * {se2})
          / ({sea} * {sea} / ({na_d} - 1.0) + {seb} * {seb} / ({nb_d} - 1.0)) END) AS dof"""


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between two groups — the
    nonparametric sibling of :func:`welch_t_test` for the heavy-tailed
    columns where a mean comparison misleads.

    Rank computation is VALUE-BINNED, not row-ranked: the fact reduces
    to per-distinct-value counts in one hash aggregation (map-side
    combinable), and the rank window runs over the distinct-value table
    only — at 100 TB the billion-row sample never passes through a
    global sort, only its (value → count-per-side) histogram does. Ties
    fall out naturally: every row of a bin shares the bin's midrank.

    Exactness: midranks are half-integers, so the sums carry DOUBLED
    ranks as DECIMAL(38,0) (bit-exact at any n; BIGINT would overflow
    near n ~ 3e9 since R ~ n²); the closing z arithmetic — including the
    tie-correction Σ(t³-t) — is a fixed IEEE sequence with an exact
    sqrt. No continuity correction (documented; both engines agree).

    Returns one row: (n_a, n_b, u_a, u_b, z_stat); z NULL when either
    side is empty or every value ties (zero variance). ``u_a`` follows
    the scipy/Wikipedia convention U_a = R_a − n_a(n_a+1)/2, so a
    stochastically SMALLER group_a gives small u_a and negative z —
    one-sided comparisons read the same direction as every textbook
    table.
    """
    v = F.col(value_col).cast("double")
    side = F.col(group_col)
    rows = df.filter(
        side.isin([group_a, group_b]) & v.isNotNull() & ~F.isnan(v)
    ).select(v.alias("val"), side.alias("_side"))
    bins = rows.groupBy("val").agg(
        F.sum(F.when(F.col("_side") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("_side") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    wcum = (
        Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = (F.col("ca") + F.col("cb")).alias("t")
    ranked = bins.select(
        "val", "ca", "cb", t,
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(wcum), F.lit(0)).alias("cum"),
    )
    # doubled midrank of the bin: 2*cum + t + 1 (always integral)
    rank2 = (F.lit(2) * F.col("cum") + F.col("t") + F.lit(1)).cast("long")
    D0 = "decimal(38,0)"
    # Cast to DECIMAL(38,0) BEFORE multiplying (ADVICE r06): ca·rank2 and
    # t³ in BIGINT overflow long past ~2.09M tied rows in one value bin —
    # ANSI error (or silent wrap with ANSI off) — contradicting the
    # "no n² overflow at any scale" contract above. Decimal-first keeps
    # every intermediate inside DECIMAL(38,0); the oracle twin mirrors
    # the identical cast order so bit-parity holds.
    ca_dec = F.col("ca").cast(D0)
    t_dec = F.col("t").cast(D0)
    agg = ranked.agg(
        F.sum("ca").alias("_na"),
        F.sum("cb").alias("_nb"),
        F.sum(ca_dec * rank2.cast(D0)).alias("_r2a"),
        F.sum(t_dec * t_dec * t_dec - t_dec).alias("_ties"),
    )
    na_d = F.coalesce(F.col("_na"), F.lit(0)).cast("double")
    nb_d = F.coalesce(F.col("_nb"), F.lit(0)).cast("double")
    n_d = na_d + nb_d
    r2a_d = _dec_to_double(F.col("_r2a"))
    ties_d = _dec_to_double(F.col("_ties"))
    # scipy/Wikipedia convention (r07 review — the previous expression
    # n_a·n_b + n_a(n_a+1)/2 − R_a is the OTHER group's U, so u_a/u_b
    # were swapped and z's sign inverted vs every textbook table):
    #   U_a = R_a − n_a(n_a+1)/2
    u_a = r2a_d / F.lit(2.0) - (na_d * (na_d + F.lit(1.0))) / F.lit(2.0)
    u_b = na_d * nb_d - u_a
    mu = (na_d * nb_d) / F.lit(2.0)
    sigma2 = (
        (na_d * nb_d) / F.lit(12.0)
        * ((n_d + F.lit(1.0)) - ties_d / (n_d * (n_d - F.lit(1.0))))
    )
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0)
    return agg.select(
        F.coalesce(F.col("_na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("_nb"), F.lit(0)).cast("long").alias("n_b"),
        F.when(ok, u_a).alias("u_a"),
        F.when(ok, u_b).alias("u_b"),
        F.when(ok & (sigma2 > 0.0), (u_a - mu) / F.sqrt(sigma2)).alias("z_stat"),
    )


def sql_mann_whitney_ctes(
    source_sql: str, group_sql: str, value_sql: str, group_a: str, group_b: str
) -> str:
    """DuckDB CTE chain replaying :func:`mann_whitney_u` over
    ``{source_sql}`` operation-for-operation; yields relation ``mwu``
    with the operator's one-row output."""
    v = f"CAST(({value_sql}) AS DOUBLE)"
    dec2dbl = lambda e: f"CAST(CAST(({e}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
mwu_rows AS (
  SELECT {v} AS val, ({group_sql}) AS side FROM ({source_sql})
  WHERE ({group_sql}) IN ('{group_a}', '{group_b}')
    AND {v} IS NOT NULL AND NOT isnan({v})
),
mwu_bins AS (
  SELECT val,
         CAST(SUM(CASE WHEN side = '{group_a}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN side = '{group_b}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM mwu_rows GROUP BY val
),
mwu_ranked AS (
  SELECT val, ca, cb, ca + cb AS t,
         COALESCE(SUM(ca + cb) OVER (ORDER BY val
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM mwu_bins
),
mwu_agg AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb,
         SUM(CAST(ca AS DECIMAL(38,0))
             * CAST(2 * cum + t + 1 AS DECIMAL(38,0))) AS r2a,
         SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
             * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
  FROM mwu_ranked
),
mwu AS (
  SELECT CAST(COALESCE(na, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(nb, 0) AS BIGINT) AS n_b,
         (CASE WHEN COALESCE(na, 0) > 0 AND COALESCE(nb, 0) > 0 THEN u_a END) AS u_a,
         (CASE WHEN COALESCE(na, 0) > 0 AND COALESCE(nb, 0) > 0
               THEN na_d * nb_d - u_a END) AS u_b,
         (CASE WHEN COALESCE(na, 0) > 0 AND COALESCE(nb, 0) > 0 AND sigma2 > 0.0
               THEN (u_a - (na_d * nb_d) / CAST(2.0 AS DOUBLE)) / sqrt(sigma2) END) AS z_stat
  FROM (
    SELECT na, nb,
           na_d, nb_d,
           {dec2dbl('r2a')} / CAST(2.0 AS DOUBLE)
             - (na_d * (na_d + CAST(1.0 AS DOUBLE))) / CAST(2.0 AS DOUBLE) AS u_a,
           (na_d * nb_d) / CAST(12.0 AS DOUBLE)
             * (((na_d + nb_d) + CAST(1.0 AS DOUBLE))
                - {dec2dbl('ties')} / ((na_d + nb_d) * ((na_d + nb_d) - CAST(1.0 AS DOUBLE)))) AS sigma2
    FROM (
      SELECT na, nb, r2a, ties,
             CAST(COALESCE(na, 0) AS DOUBLE) AS na_d,
             CAST(COALESCE(nb, 0) AS DOUBLE) AS nb_d
      FROM mwu_agg
    )
  )
)"""


# first-digit occurrence probabilities under Benford's law, log10(1+1/d)
# precomputed host-side: embedding the same repr literal in the builder
# and the oracle sidesteps the no-log-in-oracles rule (a literal parses
# to the same double in both engines; a runtime log10 need not).
BENFORD_P = {
    1: 0.30102999566398114,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_digit_audit(
    df: DataFrame, value_col: str, *, max_pow: int = 7
) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column
    against Benford's law — the forensic-accounting screen for fabricated
    or truncated money columns, as a data-quality audit.

    Digit extraction is a power-of-ten CASE ladder (floor of v/10^k on
    the branch where v ∈ [10^k, 10^k+1)): division and floor are
    correctly-rounded IEEE ops, so the digit is bit-deterministic —
    deliberately NOT log10 (libm drift) and NOT string formatting
    (engine-dependent rendering). Values outside [1, 10^max_pow) are
    counted in the out_of_range row (digit 0) rather than silently
    dropped. One hash aggregation over the fact; the 9-digit frame and
    chi-square close at driver scale.

    Output: one row per digit 1..9 (+ digit 0 for out-of-range when any)
    with (digit, n_obs, share_obs, benford_share, chisq_term). The
    chi-square statistic is SUM(chisq_term) over digits 1..9; terms use
    in-range N only.
    """
    v = F.col(value_col).cast("double")
    in_range = v.isNotNull() & ~F.isnan(v) & (v >= 1.0) & (v < float(10 ** max_pow))
    # build ascending so the HIGHEST power ends outermost: the CASE must
    # test v >= 10^6 before v >= 10^5, or every large value matches the
    # small-power branch and reads the wrong digit
    ladder = F.floor(v).cast("long")
    for k in range(1, max_pow):
        p = float(10 ** k)
        ladder = F.when(v >= F.lit(p), F.floor(v / F.lit(p)).cast("long")).otherwise(
            ladder
        )
    counts = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(F.when(in_range, ladder).otherwise(F.lit(0)).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # the <=10-row digit histogram feeds four subtrees (dense join,
    # out-of-range union, in-range total, final projection) — left lazy
    # the fact hash-agg ran 4x (r14 plan audit of lineitem_benford_audit)
    from bbt_etl_dw_spark.operators.ckpt import materialize

    counts = materialize(counts)
    spark = df.sparkSession
    frame = spark.range(1, 10).select(F.col("id").cast("long").alias("digit"))
    full = frame.join(counts, "digit", "left").select(
        "digit", F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs")
    )
    oor = counts.filter(F.col("digit") == 0).select(
        "digit", F.col("n_obs").cast("long").alias("n_obs")
    )
    full = full.unionAll(oor)
    total_in = full.filter(F.col("digit") >= 1).agg(
        F.sum("n_obs").alias("n_in_range")
    )
    p_expr = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        p_expr = F.when(F.col("digit") == d, F.lit(BENFORD_P[d])).otherwise(p_expr)
    n_d = F.col("n_obs").cast("double")
    nt_d = F.col("n_in_range").cast("double")
    expected = p_expr * nt_d
    chisq = F.when(
        (F.col("digit") >= 1) & (expected > 0.0),
        (n_d - expected) * (n_d - expected) / expected,
    )
    return full.crossJoin(F.broadcast(total_in)).select(
        "digit",
        "n_obs",
        # nt_d > 0 guard (r07 review): an input with ZERO in-range values
        # (all rows in (0,1), or empty) makes this 0/0 — an ANSI
        # DIVIDE_BY_ZERO crash, or a NULL-vs-NaN oracle divergence with
        # ANSI off. Every other division in this module is guarded.
        F.when((F.col("digit") >= 1) & (nt_d > 0.0), n_d / nt_d).alias(
            "share_obs"
        ),
        p_expr.alias("benford_share"),
        chisq.alias("chisq_term"),
    )


def sql_benford_ctes(source_sql: str, value_sql: str, *, max_pow: int = 7) -> str:
    """DuckDB CTE chain replaying :func:`benford_digit_audit`; yields
    relation ``benford`` with the operator's output columns."""
    v = f"CAST(({value_sql}) AS DOUBLE)"
    hi = float(10 ** max_pow)
    ladder = "CASE"
    for k in range(max_pow - 1, 0, -1):
        p = float(10 ** k)
        ladder += (
            f" WHEN {v} >= CAST({p!r} AS DOUBLE)"
            f" THEN CAST(FLOOR({v} / CAST({p!r} AS DOUBLE)) AS BIGINT)"
        )
    ladder += f" ELSE CAST(FLOOR({v}) AS BIGINT) END"
    in_range = (
        f"({v} IS NOT NULL AND NOT isnan({v})"
        f" AND {v} >= CAST(1.0 AS DOUBLE) AND {v} < CAST({hi!r} AS DOUBLE))"
    )
    p_case = "CASE " + " ".join(
        f"WHEN digit = {d} THEN CAST({BENFORD_P[d]!r} AS DOUBLE)"
        for d in range(1, 10)
    ) + " END"
    return f"""
benford_counts AS (
  SELECT (CASE WHEN {in_range} THEN {ladder} ELSE 0 END) AS digit,
         COUNT(*) AS n_obs
  FROM ({source_sql})
  WHERE {v} IS NOT NULL AND NOT isnan({v})
  GROUP BY 1
),
benford_frame AS (
  SELECT CAST(d AS BIGINT) AS digit,
         CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs
  FROM generate_series(1, 9) AS g(d)
  LEFT JOIN benford_counts c ON c.digit = CAST(d AS BIGINT)
  UNION ALL
  SELECT digit, CAST(n_obs AS BIGINT) FROM benford_counts WHERE digit = 0
),
benford_total AS (
  SELECT SUM(n_obs) AS n_in_range FROM benford_frame WHERE digit >= 1
),
benford AS (
  SELECT digit, n_obs,
         (CASE WHEN digit >= 1 AND CAST(t.n_in_range AS DOUBLE) > 0.0
               THEN CAST(n_obs AS DOUBLE) / CAST(t.n_in_range AS DOUBLE) END) AS share_obs,
         {p_case} AS benford_share,
         (CASE WHEN digit >= 1 AND ({p_case}) * CAST(t.n_in_range AS DOUBLE) > 0.0
               THEN (CAST(n_obs AS DOUBLE) - ({p_case}) * CAST(t.n_in_range AS DOUBLE))
                  * (CAST(n_obs AS DOUBLE) - ({p_case}) * CAST(t.n_in_range AS DOUBLE))
                  / (({p_case}) * CAST(t.n_in_range AS DOUBLE)) END) AS chisq_term
  FROM benford_frame CROSS JOIN benford_total t
)"""


def weighted_group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """Exact weighted percentiles per group: for percentile p the result
    is the LOWER-BOUND quantile ``min{ v : cumweight(v) >= p * W }``
    (the mass-based definition — no interpolation, so the answer is
    always an observed value). Weights must be non-negative: the
    cumulative sum must be monotone for the threshold predicate (and the
    cross-engine tie argument below) to hold.

    Rows with a NULL value are excluded up front: they carry no
    position on the value axis, and the engines disagree on where NULL
    sorts (Spark NULLS FIRST vs DuckDB NULLS LAST), which would
    otherwise skew the cumulative weights cross-engine.

    Scale shape (the Mann-Whitney value-binning discipline): the fact
    REDUCES FIRST to one exact-decimal weight sum per (group, DISTINCT
    value) — a map-side-combining hash aggregate, the only pass that
    touches fact-scale rows — and the cumulative window then runs over
    the value-bin rollup. A low-cardinality group column therefore
    never funnels the fact through #groups window tasks (measured 6.87x
    at 10x data with the naive per-row window on 3 groups; value
    binning makes the window input groups x distinct-values). Binning
    is also what makes ties a non-issue: the lower-bound quantile
    ``min{ v : cumweight(v) >= p * W }`` only ever reads cumulative
    weight at BIN boundaries, which no within-value ordering can move.
    The threshold compare happens in double on BOTH engines (same
    string-mediated conversion + one IEEE multiply), so the marked bin
    set is engine-identical.

    Output: group_cols + one double column per ``percentiles`` key.
    """
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    wd = F.col(weight_col).try_cast(DEC)
    bins = df.groupBy(*group_cols, v.alias("_v")).agg(F.sum(wd).alias("_bw"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = bins.select(
        *group_cols,
        "_v",
        _dec_to_double(F.sum("_bw").over(w_cum)).alias("_cumw"),
        _dec_to_double(F.sum("_bw").over(w_all)).alias("_w"),
    )
    aggs = [
        F.min(
            F.when(F.col("_cumw") >= F.col("_w") * F.lit(float(p)), F.col("_v"))
        ).alias(name)
        for name, p in percentiles.items()
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


def sql_weighted_percentile_ctes(
    source_sql: str,
    group_sql: str,
    value_sql: str,
    weight_sql: str,
) -> str:
    """Oracle ranked-CTE for :func:`weighted_group_percentiles`: exposes
    ``_v`` / ``_cumw`` / ``_w`` per row; the caller closes with
    ``MIN(CASE WHEN _cumw >= _w * CAST(p AS DOUBLE) THEN _v END)``
    aggregates grouped on the group columns."""
    wdec = f"TRY_CAST(CAST(({weight_sql}) AS VARCHAR) AS {SQL_DEC})"
    return f"""
bins AS (
  SELECT {group_sql}, CAST(({value_sql}) AS DOUBLE) AS _v,
         SUM({wdec}) AS _bw
  FROM ({source_sql}) WHERE ({value_sql}) IS NOT NULL
  GROUP BY {group_sql}, _v
),
ranked AS (
  SELECT {group_sql}, _v,
         CAST(CAST(SUM(_bw) OVER (
             PARTITION BY {group_sql} ORDER BY _v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS _cumw,
         CAST(CAST(SUM(_bw) OVER (
             PARTITION BY {group_sql}
           ) AS VARCHAR) AS DOUBLE) AS _w
  FROM bins
)"""
