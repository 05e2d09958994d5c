"""PCA over an embedding column: exact covariance matrix as a
distributed aggregation, eigendecomposition on the driver (d×d is
bounded state, like the k-means centroid collect), projection as pure
array expressions.

Scale design: the covariance pass explodes each vector to its d²/2
upper-triangle second-moment products — a big fanout, but every product
reduces MAP-SIDE into at most d(d+1)/2 cells per task, so the shuffle
carries O(#tasks · d²), never O(n·d²). The only driver-side state is the
d×d matrix (64×64 here) and the k eigenvectors — the same bounded-collect
contract as ``operators/similarity.ivf_centroids``. Projection inlines
the components as literal arrays (zero per-row Python, the
``random_projection`` pattern).

Cross-engine determinism: second moments and per-dimension sums ride the
exact-decimal fold, and the covariance closing arithmetic
``(Sxy - Sx·Sy/n) / (n-1)`` is a fixed IEEE sequence — the covariance
matrix carries a bit-exact DuckDB oracle. The eigendecomposition itself
(LAPACK) is NOT oracle-able and lives behind pytest properties
(orthonormality, decreasing explained variance, reconstruction bound)
plus a deterministic sign convention so repeated runs agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import DEC, _dec_to_double


def covariance_matrix(
    df: DataFrame, vec_col: str, include_sums: bool = False
) -> DataFrame:
    """Upper-triangle sample covariance of an ``array<float|double>``
    column: rows (dim_i, dim_j, n, cov) with dim_i <= dim_j (0-based);
    ``include_sums=True`` adds the per-cell exact-decimal sums
    (sx_i, sx_j) so callers (pca_components) can derive means without a
    second corpus pass.

    One explode chain produces (i, x_i, j, x_j) products for j >= i;
    they hash-aggregate into d(d+1)/2 cells (map-side combined). ALL
    four sufficient statistics of a cell — n, Σxy, Σxi, Σxj — are gated
    on the SAME per-row validity (every decimal try_cast non-null):
    counting a NaN-product row while its product nulls out of Σxy would
    yield a plausible-looking but wrong covariance, invisible to the
    oracle because the old COUNT(*) mirrored the bias (r07 review; the
    davg precedent). Closing arithmetic:
    cov = (Sxy - Sxi*Sxj/n) / (n-1), fixed IEEE order — on NaN-free
    data the per-cell Σxi equals the old global per-dimension sum, so
    results are bit-unchanged.
    """
    v = F.col(vec_col).cast("array<double>")
    ex1 = df.select(v.alias("_v")).select(
        F.posexplode("_v").alias("i", "xi"), F.col("_v")
    )
    pairs = ex1.select(
        "i", "xi", F.posexplode("_v").alias("j", "xj")
    ).filter(F.col("j") >= F.col("i"))
    xi_dec = F.col("xi").try_cast(DEC)
    xj_dec = F.col("xj").try_cast(DEC)
    p_dec = (F.col("xi") * F.col("xj")).try_cast(DEC)
    ok = xi_dec.isNotNull() & xj_dec.isNotNull() & p_dec.isNotNull()
    moments = pairs.groupBy("i", "j").agg(
        F.sum(F.when(ok, p_dec)).alias("_sxy"),
        F.count(F.when(ok, F.lit(1))).alias("_n"),
        F.sum(F.when(ok, xi_dec)).alias("_sxi"),
        F.sum(F.when(ok, xj_dec)).alias("_sxj"),
    )
    n_d = F.col("_n").cast("double")
    sxy = _dec_to_double(F.col("_sxy"))
    sxi = _dec_to_double(F.col("_sxi"))
    sxj = _dec_to_double(F.col("_sxj"))
    cov = F.when(
        F.col("_n") >= 2, (sxy - (sxi * sxj) / n_d) / (n_d - F.lit(1.0))
    )
    extra = (
        [F.col("_sxi").alias("sx_i"), F.col("_sxj").alias("sx_j")]
        if include_sums
        else []
    )
    return moments.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        F.col("_n").cast("long").alias("n"),
        cov.alias("cov"),
        *extra,
    )


def sql_covariance_ctes(dims: int, vec_sql: str = "embedding") -> str:
    """DuckDB CTE chain replaying :func:`covariance_matrix` over
    ``embeddings`` operation-for-operation; yields relation ``covmat``
    with (dim_i, dim_j, n, cov), 0-based dims."""
    dec = "DECIMAL(38,18)"
    d2d = lambda e: f"CAST(CAST(({e}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
vecs AS (
  SELECT list_transform({vec_sql}, x -> x::DOUBLE) AS v FROM embeddings
),
dims AS (SELECT UNNEST(range({dims})) AS d),
pairs AS (
  SELECT di.d AS i, dj.d AS j,
         v[di.d + 1] AS xi, v[dj.d + 1] AS xj,
         v[di.d + 1] * v[dj.d + 1] AS p
  FROM vecs CROSS JOIN dims di CROSS JOIN dims dj
  WHERE dj.d >= di.d
),
gated AS (
  SELECT i, j,
         TRY_CAST(CAST(xi AS VARCHAR) AS {dec}) AS xi_d,
         TRY_CAST(CAST(xj AS VARCHAR) AS {dec}) AS xj_d,
         TRY_CAST(CAST(p AS VARCHAR) AS {dec}) AS p_d
  FROM pairs
),
moments AS (
  SELECT i, j,
         SUM(CASE WHEN xi_d IS NOT NULL AND xj_d IS NOT NULL
                   AND p_d IS NOT NULL THEN p_d END) AS sxy,
         COUNT(CASE WHEN xi_d IS NOT NULL AND xj_d IS NOT NULL
                     AND p_d IS NOT NULL THEN 1 END) AS n,
         SUM(CASE WHEN xi_d IS NOT NULL AND xj_d IS NOT NULL
                   AND p_d IS NOT NULL THEN xi_d END) AS sxi,
         SUM(CASE WHEN xi_d IS NOT NULL AND xj_d IS NOT NULL
                   AND p_d IS NOT NULL THEN xj_d END) AS sxj
  FROM gated GROUP BY i, j
),
covmat AS (
  SELECT m.i AS dim_i, m.j AS dim_j, CAST(m.n AS BIGINT) AS n,
         (CASE WHEN m.n >= 2 THEN
            ({d2d('m.sxy')} - ({d2d('m.sxi')} * {d2d('m.sxj')})
               / CAST(m.n AS DOUBLE))
            / (CAST(m.n AS DOUBLE) - CAST(1.0 AS DOUBLE)) END) AS cov
  FROM moments m
)"""


def pca_components(df: DataFrame, vec_col: str, k: int):
    """Top-k principal components from the exact covariance matrix.

    Returns (means: list[float], components: list[list[float]],
    eigenvalues: list[float]), eigenvalues descending. Driver-side cost
    is the d×d collect + LAPACK eigh — bounded by dimensionality, never
    by n. Sign convention: each component is flipped so its
    largest-|entry| coordinate is positive (first index on ties), making
    repeated runs and resumed pipelines agree."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, include_sums=True).collect()
    if not rows:
        raise ValueError("pca_components: empty input")
    d = max(r.dim_j for r in rows) + 1
    if not (0 < k <= d):
        raise ValueError(f"k must be in 1..{d}, got {k}")
    c = np.zeros((d, d))
    means = [0.0] * d
    for r in rows:
        c[r.dim_i, r.dim_j] = r.cov if r.cov is not None else 0.0
        c[r.dim_j, r.dim_i] = c[r.dim_i, r.dim_j]
        # means from the DIAGONAL cells' gated sums — no second corpus
        # pass, and the count excludes NaN/Inf rows exactly like the sum
        # (the old separate explode counted them, biasing the centering)
        if r.dim_i == r.dim_j and r.n:
            means[r.dim_i] = float(r.sx_i) / r.n
    w, vecs = np.linalg.eigh(c)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        comp = vecs[:, idx]
        j = int(np.argmax(np.abs(comp)))
        if comp[j] < 0:
            comp = -comp
        comps.append([float(x) for x in comp])
        eigs.append(float(w[idx]))
    return means, comps, eigs


def project_components(
    df: DataFrame,
    vec_col: str,
    means: list[float],
    comps: list[list[float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each vector onto PRE-FITTED components: output (id_col,
    pc0..pc{k-1}). Components and means inline as literal arrays — the
    projection is a zip_with fold per component, zero Python on the hot
    path (the random_projection pattern). Split from :func:`pca_project`
    so callers that already hold the model (invariant checks, resumed
    pipelines, train-once/apply-many flows) pay no second covariance
    pass."""
    v = F.col(vec_col).cast("array<double>")
    mean_lit = F.array(*[F.lit(m) for m in means])
    centered = F.zip_with(v, mean_lit, lambda x, m: x - m)
    cols = []
    for p, comp in enumerate(comps):
        comp_lit = F.array(*[F.lit(c) for c in comp])
        prod = F.zip_with(centered, comp_lit, lambda x, c: x * c)
        cols.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x).alias(f"pc{p}")
        )
    return df.select(F.col(id_col), *cols)


def pca_project(
    df: DataFrame, vec_col: str, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Fit-and-project convenience: top-k components from the exact
    covariance pass, then :func:`project_components`."""
    means, comps, _ = pca_components(df, vec_col, k)
    return project_components(df, vec_col, means, comps, id_col)
