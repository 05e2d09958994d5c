"""Johnson–Lindenstrauss random projection (sign matrix, seeded by md5).

The cheap half of the dimensionality-reduction pair: PCA
(``operators/pca.py``) spends a distributed covariance pass to find the
best k directions; JL projection spends NOTHING — a fixed ±1 sign
matrix preserves all pairwise distances to 1±ε with k = O(log n / ε²)
[Achlioptas 2003's database-friendly variant of Johnson–Lindenstrauss],
which is what a 100 TB pipeline uses to shrink embeddings before LSH
bucketing or brute-force re-ranking when no training pass is affordable.

Determinism/oracle discipline: the sign matrix is derived host-side
from md5 over the (row, component) index pair — no RNG state, identical
on every run and every engine — and inlined into the plan as literals.
Each output component is a FIXED left-to-right chain of IEEE adds over
exactly widened float→double elements, scaled by a power of two
(2⁻ⁿ when k = 4ⁿ — exact), so the DuckDB replay built from the same
sign table is bit-exact. No explode, no shuffle, no Python per row:
the projection is a pure codegen'd map stage.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 for matrix cell (input dim i, output component j)."""
    h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def _check_scale(k: int) -> float:
    # 1/sqrt(k) must be a power of two for the scale multiply to be
    # exact; k in {1, 4, 16, 64, 256, ...} qualifies.
    s = 1.0 / (k**0.5)
    if k & (k - 1) or (k.bit_length() - 1) % 2:
        raise ValueError(f"k={k} is not a power of 4; 1/sqrt(k) inexact")
    return s


def jl_project(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    k: int,
    prefix: str = "rp_",
) -> DataFrame:
    """Append ``k`` projected components ``{prefix}00..`` (doubles) of
    the ``in_dim``-wide float-array ``vec_col``, scaled by 1/sqrt(k)
    (k must be a power of 4 so the scale is exact).

    An in-plan dims guard raises on any vector whose length differs from
    ``in_dim`` (r07 review): shorter vectors made element_at return NULL
    — every component silently all-NULL — and longer ones were silently
    truncated, breaking the distance-preservation contract. NULL vectors
    pass through with NULL components (no geometry)."""
    if k < 1 or in_dim < 1:
        raise ValueError(f"jl_project: k={k} and in_dim={in_dim} must be >= 1")
    scale = _check_scale(k)
    vec = F.col(vec_col)
    guard_ok = F.when(
        vec.isNull() | (F.size(vec) == in_dim), F.lit(True)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"jl_project: expected {in_dim}-dim vectors, got "),
                F.coalesce(F.size(vec).cast("string"), F.lit("NULL")),
            )
        ).cast("boolean")
    )
    v = [F.element_at(vec, i + 1).cast("double") for i in range(in_dim)]
    cols: list[Column] = []
    for j in range(k):
        terms = [v[i] if jl_sign(i, j) > 0 else -v[i] for i in range(in_dim)]
        acc = reduce(lambda a, b: a + b, terms)
        cols.append((acc * F.lit(scale)).alias(f"{prefix}{j:02d}"))
    return df.filter(guard_ok).select("*", *cols)


def sql_jl_exprs(
    vec_sql: str, in_dim: int, k: int, prefix: str = "rp_"
) -> list[str]:
    """DuckDB twin of :func:`jl_project` — one select-list expression per
    component, built from the SAME sign table (1-indexed array access)."""
    scale = _check_scale(k)
    out = []
    for j in range(k):
        chain = ""
        for i in range(in_dim):
            term = f"CAST(({vec_sql})[{i + 1}] AS DOUBLE)"
            if not chain:
                chain = term if jl_sign(i, j) > 0 else f"(- {term})"
            else:
                chain = f"({chain} {'+' if jl_sign(i, j) > 0 else '-'} {term})"
        out.append(f"({chain} * {scale!r}) AS {prefix}{j:02d}")
    return out
