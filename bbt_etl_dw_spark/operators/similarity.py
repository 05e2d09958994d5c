"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Queries broadcast against the corpus; per-pair math is a pure array
  expression (zip_with product + exact decimal fold), so results are
  bit-reproducible and oracle-checkable.
- ``lsh_topk``: the scale path — random-hyperplane bucketing prunes the
  corpus before exact re-ranking. Hyperplanes are derived from
  xxhash64(plane, dim) signs: deterministic, no stored model, identical on
  every executor. At 100TB, bucket probing turns an O(N·Q) scan into
  O(N/2^planes · Q) with a single shuffle on bucket keys.
- An IVF-style variant would replace the hash planes with k-means
  centroids; the probe/re-rank plumbing here is unchanged.

Dot products fold into DECIMAL(38,18) via the string-mediated conversion
(see functions/numeric.py) so sums are order-independent and match the
SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fold accumulator: 7 integer digits / 18 fractional. Spark's decimal
# addition widens precision and SHRINKS scale when p would exceed 38
# ((38,18)+(38,18) -> (38,17), silently rounding the 18th digit), so the
# fold keeps precision low enough that each add stays exact and casts back
# to the declared type losslessly. |element products| < 1e7 by contract.
DEC = "decimal(25,18)"


def _dec_fold_sum(arr: Column) -> Column:
    """Exact sum of an array<double> via string-mediated decimal fold,
    returned as double (same discipline as functions/numeric.dsum)."""
    total = F.aggregate(
        arr,
        F.lit("0").cast(DEC),
        # direct double->decimal is bit-identical to the string-mediated
        # hop on the Spark side (see functions/numeric._dec) and much
        # cheaper inside a per-element fold
        lambda acc, x: (acc + x.try_cast(DEC)).cast(DEC),
    )
    return total.cast("string").cast("double")


def dot_expr(a: Column, b: Column) -> Column:
    return _dec_fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm_expr(a: Column) -> Column:
    return F.sqrt(_dec_fold_sum(F.zip_with(a, a, lambda x, y: x * y)))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine over array<double> columns (cast float vecs first: float
    arithmetic differs across engines, double is IEEE-identical)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set across the corpus,
    rank per query (deterministic tie-break on corpus id)."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "corpus_id",
        cosine_expr(F.col("cv"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def hyperplane_signature(vec: Column, planes: int = 16, seed: int = 0) -> Column:
    """LSH bucket id: sign pattern of ``planes`` pseudo-random hyperplanes.
    Plane p's coefficient for dimension d is ±1 from xxhash64(seed, p, d) —
    deterministic everywhere, never materialized. ``seed`` yields an
    independent hyperplane family per LSH table."""
    def plane_bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: F.when(
                    F.xxhash64(F.lit(seed), F.lit(p), d).bitwiseAND(F.lit(1)) == 1, x
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    out = plane_bit(0)
    for p in range(1, planes):
        out = out.bitwiseOR(plane_bit(p))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH with exact re-rank.

    ``tables`` independent hyperplane families each bucket the corpus; a
    candidate pair is scored iff it collides in >=1 table. For per-plane
    collision prob p = 1 - θ/π, recall is 1-(1-p^planes)^tables — tables
    drive recall up, planes drive candidate-set size down. At scale this is
    one explode (tables× row fan-out), one shuffle on (table, bucket), a
    pair-dedup, and a per-query top-k window over candidates only — never
    the O(N·Q) full cross product."""
    def with_buckets(df: DataFrame, in_id: str, out_id: str, vec_alias: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_signature(v, planes, seed=t).alias("bucket"),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(in_id).alias(out_id), v.alias(vec_alias), F.explode(sigs).alias("s")
        ).select(out_id, vec_alias, F.col("s.tbl").alias("tbl"), F.col("s.bucket").alias("bucket"))

    c = with_buckets(corpus, id_col, "corpus_id", "cv")
    q = with_buckets(queries, query_id_col, "query_id", "qv")
    scored = (
        c.join(q, ["tbl", "bucket"])
        .dropDuplicates(["query_id", "corpus_id"])  # collide in >=1 table => score once
        .select(
            "query_id", "corpus_id", cosine_expr(F.col("cv"), F.col("qv")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
