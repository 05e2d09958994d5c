"""Similarity-search suite over the embeddings table (array<float>, 64-d).

Brute-force cosine top-k is the oracle-checked baseline (exact decimal
dot products => bit-identical ranks); LSH-bucketed ANN and cosine near-dup
are the scale paths, rows-only with pytest recall tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.dedup import cosine_near_dups
from bbt_etl_dw_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    norm_expr,
)
from bbt_etl_dw_spark.suite import register
from bbt_etl_dw_spark.suite import zsum as _zsum

# Exact decimal sum of per-element products, as double (twin of
# operators/similarity._dec_fold_sum) — see functions/numeric.py for why
# every conversion is string-mediated.
_DOT_SQL = (
    "CAST(CAST(SUM(TRY_CAST(CAST(p AS VARCHAR) AS DECIMAL(25,18))) AS VARCHAR) AS DOUBLE)"
)


_NORMS_ORACLE = f"""
WITH prods AS (
    SELECT vec_id, UNNEST(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS p
    FROM embeddings
)
SELECT vec_id, sqrt({_DOT_SQL}) AS l2_norm
FROM prods GROUP BY vec_id ORDER BY vec_id
"""


@register("embedding_norms", oracle=_NORMS_ORACLE)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms of the embedding column — the array-fold primitive under
    all similarity ops, exact and oracle-checked."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return emb.select(
        "vec_id",
        norm_expr(F.col("embedding").cast("array<double>")).alias("l2_norm"),
    ).orderBy("vec_id")


_TOPK_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
), pairs AS (
    SELECT e.vec_id AS corpus_id, q.query_id,
           UNNEST(list_transform(range(1, len(e.embedding) + 1),
                                 i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) AS p,
           UNNEST(list_transform(range(1, len(e.embedding) + 1),
                                 i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) AS pc,
           UNNEST(list_transform(range(1, len(e.embedding) + 1),
                                 i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)) AS pq
    FROM embeddings e CROSS JOIN q
), scored AS (
    SELECT query_id, corpus_id,
           {_DOT_SQL} /
           (sqrt(CAST(CAST(SUM(TRY_CAST(CAST(pc AS VARCHAR) AS DECIMAL(25,18))) AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(SUM(TRY_CAST(CAST(pq AS VARCHAR) AS DECIMAL(25,18))) AS VARCHAR) AS DOUBLE))) AS cosine
    FROM pairs GROUP BY query_id, corpus_id
), ranked AS (
    SELECT query_id, corpus_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS BIGINT) AS rank
    FROM scored
)
SELECT query_id, corpus_id, cosine, rank FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank
"""


@register("ann_bruteforce_topk", oracle=_TOPK_ORACLE, bench=True)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors against the whole corpus:
    broadcast queries, per-pair array-fold cosine, partitioned rank window.
    The correctness baseline every ANN variant is measured against."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10).orderBy("query_id", "rank")


@register("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH buckets (8 planes) with
    exact re-rank inside the bucket. Hash-derived hyperplanes are
    Spark-native => rows-only; recall vs brute force asserted in pytest."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, planes=8).orderBy("query_id", "rank")


@register("ann_ivf_topk", oracle=None)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: deterministic hash-seeded k-means centroids
    (exact-decimal Lloyd steps), corpus bucketed into inverted lists, each
    query probes its 4 nearest of 16 lists with exact cosine re-rank.
    Rows-only; recall vs brute force asserted in pytest."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=10, nlist=16, nprobe=4).orderBy("query_id", "rank")


@register("embedding_cosine_near_dups", oracle=None)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane LSH
    buckets -> exact cosine verify. The embedding-space analog of MinHash.
    Threshold 0.45 because this corpus's max off-diagonal cosine is ~0.52 —
    a 0.95 threshold would be vacuously empty and prove nothing. At 0.45
    (p≈0.65 per plane) the family must be shallow-and-wide: 4 planes x 16
    tables => per-pair recall ≈ 1-(1-0.65^4)^16 ≈ 0.95 at the threshold
    (higher above it); pytest asserts recall vs the exact all-pairs oracle."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return cosine_near_dups(
        emb, "vec_id", "embedding", threshold=0.45, planes=4, tables=16
    ).orderBy("id_a", "id_b")


def _exact_pairs_sql(threshold: float) -> str:
    return f"""
WITH prods AS (
    SELECT vec_id, UNNEST(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS p
    FROM embeddings
), norms AS (
    SELECT vec_id, sqrt({_DOT_SQL}) AS nrm FROM prods GROUP BY vec_id
), pairprods AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           UNNEST(list_transform(range(1, len(a.embedding) + 1),
                                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS p
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
), dots AS (
    SELECT id_a, id_b, {_DOT_SQL} AS dot FROM pairprods GROUP BY id_a, id_b
)
SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE d.dot / (na.nrm * nb.nrm) >= {threshold}
ORDER BY id_a, id_b
"""


_EXACT_PAIRS_ORACLE = _exact_pairs_sql(0.4)


@register("embedding_cosine_exact_pairs", oracle=_EXACT_PAIRS_ORACLE)
def embedding_cosine_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine >= 0.4 (the testdata corpus has no pairs
    above 0.52, so the near-dup 0.95 threshold would be vacuous) — the
    value-checked ground truth under every approximate similarity path."""
    from bbt_etl_dw_spark.operators.similarity import exact_cosine_pairs

    emb = table(spark, sf_dir, "embeddings", spread=True)
    return exact_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


# Same precision-via-exact-set trick as minhash_pairs_precision (VERDICT
# r02 #3): the LSH candidate generation is hash-derived, but every pair it
# emits must appear in the SQL-expressible exact all-pairs set at the same
# threshold with a bit-identical cosine. has_pairs derives from the exact
# set, so total recall collapse also reds the row.
_COS_PRECISION_ORACLE = f"""
WITH exact AS ({_exact_pairs_sql(0.45)})
SELECT (SELECT COUNT(*) FROM exact) > 0 AS has_pairs,
       CAST(0 AS BIGINT) AS n_false_positives,
       CAST(0 AS BIGINT) AS n_value_mismatches
"""


@register("cosine_pairs_precision", oracle=_COS_PRECISION_ORACLE)
def cosine_pairs_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver verification for the hyperplane-LSH cosine
    near-dup path: emitted pairs LEFT JOIN the exact all-pairs set at the
    same 0.45 threshold — zero pairs outside it, zero cosine value
    disagreements. Recall stays pytest-asserted (>=0.9 by design)."""
    from bbt_etl_dw_spark.operators.similarity import exact_cosine_pairs

    emb = table(spark, sf_dir, "embeddings", spread=True)
    emitted = cosine_near_dups(
        emb, "vec_id", "embedding", threshold=0.45, planes=4, tables=16
    )
    exact = exact_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).withColumnRenamed(
        "cosine", "exact_cosine"
    )
    return emitted.join(exact, ["id_a", "id_b"], "left").agg(
        (F.count(F.lit(1)) > 0).alias("has_pairs"),
        _zsum(F.col("exact_cosine").isNull(), "n_false_positives"),
        _zsum(
            F.col("exact_cosine").isNotNull()
            & (F.col("cosine") != F.col("exact_cosine")),
            "n_value_mismatches",
        ),
    )


# ANN result correctness is SQL-checkable pairwise even though the bucket
# pruning is not: each reported (query, neighbor, cosine) must reproduce
# when the cosine is recomputed through an INDEPENDENT plan (plain id
# joins back to the vectors — no buckets, no centroid probing), ranks must
# be contiguous with non-increasing cosine, and with no duplicate vectors
# in the corpus each query's rank-1 hit must be itself (queries are drawn
# from the corpus). n_queries = 5 is exact: a query always collides with
# its own bucket / its own inverted list, so no query can vanish.
_ANN_CHECK_ORACLE = """
SELECT CAST(5 AS BIGINT) AS n_queries,
       CAST(0 AS BIGINT) AS n_score_mismatches,
       CAST(0 AS BIGINT) AS n_rank_violations,
       CAST(0 AS BIGINT) AS n_self_top1_misses
"""


def _ann_result_check(res: DataFrame, emb: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    from bbt_etl_dw_spark.operators.similarity import cosine_expr

    vecs = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    j = (
        res.join(
            vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")),
            "query_id",
        )
        .join(
            vecs.select(F.col("vec_id").alias("corpus_id"), F.col("v").alias("cv")),
            "corpus_id",
        )
        .withColumn("exact_cosine", cosine_expr(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn("prev_cos", F.lag("cosine").over(w)).withColumn(
        "prev_rank", F.lag("rank").over(w)
    )
    return j.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        _zsum(F.col("cosine") != F.col("exact_cosine"), "n_score_mismatches"),
        _zsum(
            F.when(
                F.col("prev_rank").isNull(), F.col("rank") != 1
            ).otherwise(
                (F.col("rank") != F.col("prev_rank") + 1)
                | (F.col("cosine") > F.col("prev_cos"))
            ),
            "n_rank_violations",
        ),
        _zsum(
            (F.col("rank") == 1) & (F.col("corpus_id") != F.col("query_id")),
            "n_self_top1_misses",
        ),
    )


@register("ann_lsh_precision", oracle=_ANN_CHECK_ORACLE)
def ann_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver verification for lsh_topk: reported cosines must
    reproduce via an independent no-LSH recompute; ranks contiguous and
    monotone; every query present with itself at rank 1."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _ann_result_check(lsh_topk(emb, queries, k=10, planes=8), emb)


@register("ann_ivf_precision", oracle=_ANN_CHECK_ORACLE)
def ann_ivf_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver verification for ivf_topk: reported cosines must
    reproduce via an independent no-IVF recompute; ranks contiguous and
    monotone; every query present with itself at rank 1."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _ann_result_check(ivf_topk(emb, queries, k=10, nlist=16, nprobe=4), emb)


@register("embedding_kmeans_clusters", oracle=None)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means clustering of the corpus (the IVF trainer used
    directly as a clustering operator): hash-seeded centroids, 2
    exact-decimal Lloyd steps, per-cluster sizes. Rows-only (xxhash seeds
    are Spark-native); determinism follows from the exact-decimal means —
    identical clusters at any parallelism."""
    from bbt_etl_dw_spark.operators.similarity import assign_centroid, ivf_centroids

    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents = ivf_centroids(emb, nlist=8, iters=2)
    v = F.col("embedding").cast("array<double>")
    return (
        emb.select(assign_centroid(v, cents).alias("cluster_id"))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster_id")
    )
