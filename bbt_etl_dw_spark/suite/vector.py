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
    "CAST(CAST(SUM(TRY_CAST(CAST(p AS VARCHAR) AS DECIMAL(35,18))) AS VARCHAR) AS DOUBLE)"
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
           (sqrt(CAST(CAST(SUM(TRY_CAST(CAST(pc AS VARCHAR) AS DECIMAL(35,18))) AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(SUM(TRY_CAST(CAST(pq AS VARCHAR) AS DECIMAL(35,18))) AS VARCHAR) AS DOUBLE))) AS cosine
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


# --------------------------------------------------------------------------
# Full-pipeline oracle SQL builders. The md5-derived hyperplane family and
# md5-seeded exact-decimal k-means make every approximate path REPLAYABLE
# in DuckDB, so the emitters below carry their own value-level oracles
# (signature, bucketing, candidate generation, re-rank — recall included)
# instead of rows-only rows plus a precision companion.
# --------------------------------------------------------------------------


def _dsum(expr: str) -> str:
    """Exact decimal sum of a double expression, as double (the SQL twin
    of operators/similarity._dec_fold_sum — string-mediated both ways)."""
    return (
        f"CAST(CAST(SUM(TRY_CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(35,18)))"
        " AS VARCHAR) AS DOUBLE)"
    )


def _hyperplane_sig_ctes(tables: int, planes: int) -> str:
    """CTE chain producing hsig(vec_id, tbl, bucket): md5-hex-parity ±1
    coefficients and a SEQUENTIAL in-row double fold (list_reduce — the
    same element order as the Spark side's array fold, hence bit-identical
    projections) with sign-bit bucket assembly — the SQL replay of
    operators/similarity.hyperplane_signature."""
    return f"""
hplane AS (
  SELECT vec_id, tt.tbl, pp.p,
         list_reduce(list_transform(range(1, len(embedding)+1),
           i -> CASE WHEN CAST(('0x'||substring(md5(tt.tbl||'_'||pp.p||'_'||(i-1)),1,1)) AS INT) % 2 = 1
                THEN embedding[i]::DOUBLE ELSE -(embedding[i]::DOUBLE) END),
           (a, b) -> a + b) AS pr
  FROM embeddings
  CROSS JOIN range(0, {tables}) AS tt(tbl)
  CROSS JOIN range(0, {planes}) AS pp(p)
),
hsig AS (
  SELECT vec_id, tbl,
         CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM hplane GROUP BY vec_id, tbl
)"""


def _topk_rerank_tail(k: int) -> str:
    """Exact-decimal cosine re-rank over cand(query_id, corpus_id) — the
    same formulation as the brute-force _TOPK_ORACLE, restricted to the
    candidate set."""
    return f"""
cpairs AS (
  SELECT c.query_id, c.corpus_id,
         UNNEST(list_transform(range(1, len(e.embedding)+1),
                               i -> e.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) AS p,
         UNNEST(list_transform(range(1, len(e.embedding)+1),
                               i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) AS pc,
         UNNEST(list_transform(range(1, len(e.embedding)+1),
                               i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) AS pq
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.corpus_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
cscored AS (
  SELECT query_id, corpus_id,
         {_dsum("p")} / (sqrt({_dsum("pc")}) * sqrt({_dsum("pq")})) AS cosine
  FROM cpairs GROUP BY query_id, corpus_id
),
cranked AS (
  SELECT query_id, corpus_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS BIGINT) AS rank
  FROM cscored
)
SELECT query_id, corpus_id, cosine, rank FROM cranked
WHERE rank <= {k} ORDER BY query_id, rank"""


_LSH_TOPK_ORACLE = f"""
WITH {_hyperplane_sig_ctes(tables=4, planes=8)},
q AS (SELECT vec_id AS query_id, tbl, bucket FROM hsig WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS corpus_id
  FROM q JOIN hsig c ON c.tbl = q.tbl AND c.bucket = q.bucket
),
{_topk_rerank_tail(k=10)}
"""


@register("ann_lsh_topk", oracle=_LSH_TOPK_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH buckets (8 planes, 4
    tables) with exact re-rank inside the bucket. The md5-derived
    coefficient family is cross-engine reproducible, so the oracle replays
    the ENTIRE pipeline (buckets, candidates, re-rank) value-for-value —
    recall behavior included, not just precision."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, planes=8).orderBy("query_id", "rank")


def _ivf_ctes(
    nlist: int,
    iters: int,
    train_pred: str | None = None,
    vec_expr: str = "embedding",
    prefix: str = "",
) -> tuple[str, str]:
    """CTE chain for deterministic md5-seeded k-means: seeds, ``iters``
    unrolled Lloyd steps, one final distance pass. Distances are
    SEQUENTIAL in-row double folds (list_reduce — same element order as
    the Spark side's array fold => bit-identical); the Lloyd MEANS are
    cross-row aggregates and therefore use the exact-decimal discipline,
    mirroring operators/similarity.ivf_centroids. Returns (ctes,
    final_dist_cte_name) where the final pass d{{iters+1}} holds
    (vec_id, cid, dist) against the trained centroids — argmin gives the
    corpus assignment, top-nprobe gives a query's probe list.

    ``train_pred`` (a SQL predicate over ``vec_id``) restricts TRAINING —
    seeds and every Lloyd step — to the matching sample, while the final
    assignment pass still covers the full corpus: the replay of
    sample-trained k-means (operators/similarity.ivf_centroids on a
    filtered corpus + assign_centroid on the full one)."""

    def n(x: str) -> str:
        # CTE names take the prefix so several chains (e.g. one per PQ
        # subspace) can coexist in a single WITH clause.
        return f"{prefix}{x}"

    def dist(c: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, len(v.e)+1),"
            f" i -> (v.e[i] - {c}.ce[i]) * (v.e[i] - {c}.ce[i])), (a, b) -> a + b)"
        )

    # Training relation: the full corpus, or the sampled subset (aliased
    # back to ``v`` in FROM clauses so the shared dist() text applies).
    train = n("v") if train_pred is None else n("vt")
    ctes = f"""
{n("v")} AS (SELECT vec_id, list_transform({vec_expr}, x -> x::DOUBLE) AS e FROM embeddings),"""
    if train_pred is not None:
        ctes += f"""
{n("vt")} AS (SELECT * FROM {n("v")} WHERE {train_pred}),"""
    seed_src = (
        "embeddings"
        if train_pred is None
        else f"(SELECT * FROM embeddings WHERE {train_pred})"
    )
    ctes += f"""
{n("mx")} AS (
  SELECT vec_id,
         UNNEST(range(1, len(e)+1)) AS pos,
         UNNEST(e) AS x
  FROM {train}
),
{n("seeds")} AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid, vec_id
  FROM {seed_src} ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {nlist}
),
{n("c0")} AS (SELECT s.cid, v.e AS ce FROM {n("seeds")} s JOIN {n("v")} v USING (vec_id))"""
    prev = n("c0")
    for it in range(1, iters + 1):
        ctes += f""",
{n(f"d{it}")} AS (
  SELECT v.vec_id, {prev}.cid, {dist(prev)} AS dist
  FROM {train} AS v CROSS JOIN {prev}
),
{n(f"a{it}")} AS (
  SELECT vec_id, cid FROM {n(f"d{it}")}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
{n(f"m{it}")} AS (
  SELECT {n(f"a{it}")}.cid, {n("mx")}.pos, {_dsum(f'{n("mx")}.x')} / COUNT({n("mx")}.x) AS cx
  FROM {n("mx")} JOIN {n(f"a{it}")} USING (vec_id) GROUP BY {n(f"a{it}")}.cid, {n("mx")}.pos
),
{n(f"c{it}")} AS (
  SELECT cid, list(cx ORDER BY pos) AS ce FROM {n(f"m{it}")} GROUP BY cid
  UNION ALL
  SELECT cid, ce FROM {prev}
  WHERE cid NOT IN (SELECT DISTINCT cid FROM {n(f"a{it}")})
)"""
        prev = n(f"c{it}")
    fin = iters + 1
    ctes += f""",
{n(f"d{fin}")} AS (
  SELECT v.vec_id, {prev}.cid, {dist(prev)} AS dist
  FROM {n("v")} AS v CROSS JOIN {prev}
)"""
    return ctes, n(f"d{fin}")


def _ivf_topk_oracle(nlist: int, iters: int, nprobe: int, k: int) -> str:
    ctes, dfin = _ivf_ctes(nlist, iters)
    return f"""
WITH {ctes},
afin AS (
  SELECT vec_id, cid FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
probe AS (
  SELECT vec_id AS query_id, cid FROM {dfin}
  WHERE vec_id < 5
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS corpus_id
  FROM probe p JOIN afin a ON a.cid = p.cid
),
{_topk_rerank_tail(k=k)}
"""


_IVF_TOPK_ORACLE = _ivf_topk_oracle(nlist=16, iters=2, nprobe=4, k=10)


@register("ann_ivf_topk", oracle=_IVF_TOPK_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: deterministic md5-seeded k-means centroids
    (exact-decimal Lloyd steps AND distances), corpus bucketed into
    inverted lists, each query probes its 4 nearest of 16 lists with exact
    cosine re-rank. The oracle replays the whole trainer + probe: seeds,
    both Lloyd iterations, final assignment, probing, re-rank."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=10, nlist=16, nprobe=4).orderBy("query_id", "rank")


# The candidate set is ~100x the surviving pair set, so the oracle mirrors
# the engine's own double-prescreen + exact-finish discipline: plain double
# sums (cheap) prune candidates with a 1e-6 safety margin (double-sum error
# is ~1e-14 — no exact-passing pair can be dropped), and the expensive
# string-mediated exact-decimal cosine runs only on survivors, where the
# final >= 0.45 filter is applied identically to the Spark side.
_COS_NEAR_DUP_ORACLE = f"""
WITH {_hyperplane_sig_ctes(tables=16, planes=4)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM hsig a JOIN hsig b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
fpairs AS (
  SELECT c.id_a, c.id_b,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) AS p,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE)) AS pa,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) AS pb
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
),
screened AS (
  SELECT id_a, id_b FROM fpairs GROUP BY id_a, id_b
  HAVING SUM(p) / (sqrt(SUM(pa)) * sqrt(SUM(pb))) >= 0.45 - 1e-6
),
vpairs AS (
  SELECT s.id_a, s.id_b,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) AS p,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE)) AS pa,
         UNNEST(list_transform(range(1, len(ea.embedding)+1),
                               i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) AS pb
  FROM screened s
  JOIN embeddings ea ON ea.vec_id = s.id_a
  JOIN embeddings eb ON eb.vec_id = s.id_b
),
vscored AS (
  SELECT id_a, id_b,
         {_dsum("p")} / (sqrt({_dsum("pa")}) * sqrt({_dsum("pb")})) AS cosine
  FROM vpairs GROUP BY id_a, id_b
)
SELECT id_a, id_b, cosine FROM vscored
WHERE cosine >= 0.45 ORDER BY id_a, id_b
"""


@register("embedding_cosine_near_dups", oracle=_COS_NEAR_DUP_ORACLE)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane LSH
    buckets -> exact cosine verify. The embedding-space analog of MinHash.
    Threshold 0.45 because this corpus's max off-diagonal cosine is ~0.52 —
    a 0.95 threshold would be vacuously empty and prove nothing. At 0.45
    (p≈0.65 per plane) the family must be shallow-and-wide: 4 planes x 16
    tables => per-pair recall ≈ 1-(1-0.65^4)^16 ≈ 0.95 at the threshold
    (higher above it). The oracle replays buckets + candidates + exact
    verify end-to-end (the md5 coefficient family is SQL-reproducible)."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return cosine_near_dups(
        emb, "vec_id", "embedding", threshold=0.45, planes=4, tables=16
    ).orderBy("id_a", "id_b")


def _exact_pairs_sql(threshold: float) -> str:
    # double-prescreen (in-row list_reduce dot, ~100x cheaper than the
    # string-mediated decimal casts) with a 1e-6 margin no exact-passing
    # pair can slip through, exact-decimal finish on survivors only —
    # the engine's own exact_cosine_pairs discipline, mirrored.
    return f"""
WITH prods AS (
    SELECT vec_id, UNNEST(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS p
    FROM embeddings
), norms AS (
    SELECT vec_id, sqrt({_DOT_SQL}) AS nrm FROM prods GROUP BY vec_id
), screened AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    JOIN norms sna ON sna.vec_id = a.vec_id
    JOIN norms snb ON snb.vec_id = b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.embedding) + 1),
                                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                      (x, y) -> x + y) / (sna.nrm * snb.nrm) >= {threshold} - 1e-6
), pairprods AS (
    SELECT s.id_a, s.id_b,
           UNNEST(list_transform(range(1, len(a.embedding) + 1),
                                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS p
    FROM screened s
    JOIN embeddings a ON a.vec_id = s.id_a
    JOIN embeddings b ON b.vec_id = s.id_b
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

    from bbt_etl_dw_spark.operators.ckpt import materialize

    # res is k x queries rows (tiny): materialize it, collect the member
    # ids, and prune + materialize the vector side once — the two
    # re-check attaches below otherwise each re-scanned the full
    # embeddings table (r14 plan audit of the *_precision twins)
    res = materialize(res)
    ids = (
        res.select(F.col("query_id").alias("vec_id"))
        .unionByName(res.select(F.col("corpus_id").alias("vec_id")))
        .distinct()
    )
    vecs = materialize(
        emb.select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
        ).join(F.broadcast(ids), "vec_id", "left_semi")
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


# Per-(process, sf_dir) cache for the IVF inverted-list directory written
# by ann_ivf_partitioned_topk (see _DPP_FACT_CACHE in suite/classic.py).
_IVF_LISTS_CACHE: dict[str, str] = {}


@register("ann_ivf_partitioned_topk", oracle=_IVF_TOPK_ORACLE)
def ann_ivf_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 THROUGH the partitioned on-disk layout: the corpus is
    written ``partitionBy(cid)`` (the inverted lists as physical
    partitions), probes re-read it with a cid filter, and the builder
    RAISES unless that filter reaches the scan as a PartitionFilter — so
    this row is green only if partition pruning actually happened. Same
    result as ann_ivf_topk by construction (identical centroids, lists,
    probes); at 100TB this layout is what turns a probe into an
    nprobe/nlist-fraction scan instead of a full pass."""
    import os
    import tempfile

    from bbt_etl_dw_spark.operators.similarity import (
        assign_centroid,
        cosine_expr,
        ivf_centroids,
        probe_centroids,
    )
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents = ivf_centroids(emb, nlist=16, iters=2)
    v = F.col("embedding").cast("array<double>")
    # Per-PROCESS directory, cached per sf_dir with atexit cleanup (the
    # _DPP_FACT_CACHE pattern): per-process isolation still keeps a
    # concurrent run's overwrite away from this session's lazy scans,
    # while repeated suite enumerations reuse one write instead of
    # accumulating full embedding copies in /tmp.
    lists_path = _IVF_LISTS_CACHE.get(sf_dir)
    if lists_path is None:
        import atexit
        import shutil

        lists_path = tempfile.mkdtemp(
            prefix=f"bbt_ivf_lists_{os.path.basename(os.path.normpath(sf_dir))}_"
        )
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            v.alias("cvec"),
            assign_centroid(v, cents).alias("cid"),
        ).write.mode("overwrite").partitionBy("cid").parquet(lists_path)
        _IVF_LISTS_CACHE[sf_dir] = lists_path
        atexit.register(shutil.rmtree, lists_path, ignore_errors=True)

    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        v.alias("qv"),
        F.explode(probe_centroids(v, cents, nprobe=4)).alias("cid"),
    )
    probe_cids = sorted(r["cid"] for r in probes.select("cid").distinct().collect())

    lists = spark.read.parquet(lists_path)
    pruned = lists.filter(F.col("cid").isin(probe_cids))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters: [" not in plan or "cid" not in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]:
        raise AssertionError(
            "cid filter did not reach the scan as a PartitionFilter — "
            "partition pruning regressed:\n" + plan
        )

    scored = pruned.join(F.broadcast(probes), "cid").select(
        "query_id",
        "corpus_id",
        cosine_expr(F.col("cvec"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "corpus_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _kmeans_sizes_oracle(nlist: int, iters: int) -> str:
    ctes, dfin = _ivf_ctes(nlist, iters)
    return f"""
WITH {ctes},
afin AS (
  SELECT vec_id, cid FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)
SELECT CAST(cid AS INT) AS cluster_id, COUNT(*) AS n_vectors
FROM afin GROUP BY cid ORDER BY cid
"""


@register("embedding_kmeans_clusters", oracle=_kmeans_sizes_oracle(nlist=8, iters=2))
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means clustering of the corpus (the IVF trainer used
    directly as a clustering operator): md5-seeded centroids, 2
    exact-decimal Lloyd steps, per-cluster sizes. Determinism follows from
    the exact-decimal means and distances — identical clusters at any
    parallelism — and the oracle replays the full trainer in SQL."""
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


# --- sample-trained k-means (the 100 TB Lloyd-cost refinement) ------------
# Training cost dominates k-means at scale: every Lloyd step re-scans the
# corpus (and the means shuffle corpus×dim skinny rows). Training on a
# deterministic hash sample and assigning the full corpus ONCE cuts the
# iterative cost to the sample fraction while the assignment stays a
# single narrow map pass. The md5-prefix sample predicate is re-derivable
# by any engine, so the oracle replays sampled training + full assignment.

_SAMPLE_PRED_SQL = "md5(CAST(vec_id AS VARCHAR)) < '8'"  # ~50% of hex space


def _kmeans_sampled_oracle(nlist: int, iters: int) -> str:
    ctes, dfin = _ivf_ctes(nlist, iters, train_pred=_SAMPLE_PRED_SQL)
    return f"""
WITH {ctes},
afin AS (
  SELECT vec_id, cid FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)
SELECT CAST(cid AS INT) AS cluster_id,
       COUNT(*) AS n_vectors,
       CAST(SUM(CASE WHEN {_SAMPLE_PRED_SQL} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train
FROM afin GROUP BY cid ORDER BY cid
"""


@register("embedding_kmeans_sampled", oracle=_kmeans_sampled_oracle(nlist=8, iters=2))
def embedding_kmeans_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means with SAMPLE-BASED training: centroids are trained (seeds +
    Lloyd steps) only on the ~50% md5(vec_id) < '8' hash sample, then the
    FULL corpus is assigned in one narrow pass. At 100TB this is the
    difference between iters full-corpus shuffles and iters
    sample-fraction shuffles; per-cluster n_train makes the sample's
    footprint visible (and oracle-checked) in the output."""
    from bbt_etl_dw_spark.operators.similarity import assign_centroid, ivf_centroids

    emb = table(spark, sf_dir, "embeddings", spread=True)
    samp = F.md5(F.col("vec_id").cast("string")) < "8"
    cents = ivf_centroids(emb.filter(samp), nlist=8, iters=2)
    v = F.col("embedding").cast("array<double>")
    return (
        emb.select(
            assign_centroid(v, cents).alias("cluster_id"),
            samp.cast("long").alias("is_train"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("is_train").alias("n_train"),
        )
        .orderBy("cluster_id")
    )


# --- random-projection dimensionality reduction ---------------------------

def _rp_proj_sql(p: int, out_dims: int) -> str:
    return (
        "(list_reduce(list_transform(range(1, len(embedding)+1), "
        f"i -> CASE WHEN CAST(('0x'||substring(md5('99_{p}_'||(i-1)),1,1)) AS INT) % 2 = 1 "
        "THEN embedding[i]::DOUBLE ELSE -(embedding[i]::DOUBLE) END), "
        f"(a, b) -> a + b) / sqrt({float(out_dims)})) AS proj_{p}"
    )


_RP_ORACLE = (
    "SELECT vec_id,\n       "
    + ",\n       ".join(_rp_proj_sql(p, 8) for p in range(8))
    + "\nFROM embeddings ORDER BY vec_id"
)


@register("embedding_achlioptas_projection", oracle=_RP_ORACLE)
def embedding_achlioptas_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-dim embeddings reduced to 8 dims by an Achlioptas ±1 random
    projection (operators/similarity.random_projection): coefficients are
    md5-derived plan LITERALS (zero per-row hashing), projections fold
    sequentially in-row (bit-identical at any parallelism), the whole
    query is one narrow map stage with no shuffle — the preprocessing
    step that makes downstream ANN / clustering 8x cheaper per vector.
    The oracle re-derives the identical matrix and folds in SQL."""
    from bbt_etl_dw_spark.operators.similarity import random_projection

    emb = table(spark, sf_dir, "embeddings", spread=True)
    return random_projection(emb, out_dims=8, seed=99).orderBy("vec_id")


# --- semantic dedup (SemDeDup: cluster, then prune within clusters) -------


def _semantic_dedup_oracle(nlist: int, iters: int, threshold: float) -> str:
    """Full-pipeline replay: deterministic k-means assignment (the
    _ivf_ctes chain), within-cluster pair prescreen, exact-decimal cosine
    finish, min-id victim rule, full-corpus disposition.

    Prescreen margins deliberately DIFFER: the engine uses threshold-1e-9
    (sequential 64-element double fold, error <= ~1.4e-14) while this
    oracle uses threshold-1e-6 (the _exact_pairs_sql convention). Both
    are sound and need not match: a prescreen may only ADMIT extra pairs,
    and the exact-decimal finish — bit-identical across engines — makes
    the final >= threshold decision on both sides."""
    ctes, dfin = _ivf_ctes(nlist, iters)
    return f"""
WITH {ctes},
afin AS (
  SELECT vec_id, CAST(cid AS INT) AS cid FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
), prods AS (
    SELECT vec_id, UNNEST(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS p
    FROM embeddings
), norms AS (
    SELECT vec_id, sqrt({_DOT_SQL}) AS nrm FROM prods GROUP BY vec_id
), screened AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    JOIN afin ca ON ca.vec_id = a.vec_id
    JOIN afin cb ON cb.vec_id = b.vec_id AND cb.cid = ca.cid
    JOIN norms sna ON sna.vec_id = a.vec_id
    JOIN norms snb ON snb.vec_id = b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.embedding) + 1),
                                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                      (x, y) -> x + y) / (sna.nrm * snb.nrm) >= {threshold} - 1e-6
), pairprods AS (
    SELECT s.id_a, s.id_b,
           UNNEST(list_transform(range(1, len(a.embedding) + 1),
                                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS p
    FROM screened s
    JOIN embeddings a ON a.vec_id = s.id_a
    JOIN embeddings b ON b.vec_id = s.id_b
), dots AS (
    SELECT id_a, id_b, {_DOT_SQL} AS dot FROM pairprods GROUP BY id_a, id_b
), victims AS (
    SELECT DISTINCT d.id_b AS vec_id
    FROM dots d
    JOIN norms na ON na.vec_id = d.id_a
    JOIN norms nb ON nb.vec_id = d.id_b
    WHERE d.dot / (na.nrm * nb.nrm) >= {threshold}
)
SELECT af.vec_id, af.cid AS cluster_id, v.vec_id IS NULL AS kept
FROM afin af LEFT JOIN victims v ON af.vec_id = v.vec_id
ORDER BY af.vec_id
"""


@register(
    "embedding_semantic_dedup",
    oracle=_semantic_dedup_oracle(nlist=8, iters=2, threshold=0.25),
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding space,
    prune within clusters — a vector is dropped when a same-cluster
    smaller-id neighbor sits at cosine >= 0.25 (min-id representative).
    Full corpus disposition (vec_id, cluster_id, kept), oracle-exact: the
    SQL replays the md5-seeded trainer, the assignment argmin, the
    prescreen + exact-decimal cosine, and the victim rule. Scale: the
    pair join is keyed on cluster id — sum of cluster-size² candidates,
    never corpus²; see operators/similarity.semantic_dedup."""
    from bbt_etl_dw_spark.operators.similarity import semantic_dedup

    emb = table(spark, sf_dir, "embeddings", spread=True)
    return semantic_dedup(emb, nlist=8, iters=2, threshold=0.25).orderBy("vec_id")


# --- product quantization (PQ) ADC search ---------------------------------
# The compressed-codes leg of the ANN family (operators/pq.py): per-
# subspace codebooks trained with the SAME md5-seeded exact-decimal
# trainer as IVF, codes assigned by per-subspace argmin, and ADC scoring
# as LUT equi-join + exact-decimal sum of the m partials. The oracle
# replays ALL of it: m independent k-means chains (the prefixed
# _ivf_ctes), per-subspace assignment, the query LUTs (which are just
# the final distance pass restricted to query ids), and the ADC
# rank — end-to-end, value-exact.


def _pq_adc_ctes(m: int, ksub: int, iters: int, dims: int, n_queries: int) -> str:
    """WITH-clause body computing adc(query_id, corpus_id, adc_dist)."""
    sub = dims // m
    chains, parts = [], []
    for j in range(m):
        ctes, dfin = _ivf_ctes(
            ksub,
            iters,
            vec_expr=f"embedding[{j * sub + 1}:{(j + 1) * sub}]",
            prefix=f"p{j}",
        )
        chains.append(ctes if j == 0 else "," + ctes)
        chains.append(f""",
p{j}codes AS (
  SELECT vec_id, cid FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
p{j}lut AS (
  SELECT vec_id AS query_id, cid, dist FROM {dfin} WHERE vec_id < {n_queries}
),
p{j}part AS (
  SELECT l.query_id, c.vec_id AS corpus_id, l.dist AS pdist
  FROM p{j}codes c JOIN p{j}lut l ON l.cid = c.cid
)""")
        parts.append(f"SELECT * FROM p{j}part")
    union = "\n  UNION ALL\n  ".join(parts)
    return (
        "".join(chains)
        + f""",
pqparts AS (
  {union}
),
adc AS (
  SELECT query_id, corpus_id, {_dsum("pdist")} AS adc_dist
  FROM pqparts GROUP BY query_id, corpus_id
)"""
    )


def _pq_topk_oracle(m: int, ksub: int, iters: int, dims: int, k: int) -> str:
    return f"""
WITH {_pq_adc_ctes(m, ksub, iters, dims, n_queries=5).lstrip()},
pqranked AS (
  SELECT query_id, corpus_id, adc_dist,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc_dist, corpus_id) AS BIGINT) AS rank
  FROM adc
)
SELECT query_id, corpus_id, adc_dist, rank FROM pqranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


@register("ann_pq_topk", oracle=_pq_topk_oracle(m=8, ksub=32, iters=2, dims=64, k=10))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate top-10 (Jégou et al. ADC): 64-d vectors
    → 8 subspace codes (32× storage compression — at 100 TB the scoring
    pass reads the code table, never raw vectors), query LUTs broadcast,
    scoring = equi-join + map-side-collapsing exact-decimal sum. The
    oracle replays all eight per-subspace k-means chains, the encoding,
    the LUTs and the ADC rank."""
    from bbt_etl_dw_spark.operators.pq import pq_adc_topk, pq_codebooks, pq_encode

    emb = table(spark, sf_dir, "embeddings", spread=True)
    books = pq_codebooks(emb, m=8, ksub=32, iters=2)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(codes, queries, books, k=10).orderBy("query_id", "rank")


# Recall against the EXACT L2 top-k (PQ approximates L2 distance, so the
# ground truth must be the same metric — cosine would grade the wrong
# target), for BOTH operating points: raw ADC top-10 and the production
# path (ADC shortlist-100 → exact re-rank → top-10). The exact side is
# the declared quadratic baseline shape: a 5-row broadcast query side
# against the corpus (see tests/test_plan_lint.py QUADRATIC_ALLOWED).

_PQ_SHORTLIST = 100

_PQ_RECALL_ORACLE = f"""
WITH {_pq_adc_ctes(8, 32, 2, 64, n_queries=5).lstrip()},
pqshort AS (
  SELECT query_id, corpus_id,
         ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc_dist, corpus_id) AS rk
  FROM adc
  QUALIFY rk <= {_PQ_SHORTLIST}
),
ve AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
exact AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_reduce(list_transform(range(1, len(c.e)+1),
                     i -> (c.e[i] - q.e[i]) * (c.e[i] - q.e[i])), (a, b) -> a + b) AS d
  FROM ve c CROSS JOIN (SELECT * FROM ve WHERE vec_id < 5) q
),
exacttop AS (
  SELECT query_id, corpus_id FROM exact
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, corpus_id) <= 10
),
rrtop AS (
  SELECT e.query_id, e.corpus_id FROM exact e
  JOIN pqshort s ON s.query_id = e.query_id AND s.corpus_id = e.corpus_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.query_id ORDER BY e.d, e.corpus_id) <= 10
),
hits AS (
  SELECT
    (SELECT COUNT(*) FROM pqshort p
     JOIN exacttop e ON p.query_id = e.query_id AND p.corpus_id = e.corpus_id
     WHERE p.rk <= 10) AS n_hits_adc,
    (SELECT COUNT(*) FROM rrtop r
     JOIN exacttop e ON r.query_id = e.query_id AND r.corpus_id = e.corpus_id
    ) AS n_hits_rerank
)
SELECT CAST(5 AS BIGINT) AS n_queries,
       CAST(50 AS BIGINT) AS n_expected,
       n_hits_adc,
       CAST(n_hits_adc AS DOUBLE) / CAST(50 AS DOUBLE) AS recall_adc,
       n_hits_rerank,
       CAST(n_hits_rerank AS DOUBLE) / CAST(50 AS DOUBLE) AS recall_rerank
FROM hits
"""


@register("ann_pq_recall", oracle=_PQ_RECALL_ORACLE)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PQ against the exact L2 top-10, at both operating
    points — raw ADC (codes only) and the production shortlist-100 →
    exact re-rank path (operators/pq.pq_rerank_topk) — the measurement
    every compressed index owes its user. The exact side is the bounded
    quadratic baseline (5 broadcast queries × corpus, same declared
    shape as ann_bruteforce_topk); both sides and the overlap counts are
    replayed in the oracle."""
    from bbt_etl_dw_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        pq_rerank_topk,
    )
    from bbt_etl_dw_spark.operators.similarity import _l2sq

    from bbt_etl_dw_spark.operators.ckpt import materialize

    emb = table(spark, sf_dir, "embeddings", spread=True)
    books = pq_codebooks(emb, m=8, ksub=32, iters=2)
    # codes feed BOTH operating points (raw ADC + shortlist-rerank) and
    # queries feed three consumers (two ADC passes + the exact side):
    # materialized once, the encode map pass and the query scan run once
    # instead of per reference (r14 plan audit: embeddings scanned 24x
    # in this builder). The code table is the persisted-index frame —
    # m small ints per vector — and queries are 5 rows.
    codes = materialize(pq_encode(emb, books))
    v = F.col("embedding").cast("array<double>")
    queries = materialize(
        emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    )
    adc_top = pq_adc_topk(codes, queries, books, k=10).select(
        "query_id", "corpus_id"
    )
    rr_top = pq_rerank_topk(
        emb, codes, queries, books, k=10, shortlist=_PQ_SHORTLIST
    ).select("query_id", "corpus_id")

    q = queries.select("query_id", v.alias("qv"))
    c = emb.select(F.col("vec_id").alias("corpus_id"), v.alias("cv"))
    from pyspark.sql import Window as _W

    exact = c.crossJoin(F.broadcast(q)).select(
        "query_id", "corpus_id", _l2sq(F.col("cv"), F.col("qv")).alias("d")
    )
    w = _W.partitionBy("query_id").orderBy("d", "corpus_id")
    # the exact ground truth feeds both hit counts — materialized (50
    # rows), the bounded-quadratic brute-force pass runs once, not twice
    exact_top = materialize(
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "corpus_id")
    )
    h_adc = adc_top.join(exact_top, ["query_id", "corpus_id"]).agg(
        F.count(F.lit(1)).alias("n_hits_adc")
    )
    h_rr = rr_top.join(exact_top, ["query_id", "corpus_id"]).agg(
        F.count(F.lit(1)).alias("n_hits_rerank")
    )
    return h_adc.crossJoin(h_rr).select(
        F.lit(5).cast("long").alias("n_queries"),
        F.lit(50).cast("long").alias("n_expected"),
        F.col("n_hits_adc"),
        (F.col("n_hits_adc").cast("double") / F.lit(50).cast("double")).alias(
            "recall_adc"
        ),
        F.col("n_hits_rerank"),
        (F.col("n_hits_rerank").cast("double") / F.lit(50).cast("double")).alias(
            "recall_rerank"
        ),
    )


# --- exact covariance matrix + PCA projection -----------------------------

from bbt_etl_dw_spark.operators.pca import (
    covariance_matrix,
    pca_components,
    project_components,
    sql_covariance_ctes,
)

_EMB_DIMS = 64

_COV_ORACLE = f"""
WITH {sql_covariance_ctes(_EMB_DIMS)}
SELECT dim_i, dim_j, n, cov FROM covmat
ORDER BY dim_i, dim_j
"""


@register("embedding_covariance", oracle=_COV_ORACLE)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangle sample covariance of the 64-d embedding
    column — the statistics pass under PCA / whitening / Mahalanobis.
    The n·d²/2 second-moment products reduce MAP-SIDE into d(d+1)/2
    exact-decimal cells per task, so the shuffle carries O(tasks·d²),
    not O(n·d²); per-dimension sums share the first explode; closing
    covariance arithmetic is a fixed IEEE sequence (bit-exact oracle).
    Driver sees nothing — this is the distributed half of PCA; the d×d
    eigh collect lives in operators/pca.pca_components (bounded by
    dimensionality, pytest-propertied)."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return covariance_matrix(emb, "embedding").orderBy("dim_i", "dim_j")


# VERDICT r11 stretch #7: this row was the registry's last rows-only
# float query. The LAPACK eigendecomposition itself stays non-replayable
# (libm-class drift), but the PROJECTION obeys exact linear-algebra
# contracts against the bit-exact-oracled covariance twin — so the query
# now verifies those contracts IN SPARK with tolerances and pins the
# check/violation counts (plus the projected row count) with an oracle.
_PCA_K = 4

_PCA_INVARIANT_ORACLE = """
SELECT chk, CAST(n_checks AS BIGINT) AS n_checks,
       CAST(n_violations AS BIGINT) AS n_violations
FROM (VALUES
  ('component_orthonormal',                  10, 0),
  ('eigenvalues_descending',                  3, 0),
  ('projection_variance_matches_eigenvalue',  4, 0),
  ('projections_uncorrelated',                6, 0),
  ('reconstruction_error_matches_tail',       1, 0),
  ('sign_convention',                         4, 0)
) t(chk, n_checks, n_violations)
UNION ALL
SELECT 'projected_rows', (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
       CAST(0 AS BIGINT)
ORDER BY chk
"""


@register("embedding_pca_projection", oracle=_PCA_INVARIANT_ORACLE)
def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 PCA projection verified by CONTRACT (VERDICT r11 #7 — was
    the last rows-only float query): the eigendecomposition's input is
    the bit-exact-oracled embedding_covariance, and the projection must
    satisfy the exact linear-algebra identities that follow —
    components orthonormal (driver-side, d×k), eigenvalues descending,
    the deterministic sign convention, each projected coordinate's
    sample variance equal to its eigenvalue, distinct coordinates
    uncorrelated, and the rank-k reconstruction error equal to
    (n-1)·(trace − Σ top-k eigenvalues) — every identity
    tolerance-checked (rel 1e-6, ~7 orders above double noise) over the
    DISTRIBUTED projection, with check/violation counts and the corpus
    row count pinned by the oracle. A wrong component, a biased
    centering, or a damaged projection breaks an identity and reds the
    row. Scale: one covariance pass + one narrow projection pass; the
    only driver state is d×d."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    means, comps, eigs = pca_components(emb, "embedding", k=64)
    top_c, top_e = comps[:_PCA_K], eigs[:_PCA_K]
    trace = sum(eigs)  # eigh of the full matrix: trace == Σ all eigenvalues

    # -- driver-side identities (d×k floats, bounded) --
    orth_viol = 0
    for i in range(_PCA_K):
        for j in range(i, _PCA_K):
            dot = sum(a * b for a, b in zip(top_c[i], top_c[j]))
            if abs(dot - (1.0 if i == j else 0.0)) > 1e-10:
                orth_viol += 1
    desc_viol = sum(
        1 for i in range(_PCA_K - 1) if top_e[i] < top_e[i + 1] - 1e-12
    )
    sign_viol = 0
    for comp in top_c:
        jmax = max(range(len(comp)), key=lambda idx: abs(comp[idx]))
        if comp[jmax] < 0:
            sign_viol += 1

    # -- distributed identities over the projection --
    proj = project_components(emb, "embedding", means, top_c)
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in range(_PCA_K):
        aggs.append(F.sum(F.col(f"pc{p}")).alias(f"s{p}"))
        aggs.append(F.sum(F.col(f"pc{p}") * F.col(f"pc{p}")).alias(f"ss{p}"))
    for i in range(_PCA_K):
        for j in range(i + 1, _PCA_K):
            aggs.append(
                F.sum(F.col(f"pc{i}") * F.col(f"pc{j}")).alias(f"sx{i}_{j}")
            )
    v = F.col("embedding").cast("array<double>")
    mean_lit = F.array(*[F.lit(m) for m in means])
    energy_col = F.aggregate(
        F.zip_with(v, mean_lit, lambda x, m: (x - m) * (x - m)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    stats = (
        proj.join(emb.select("vec_id", "embedding"), "vec_id")
        .agg(*aggs, F.sum(energy_col).alias("energy"))
        .collect()[0]  # ONE bounded row: 2k + k(k-1)/2 + 2 doubles
    )
    n = stats["n"]
    var_viol = 0
    for p in range(_PCA_K):
        var = (stats[f"ss{p}"] - stats[f"s{p}"] ** 2 / n) / (n - 1)
        if abs(var - top_e[p]) > 1e-6 * max(abs(top_e[p]), 1e-12):
            var_viol += 1
    cov_viol = 0
    for i in range(_PCA_K):
        for j in range(i + 1, _PCA_K):
            cov = (
                stats[f"sx{i}_{j}"] - stats[f"s{i}"] * stats[f"s{j}"] / n
            ) / (n - 1)
            tol = 1e-6 * ((top_e[i] * top_e[j]) ** 0.5 + 1e-12)
            if abs(cov) > tol:
                cov_viol += 1
    resid_data = stats["energy"] - sum(stats[f"ss{p}"] for p in range(_PCA_K))
    resid_theory = (n - 1) * (trace - sum(top_e))
    recon_viol = int(
        abs(resid_data - resid_theory) > 1e-6 * max((n - 1) * trace, 1e-12)
    )

    rows = [
        ("component_orthonormal", 10, orth_viol),
        ("eigenvalues_descending", 3, desc_viol),
        ("projected_rows", int(n), 0),
        ("projection_variance_matches_eigenvalue", _PCA_K, var_viol),
        ("projections_uncorrelated", 6, cov_viol),
        ("reconstruction_error_matches_tail", 1, recon_viol),
        ("sign_convention", _PCA_K, sign_viol),
    ]
    return spark.createDataFrame(
        rows, schema="chk string, n_checks long, n_violations long"
    ).orderBy("chk")


# --- Johnson-Lindenstrauss random projection --------------------------------

from bbt_etl_dw_spark.operators.projection import (  # noqa: E402
    jl_project,
    sql_jl_exprs,
)

_JL_K = 16
_JL_DIM = 64

_JL_ORACLE = f"""
SELECT vec_id,
       {', '.join(sql_jl_exprs('embedding', _JL_DIM, _JL_K))}
FROM embeddings
ORDER BY vec_id
"""


@register("embedding_random_projection", oracle=_JL_ORACLE)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-d -> 16-d Johnson-Lindenstrauss sign projection
    (``operators/projection.py``): the training-free dimensionality
    reducer a pipeline applies before LSH bucketing or re-ranking when
    no covariance pass is affordable (its trained twin is
    embedding_pca_projection). md5-seeded +-1 matrix inlined as
    literals; each component is a fixed left-to-right IEEE add chain
    over exactly-widened floats scaled by the exact power of two
    1/sqrt(16) — a pure codegen'd map stage (no explode, no shuffle, no
    Python), replayed bit-exactly by the oracle from the same sign
    table."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return jl_project(emb.select("vec_id", "embedding"), "embedding",
                      _JL_DIM, _JL_K).drop("embedding").orderBy("vec_id")


# --- k-means cluster quality (compactness / separation) ---------------------

from bbt_etl_dw_spark.functions.numeric import dsum as _kq_dsum  # noqa: E402
from bbt_etl_dw_spark.functions.numeric import sql_dsum as _kq_sql_dsum  # noqa: E402

_KQ_NLIST = 8
_KQ_ITERS = 2


def _kmeans_quality_oracle(nlist: int, iters: int) -> str:
    ctes, dfin = _ivf_ctes(nlist, iters)
    cfin = f"c{iters}"
    pair_d2 = (
        "list_reduce(list_transform(range(1, len(a.ce)+1),"
        " i -> (a.ce[i] - b.ce[i]) * (a.ce[i] - b.ce[i])), (x, y) -> x + y)"
    )
    return f"""
WITH {ctes},
afin AS (
  SELECT vec_id, cid, dist FROM {dfin}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
intra AS (
  SELECT cid, COUNT(*) AS n_vectors, {_kq_sql_dsum('dist', 'sum_d')}
  FROM afin GROUP BY cid
),
cc AS (
  SELECT a.cid AS ci, {pair_d2} AS d2
  FROM {cfin} a JOIN {cfin} b ON a.cid <> b.cid
),
sep AS (SELECT ci AS cid, MIN(d2) AS nearest_other_sq FROM cc GROUP BY ci)
SELECT CAST(i.cid AS INT) AS cluster_id,
       i.n_vectors,
       i.sum_d / CAST(i.n_vectors AS DOUBLE) AS mean_sqdist,
       s.nearest_other_sq,
       (i.sum_d / CAST(i.n_vectors AS DOUBLE)) / s.nearest_other_sq
         AS compactness
FROM intra i JOIN sep s ON i.cid = s.cid
ORDER BY cluster_id
"""


@register(
    "embedding_cluster_quality",
    oracle=_kmeans_quality_oracle(_KQ_NLIST, _KQ_ITERS),
)
def embedding_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality report for the deterministic k-means model: per
    cluster, the mean squared distance to its own centroid (compactness)
    against the squared distance to the NEAREST other centroid
    (separation) — the Davies-Bouldin-style readout that tells a
    pipeline whether nlist is sane BEFORE IVF search or SemDeDup trusts
    the partition. Assignment + own-distance is the same literal-matrix
    fold map stage as every IVF query (no shuffle); the intra rollup is
    nlist-sized; centroid separation is an nlist x nlist host-side pass
    over the trained (collect-bounded) centroids, replayed SQL-side
    from the same Lloyd CTEs with the identical fold order."""
    from bbt_etl_dw_spark.operators.similarity import (
        _centroid_dists,
        bind_once,
        ivf_centroids,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents = ivf_centroids(emb, nlist=_KQ_NLIST, iters=_KQ_ITERS)

    # nearest-other-centroid distances, host-side over the (k x dim)
    # trained model with the same left-fold order as _l2sq/list_reduce
    def _d2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, c in zip(a, b):
            acc = acc + (x - c) * (x - c)
        return acc

    sep_rows = [
        (i, min(_d2(ci, cj) for j, cj in enumerate(cents) if j != i))
        for i, ci in enumerate(cents)
    ]
    sep = spark.createDataFrame(sep_rows, "cluster_id int, nearest_other_sq double")

    v = F.col("embedding").cast("array<double>")
    assigned = emb.select(
        bind_once(
            _centroid_dists(v, cents),
            lambda d: F.struct(
                (F.array_position(d, F.array_min(d)) - 1).cast("int")
                .alias("cluster_id"),
                F.array_min(d).alias("dist"),
            ),
        ).alias("a")
    ).select("a.cluster_id", "a.dist")
    intra = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vectors"), _kq_dsum(F.col("dist"), "sum_d")
    )
    mean_sq = F.col("sum_d") / F.col("n_vectors").cast("double")
    return (
        intra.join(F.broadcast(sep), "cluster_id")
        .select(
            "cluster_id",
            "n_vectors",
            mean_sq.alias("mean_sqdist"),
            "nearest_other_sq",
            (mean_sq / F.col("nearest_other_sq")).alias("compactness"),
        )
        .orderBy("cluster_id")
    )


# --- JL projection neighborhood recall ---------------------------------------

from bbt_etl_dw_spark.operators.projection import sql_jl_exprs as _sql_jl  # noqa: E402
from bbt_etl_dw_spark.operators.projection import jl_project as _jl_project  # noqa: E402

_RP_K = 5  # top-k whose overlap we measure
_RP_DIM, _RP_OUT = 64, 16

_RP_FOLD64 = (
    "list_reduce(list_transform(range(1, 65),"
    " i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])), (a, b) -> a + b)"
)
_RP_FOLD16 = (
    "list_reduce(list_transform(range(1, 17),"
    " i -> (p.pe[i] - qp.pe[i]) * (p.pe[i] - qp.pe[i])), (a, b) -> a + b)"
)

_RP_RECALL_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS qid, e FROM v WHERE vec_id < 5),
exact AS (
  SELECT q.qid, v.vec_id,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY {_RP_FOLD64}, v.vec_id) AS rnk
  FROM v CROSS JOIN q
),
p0 AS (
  SELECT vec_id, {', '.join(_sql_jl('embedding', _RP_DIM, _RP_OUT))}
  FROM embeddings
),
p AS (
  SELECT vec_id,
         list_value({', '.join(f'rp_{j:02d}' for j in range(_RP_OUT))}) AS pe
  FROM p0
),
qp AS (SELECT vec_id AS qid, pe FROM p WHERE vec_id < 5),
projd AS (
  SELECT qp.qid, p.vec_id,
         row_number() OVER (PARTITION BY qp.qid
             ORDER BY {_RP_FOLD16}, p.vec_id) AS rnk
  FROM p CROSS JOIN qp
),
ex5 AS (SELECT qid, vec_id FROM exact WHERE rnk <= {_RP_K}),
pj5 AS (SELECT qid, vec_id FROM projd WHERE rnk <= {_RP_K})
SELECT a.qid AS query_id,
       CAST(COUNT(b.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(b.vec_id) AS DOUBLE) / {_RP_K}.0 AS recall
FROM ex5 a LEFT JOIN pj5 b ON a.qid = b.qid AND a.vec_id = b.vec_id
GROUP BY a.qid ORDER BY query_id
"""


@register("rp_projection_recall", oracle=_RP_RECALL_ORACLE)
def rp_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-preservation gate for the JL projection: per query,
    the overlap between exact L2 top-5 in the ORIGINAL 64-d space and
    top-5 in the PROJECTED 16-d space — the recall a pipeline must
    check before routing ANN through the cheap projection. Both sides
    are the declared bounded-broadcast baseline shape (5 queries
    against the corpus, like ann_bruteforce_topk); ranks tie-break on
    vec_id; the oracle replays projection and both rankings from the
    same sign table."""
    from pyspark.sql import Window

    from bbt_etl_dw_spark.operators.similarity import _l2sq

    emb = table(spark, sf_dir, "embeddings", spread=True)
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )

    def top5(corpus, queries, cvec, qvec):
        pairs = corpus.crossJoin(F.broadcast(queries)).select(
            "qid", "vec_id", _l2sq(F.col(cvec), F.col(qvec)).alias("d")
        )
        w = Window.partitionBy("qid").orderBy("d", "vec_id")
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _RP_K)
            .select("qid", "vec_id")
        )

    ex5 = top5(v, q, "e", "qe")

    proj = _jl_project(emb.select("vec_id", "embedding"), "embedding",
                       _RP_DIM, _RP_OUT)
    pe = F.array(*[F.col(f"rp_{j:02d}") for j in range(_RP_OUT)])
    p = proj.select("vec_id", pe.alias("pe"))
    qp = p.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("pe").alias("qpe")
    )
    pj5 = top5(p, qp, "pe", "qpe")

    joined = ex5.alias("a").join(
        pj5.alias("b"),
        (F.col("a.qid") == F.col("b.qid")) & (F.col("a.vec_id") == F.col("b.vec_id")),
        "left",
    )
    return (
        joined.groupBy(F.col("a.qid").alias("query_id"))
        .agg(F.count(F.col("b.vec_id")).cast("bigint").alias("n_overlap"))
        .select(
            "query_id", "n_overlap",
            (F.col("n_overlap").cast("double") / F.lit(float(_RP_K)))
            .alias("recall"),
        )
        .orderBy("query_id")
    )


# --- contrastive negative sampling -------------------------------------------

_NEG_K = 4
_NEG_PREFIX = 2  # 256 buckets

_NEG_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id AS cand,
         substring(md5(CAST(vec_id AS VARCHAR)), 1, {_NEG_PREFIX}) AS b
  FROM embeddings
),
draws AS (
  SELECT e.vec_id AS anchor, CAST(j AS BIGINT) AS draw,
         substring(md5(CAST(e.vec_id AS VARCHAR) || ':' ||
                       CAST(j AS VARCHAR)), 1, {_NEG_PREFIX}) AS b
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS j)
)
SELECT d.anchor AS vec_id, d.draw, MIN(bk.cand) AS neg_id
FROM draws d JOIN bucketed bk ON d.b = bk.b AND bk.cand <> d.anchor
GROUP BY d.anchor, d.draw
ORDER BY vec_id, draw
"""


@register("embedding_negative_samples", oracle=_NEG_ORACLE)
def embedding_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each anchor's j-th negative comes from hash-bucket LOOKUP (the
    md5(anchor:j) bucket's min-id representative), so sampling is one
    equi-join of (anchors x 4 draws) against the 256-bucket corpus —
    O(n·k), reproducible, append-stable, never an all-pairs score
    (operators/similarity.negative_samples). Positive-pair exclusion
    composes downstream as a digest-keyed anti-join."""
    from bbt_etl_dw_spark.operators.similarity import negative_samples

    emb = table(spark, sf_dir, "embeddings", spread=True)
    return negative_samples(
        emb.select("vec_id"), k=_NEG_K, n_buckets=256
    ).orderBy("vec_id", "draw")


# --- hard negatives: same-cluster, different point ---------------------------

_HARDNEG_ORACLE = f"""
WITH {_ivf_ctes(_KQ_NLIST, _KQ_ITERS)[0]},
afin AS (
  SELECT vec_id, cid FROM {'d' + str(_KQ_ITERS + 1)}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
bucketed AS (
  SELECT vec_id AS cand, cid,
         substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) AS b
  FROM afin
),
draws AS (
  SELECT a.vec_id AS anchor, a.cid, CAST(j AS BIGINT) AS draw,
         substring(md5(CAST(a.vec_id AS VARCHAR) || ':' ||
                       CAST(j AS VARCHAR)), 1, 1) AS b
  FROM afin a
  CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS j)
)
SELECT d.anchor AS vec_id, d.draw, MIN(bk.cand) AS neg_id
FROM draws d
JOIN bucketed bk ON d.b = bk.b AND d.cid = bk.cid AND bk.cand <> d.anchor
GROUP BY d.anchor, d.draw
ORDER BY vec_id, draw
"""


@register("embedding_hard_negatives", oracle=_HARDNEG_ORACLE)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-negative mining: each anchor's negatives come from its OWN
    k-means cluster (same neighborhood — the contrastive pairs that
    actually teach a model) via the stratified hash-bucket sampler:
    the bucket join key becomes (cluster, bucket), still one equi-join,
    never a within-cluster all-pairs. 16 buckets per cluster at this
    corpus size; assignment is the literal-matrix fold map stage; the
    oracle replays trainer, assignment, and sampler end-to-end."""
    from bbt_etl_dw_spark.operators.similarity import (
        assign_centroid,
        ivf_centroids,
        negative_samples,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents = ivf_centroids(emb, nlist=_KQ_NLIST, iters=_KQ_ITERS)
    v = F.col("embedding").cast("array<double>")
    assigned = emb.select(
        "vec_id", assign_centroid(v, cents).alias("cluster_id")
    )
    return negative_samples(
        assigned, k=_NEG_K, n_buckets=16, strata_col="cluster_id"
    ).orderBy("vec_id", "draw")
