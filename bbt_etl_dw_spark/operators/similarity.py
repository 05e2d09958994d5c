"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Queries broadcast against the corpus; per-pair math is a pure array
  expression (zip_with product + exact decimal fold), so results are
  bit-reproducible and oracle-checkable.
- ``lsh_topk``: the scale path — random-hyperplane bucketing prunes the
  corpus before exact re-ranking. Hyperplane coefficients are md5-derived
  ±1 literals: deterministic, no stored model, identical on every
  executor, and re-derivable by the SQL oracle (the driver value-checks
  the LSH pipeline itself, not a companion). At 100TB, bucket probing
  turns an O(N·Q) scan into O(N/2^planes · Q) with a single shuffle on
  bucket keys.
- ``ivf_topk``: the centroid-partitioned scale path — deterministic
  md5-seeded k-means (exact-decimal Lloyd steps AND exact-decimal
  assignment distances, so centroids and lists are identical at any
  parallelism), inverted lists by nearest centroid, nprobe-list probing
  with exact re-rank.

Dot products fold into an exact decimal accumulator (see ``DEC`` below)
so sums are order-independent and match the SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.textstats import bind_once

# Fold accumulator: 17 integer digits / 18 fractional. Spark's decimal
# addition widens precision and SHRINKS scale when p would exceed 38
# ((38,18)+(38,18) -> (38,17), silently rounding the 18th digit), so the
# fold keeps precision low enough that each add stays exact ((35,18)+
# (35,18) -> (36,18), within 38) and casts back to the declared type
# losslessly while |running total| < 1e17. The previous (25,18)
# accumulator overflowed to NULL at a 1e7 RUNNING SUM — un-normalized
# 64-dim vectors with ~1e3 elements hit that legitimately (review
# finding), and a NULL dot silently drops pairs. DuckDB's oracle-side
# SUM promotes its own accumulator to (38,18), so both engines are now
# exact to 1e17.
DEC = "decimal(35,18)"


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


def fast_dot_expr(a: Column, b: Column) -> Column:
    """Native-double dot product — the PRE-SCREEN twin of :func:`dot_expr`
    (the exact-decimal fold costs ~10x a double fold). Sequential double
    summation of n products has relative error <= n*eps (~1.4e-14 at
    n=64), so a ``>= threshold - 1e-9`` screen cannot drop a pair whose
    exact cosine passes; the exact fold then decides. Shared by every
    prescreen site so the fold and its error-margin contract cannot
    drift apart."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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


def _hyperplane_coeffs(planes: int, dims: int, seed: int) -> list[list[float]]:
    """±1 hyperplane coefficient matrix, derived from md5("{seed}_{p}_{d}")
    hex-digit parity. Computed ONCE on the driver (hashlib) and inlined as
    plan literals — zero per-row hashing — while any engine with md5 can
    re-derive the identical matrix (the SQL oracle does exactly that)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}_{p}_{d}".encode()).hexdigest()[0], 16) % 2
            else -1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def _infer_dims(df: DataFrame, vec_col: str, default: int = 64) -> int:
    """Vector dimensionality from one bounded 1-row job (the same cost
    class as the 1-row samples in sources/csv.py). ``default`` if empty."""
    # Infer from the first NON-NULL vector: an arbitrary first row with a
    # NULL vector would silently fall back to the default, and the dims
    # guard would then raise on every valid row of a non-default-dim corpus.
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("n"))
        .first()
    )
    return int(row["n"]) if row is not None and row["n"] is not None else default


def hyperplane_signature(
    vec: Column, planes: int = 16, seed: int = 0, dims: int = 64
) -> Column:
    """LSH bucket id: sign pattern of ``planes`` pseudo-random hyperplanes.
    Plane p's coefficient for dimension d is ±1 from md5 hex parity —
    deterministic, no stored model, reproducible cross-engine. ``seed``
    yields an independent hyperplane family per LSH table.

    ``dims`` MUST equal the vectors' length: the coefficient matrix is
    inlined as a ``dims``-element literal, and a shorter/longer vector
    would zip-pad with nulls, turn every projection NULL, and silently
    collapse all vectors into bucket 0 (LSH degenerates to a full cross
    product). A runtime guard raises on the first mismatched row instead;
    callers (lsh_topk, cosine_near_dups, random_projection) infer dims
    from the data by default.

    Projections fold in native doubles SEQUENTIALLY over the array — a
    per-row fold has a fixed order on every engine (unlike cross-row
    sums), so the sign — and therefore every bucket id — is bit-identical
    at any parallelism and in the SQL oracle, which mirrors the fold with
    list_reduce in the same element order."""
    coeffs = _hyperplane_coeffs(planes, dims, seed)

    def plane_bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in coeffs[p]]),
                lambda x, c: x * c,
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
    # NULL vectors carry no geometry: their signature is NULL and the row
    # drops out of bucketing naturally (same policy as _infer_dims, which
    # documents NULLs as expected in valid corpora) — without this branch
    # the size guard's NULL comparison fell through to raise_error, whose
    # message itself concat'd to NULL (review finding).
    checked = F.when(F.size(vec) == dims, out).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"hyperplane_signature: expected {dims}-dim vectors, got "
                ),
                F.coalesce(F.size(vec).cast("string"), F.lit("NULL")),
                F.lit(" — pass the correct dims="),
            )
        ).cast("long")
    )
    return F.when(vec.isNull(), F.lit(None).cast("long")).otherwise(checked)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH with exact re-rank.

    ``tables`` independent hyperplane families each bucket the corpus; a
    candidate pair is scored iff it collides in >=1 table. For per-plane
    collision prob p = 1 - θ/π, recall is 1-(1-p^planes)^tables — tables
    drive recall up, planes drive candidate-set size down. At scale this is
    one explode (tables× row fan-out) of SKINNY (id, tbl, bucket) rows,
    one shuffle on (table, bucket), a pair-dedup, then ONE id-join to
    attach vectors to the surviving candidates for exact re-rank — never
    the O(N·Q) full cross product, and never the vectors through the
    tables× fan-out (the same skinny-bucket shape as
    dedup.cosine_near_dups: carrying embeddings through the explode
    multiplied shuffle IO by ~tables, review finding)."""
    if dims is None:
        dims = _infer_dims(corpus, vec_col)
    v = F.col(vec_col).cast("array<double>")

    def keyed_buckets(df: DataFrame, in_id: str, out_id: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_signature(v, planes, seed=t, dims=dims).alias("bucket"),
                )
                for t in range(tables)
            ]
        )
        return df.select(F.col(in_id).alias(out_id), F.explode(sigs).alias("s")).select(
            out_id, F.col("s.tbl").alias("tbl"), F.col("s.bucket").alias("bucket")
        )

    cands = (
        keyed_buckets(corpus, id_col, "corpus_id")
        .join(keyed_buckets(queries, query_id_col, "query_id"), ["tbl", "bucket"])
        .select("query_id", "corpus_id")
        .dropDuplicates()  # collide in >=1 table => score once
    )
    # candidate list is LSH-bounded: materialize it, then semi-join-prune
    # the vector attach to candidate members — otherwise the re-rank join
    # shuffles the FULL corpus vectors to score a candidate set ~100x
    # smaller (r14 plan audit; the jaccard_verify/cosine_near_dups shape)
    from bbt_etl_dw_spark.operators.ckpt import materialize

    cands = materialize(cands)
    from bbt_etl_dw_spark.operators.guards import assert_broadcastable

    cand_ids = assert_broadcastable(
        cands.select(F.col("corpus_id")).distinct(),
        label="lsh_topk: candidate corpus-id set",
        remedy=(
            "the candidate set is corpus-scale — raise planes (fewer "
            "collisions) or replace the broadcast semi-join with a "
            "shuffle semi-join"
        ),
    )
    cvecs = (
        corpus.select(F.col(id_col).alias("corpus_id"), v.alias("cv"))
        .join(F.broadcast(cand_ids), "corpus_id", "left_semi")
    )
    qvecs = queries.select(F.col(query_id_col).alias("query_id"), v.alias("qv"))
    scored = (
        cands.join(F.broadcast(qvecs), "query_id")
        .join(cvecs, "corpus_id")
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


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path.
# --------------------------------------------------------------------------


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _l2sq(vec: Column, cvec: Column) -> Column:
    # Native double fold — and still bit-reproducible: a PER-ROW array
    # fold runs sequentially in array order on every engine and at every
    # parallelism (unlike a cross-row SUM, whose partial-agg order is
    # nondeterministic — those need the decimal discipline). The SQL
    # oracle mirrors this with list_reduce in the same order, so centroid
    # assignments match exactly without paying interpreted-Decimal cost
    # (~10x) on the k-means hot path.
    return F.aggregate(
        F.zip_with(vec, cvec, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of L2² distances to each centroid, via the
    native-double per-row fold (_l2sq — see its comment for why decimal is
    deliberately NOT used here; sequential in-row folds are already
    bit-reproducible). ONE fold expression mapped over a literal centroid
    MATRIX — not
    ``nlist`` separate fold subtrees, which made Catalyst analysis +
    codegen scale O(nlist · dims) per Lloyd step (measured 2-4x the whole
    job's wall at nlist=16). Values are identical: same products, same
    decimal fold order."""
    mat = F.array(*[_lit_vec(c) for c in centroids])
    return F.transform(mat, lambda cv: _l2sq(vec, cv))


def assign_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest (L2) centroid; ties -> lowest index.
    Centroids are plan literals — broadcast with the plan, a narrow map
    stage over the corpus, never a shuffle."""
    return bind_once(
        _centroid_dists(vec, centroids),
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )


def probe_centroids(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The ``nprobe`` nearest centroid ids for a query vector (array<int>),
    deterministic (distance, then index) order."""
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    ds = bind_once(
        _centroid_dists(vec, centroids),
        lambda d: F.zip_with(
            d, idx, lambda dist, cid: F.struct(dist.alias("dist"), cid.alias("cid"))
        ),
    )
    return F.transform(F.slice(F.array_sort(ds), 1, nprobe), lambda s: s["cid"])


# Per-process cache of deterministic training results (see ivf_centroids).
_CENTROID_CACHE: dict = {}


def clear_centroid_cache() -> None:
    """Drop all cached centroid models. Call after rewriting a corpus
    path in-process (the cache otherwise assumes lake immutability and
    would keep serving centroids trained on the overwritten data)."""
    _CENTROID_CACHE.clear()


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF centroid training, pure DataFrame jobs.

    Seeds = the ``nlist`` corpus vectors with the smallest md5(id) hex
    string (a reproducible pseudo-random sample ANY engine can re-derive —
    the SQL oracle replays the same ordering); then ``iters`` Lloyd steps
    where the element-wise means use exact decimal sums (order-independent,
    so the centroids are IDENTICAL at any parallelism — k-means on floats
    is normally partitioning-dependent). Per step: one narrow assignment
    pass + one groupBy(cid, dim) shuffle of nlist*dim skinny rows."""
    # Training is DETERMINISTIC in (corpus, params) — md5 seeds +
    # exact-decimal Lloyd — so a per-process cache keyed on the corpus
    # plan's semantic hash returns byte-identical centroids without the
    # repeated driver jobs (the suite's six IVF-family queries would
    # otherwise each retrain the same model during one enumeration).
    # Assumes inputs immutable within a process (the lake contract; use
    # clear_centroid_cache() after an in-process path rewrite). Keyed on
    # the CANONICALIZED plan STRING (expr-ids normalized, so re-reading
    # the same path hits; relation paths retained, so different corpora
    # can't collide the way a bare 32-bit semanticHash could — ADVICE r05).
    try:
        plan = corpus._jdf.queryExecution().analyzed().canonicalized()
        cache_key = (
            plan.semanticHash(),
            plan.toString(),
            nlist,
            iters,
            id_col,
            vec_col,
        )
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _CENTROID_CACHE:
        return [row[:] for row in _CENTROID_CACHE[cache_key]]

    v = F.col(vec_col).cast("array<double>")
    seeds = (
        corpus.select(F.col(id_col).alias("sid"), v.alias("sv"))
        .filter(v.isNotNull())  # NULL vectors carry no geometry
        .orderBy(F.md5(F.col("sid").cast("string")), F.col("sid"))
        .limit(nlist)
        .collect()
    )
    if not seeds:
        raise ValueError(
            "ivf_centroids: corpus has no non-null vectors to seed from"
        )
    centroids = [list(r["sv"]) for r in seeds]
    # A corpus with fewer (non-null) rows than nlist trains with what it
    # has — the old code indexed centroids[j] for j up to nlist and threw
    # IndexError (review finding). Every list still gets a centroid; the
    # model simply has fewer lists than requested.
    nlist = len(centroids)
    from bbt_etl_dw_spark.functions.numeric import davg

    for _ in range(iters):
        assigned = corpus.select(
            assign_centroid(v, centroids).alias("cid"),
            F.posexplode(v).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("cid", "pos").agg(davg("x", "m")).collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cid[j][p] for p in sorted(by_cid[j])] if j in by_cid else centroids[j]
            for j in range(nlist)
        ]
    if cache_key is not None:
        _CENTROID_CACHE[cache_key] = [row[:] for row in centroids]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest centroid
    (inverted lists); each query probes its ``nprobe`` nearest lists and
    exact-cosine re-ranks inside them. Scan cost ~ nprobe/nlist of the
    corpus per query. At 100TB the corpus side would be written
    partitioned by cid so a probe prunes partitions; here the probe is a
    (cid) equi-join with the tiny query fan-out broadcast."""
    cents = ivf_centroids(corpus, nlist, iters, id_col, vec_col)
    cv = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        cv.alias("cvec"),
        assign_centroid(cv, cents).alias("cid"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        cv.alias("qv"),
        F.explode(probe_centroids(cv, cents, nprobe)).alias("cid"),
    )
    scored = c.join(F.broadcast(q), "cid").select(
        "query_id", "corpus_id", cosine_expr(F.col("cvec"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def exact_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """EXACT all-pairs cosine similarity >= threshold — the O(n²) audit /
    ground-truth path that LSH (:func:`lsh_topk`,
    :func:`~bbt_etl_dw_spark.operators.dedup.cosine_near_dups`) and IVF
    approximate. Norms are computed ONCE per vector before the pair join
    (not per pair); the pair stage is a single dot-product fold.

    Scale: a self-join under `id_a < id_b` is a broadcast nested-loop at
    dim-table size and quadratic beyond — at corpus scale run this only on
    a sampled slice (recall estimation) or per LSH/IVF bucket."""
    normed = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", norm_expr(F.col("v")))
    a, b = normed.alias("a"), normed.alias("b")

    # Fast native-double dot as a pre-screen: the exact-decimal fold costs
    # ~10x a double fold (BigDecimal adds) and Filter+Project each evaluate
    # it, so run it only on pairs the cheap screen keeps. Sequential double
    # summation of 64 products has relative error <= 64*eps ~ 1.4e-14 —
    # the 1e-9 margin cannot drop a pair whose exact cosine passes.
    fast_dot = fast_dot_expr(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(fast_dot / (F.col("a.nrm") * F.col("b.nrm")) >= threshold - 1e-9)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (
                dot_expr(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def random_projection(
    df: DataFrame,
    out_dims: int = 8,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project each
    embedding onto ``out_dims`` md5-derived ±1 hyperplanes (the same
    cross-engine-reproducible family as hyperplane_signature, full-valued
    instead of sign-only), scaled by 1/sqrt(out_dims) so expected pairwise
    distances are preserved. A ±1 (Achlioptas) matrix matches dense
    Gaussian JL quality for distance preservation while keeping every
    coefficient a plan literal — zero per-row hashing, one narrow map
    stage, no shuffle, and any engine with md5 re-derives the identical
    matrix (the suite oracle replays it in SQL).

    Each projection folds SEQUENTIALLY over the array in element order, so
    outputs are bit-identical at any parallelism and in the SQL oracle
    (cross-row float sums would not be)."""
    if dims is None:
        dims = _infer_dims(df, vec_col)
    coeffs = _hyperplane_coeffs(out_dims, dims, seed)
    v = F.col(vec_col).cast("array<double>")
    scale = F.sqrt(F.lit(float(out_dims)))

    def proj(p: int) -> Column:
        fold = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in coeffs[p]]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (fold / scale).alias(f"proj_{p}")

    # dims guard, same contract as hyperplane_signature (r07 review): a
    # ragged vector would zip_pad the coefficient array with NULLs and
    # silently emit an all-NULL projection — rows vanishing from
    # downstream dedup/LSH with no error. NULL vectors stay NULL (no
    # geometry); any OTHER length raises in-plan.
    checked_len = F.when(
        v.isNull() | (F.size(v) == dims), F.lit(True)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"random_projection: expected {dims}-dim vectors, got "),
                F.coalesce(F.size(v).cast("string"), F.lit("NULL")),
                F.lit(" — pass the correct dims="),
            )
        ).cast("boolean")
    )
    return df.filter(checked_len).select(
        F.col(id_col), *[proj(p) for p in range(out_dims)]
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the deterministic
    k-means trainer (:func:`ivf_centroids`), then prune WITHIN each
    cluster — a vector is dropped when a SAME-cluster neighbor with a
    smaller id sits at cosine >= threshold (min-id representative, the
    same greedy convention as incremental_exact_dedup; for exact
    connected-component semantics feed the within-cluster pairs to
    dedup_clusters instead).

    Returns (vec_id, cluster_id, kept): full corpus disposition, one row
    per vector.

    Scale shape — the whole point of clustering first: the pair join is
    keyed on cluster id, so candidate generation is sum-of-cluster-size
    squared, never corpus². Centroids are plan literals (narrow map
    assignment, no shuffle); norms are computed once per vector BEFORE
    the pair join; the double prescreen keeps the exact-decimal cosine
    finish off all but near-threshold pairs. At 100 TB, nlist scales with
    corpus size to bound cluster cardinality (the SemDeDup paper's k ~
    sqrt(n) regime) and the per-cluster join stays broadcast-free on the
    cid-partitioned exchange."""
    # forward the column names (r07 review: the defaults-only call made
    # non-default names an AnalysisException — or, worse, trained on a
    # coincidentally-named wrong column)
    cents = ivf_centroids(
        df, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    v = F.col(vec_col).cast("array<double>")
    assigned = df.select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        assign_centroid(v, cents).alias("cid"),
    ).withColumn("nrm", norm_expr(F.col("v")))
    # `assigned` feeds THREE subtrees (both pair-join sides + the final
    # disposition join): un-materialized, the per-row argmin over nlist
    # centroids — which grows with the SemDeDup k~sqrt(n) regime — and
    # the corpus scan executed once per reference (r14 plan audit). One
    # checkpoint of (vec_id, v, cid, nrm) replaces two full recomputes;
    # the write is the same order as ONE corpus read, which each avoided
    # recompute would have paid anyway.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    assigned = materialize(assigned)

    a, b = assigned.alias("a"), assigned.alias("b")
    fast_dot = fast_dot_expr(F.col("a.v"), F.col("b.v"))
    victims = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(fast_dot / (F.col("a.nrm") * F.col("b.nrm")) >= threshold - 1e-9)
        .filter(
            dot_expr(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            >= threshold
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return assigned.join(victims, "vec_id", "left").select(
        "vec_id",
        F.col("cid").cast("int").alias("cluster_id"),
        F.col("_drop").isNull().alias("kept"),
    )


def semantic_index(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assigned-corpus index rows for :func:`incremental_semantic_dedup`:
    (vec_id, cid, v, nrm) under FROZEN centroids. Persist these alongside
    the corpus (cid-partitioned at scale) so appends never re-read or
    re-assign the existing corpus."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        assign_centroid(v, centroids).alias("cid"),
    ).withColumn("nrm", norm_expr(F.col("v")))


def incremental_semantic_dedup(
    index: DataFrame,
    batch: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append-time semantic dedup against an existing corpus — the
    :func:`semantic_dedup` twin of incremental_minhash_dedup: a batch
    vector is dropped when it near-dups (same-cluster cosine >=
    threshold) an INDEXED vector, or a smaller-id vector within its own
    batch. Returns the surviving batch rows with their cluster id —
    append them AND their :func:`semantic_index` rows.

    Centroids stay FROZEN across appends (the standard IVF maintenance
    regime: retrain + full re-assignment is a scheduled compaction, not a
    per-append cost). Work is O(batch x touched clusters): the index is
    probed through the cid-keyed join only in clusters the batch lands
    in; corpus embeddings outside those clusters are never read."""
    b = semantic_index(batch, centroids, id_col, vec_col)
    # `b` feeds FOUR subtrees (index probe, both self-join sides, the
    # cluster-id attach): un-materialized, the per-row argmin centroid
    # assignment — the operator's dominant expression — executed once per
    # reference (r14 plan audit). The frame is O(batch) by this
    # operator's own contract, so one checkpoint is always safe.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    b = materialize(b)

    def _near(left, right):
        fast_dot = fast_dot_expr(F.col(f"{left}.v"), F.col(f"{right}.v"))
        nn = F.col(f"{left}.nrm") * F.col(f"{right}.nrm")
        return (fast_dot / nn >= threshold - 1e-9) & (
            dot_expr(F.col(f"{left}.v"), F.col(f"{right}.v")) / nn >= threshold
        )

    vs_index = (
        b.alias("b")
        .join(index.alias("i"), F.col("b.cid") == F.col("i.cid"))
        .filter(_near("b", "i"))
        .select(F.col("b.vec_id").alias("vec_id"))
    )
    within_batch = (
        b.alias("a")
        .join(
            b.alias("z"),
            (F.col("a.cid") == F.col("z.cid"))
            & (F.col("a.vec_id") < F.col("z.vec_id")),
        )
        .filter(_near("a", "z"))
        .select(F.col("z.vec_id").alias("vec_id"))
    )
    victims = vs_index.unionByName(within_batch).distinct()
    cids = b.select("vec_id", F.col("cid").cast("int").alias("cluster_id"))
    return (
        batch.withColumnRenamed(id_col, "vec_id")
        .join(victims, "vec_id", "left_anti")
        .join(cids, "vec_id")
        .withColumnRenamed("vec_id", id_col)
    )


def negative_samples(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    n_buckets: int = 256,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training pairs: for every anchor row, up to ``k`` negatives drawn by
    HASH-BUCKET LOOKUP, never by scoring the corpus — the anchor's j-th
    draw targets bucket ``md5(anchor:j)`` and takes that bucket's
    deterministic representative (min id != anchor), so the whole
    sampler is one equi-join of (anchors x k) against the bucketed
    corpus: O(n·k), reproducible on any engine/run (md5-derived like
    every sampling decision here — textstats.split_bucket discipline),
    and append-stable (new corpus rows change a bucket's representative
    only if they undercut its min id).

    An empty target bucket yields no row for that (anchor, j) — the
    caller sizes ``n_buckets`` <= corpus/2 to keep misses rare. Returns
    ``(id_col, draw, neg_id)``. Near-dup exclusion composes downstream:
    anti-join the output against your positive-pair set (the same
    digest-keyed shape as ``incremental_exact_dedup``).

    ``strata_col`` restricts every draw to the anchor's OWN stratum
    (the bucket join key becomes (stratum, bucket)) — with a k-means
    cluster id this is HARD-negative mining: same neighborhood, not the
    same point; the sampler stays an equi-join, never a within-cluster
    all-pairs."""
    hexd = "0123456789abcdef"
    if k < 1:
        # sequence(0, k-1) at k=0 auto-descends to [0, -1] — two phantom
        # draws per anchor where the caller expects none (r07 review)
        raise ValueError(f"negative_samples: k={k} must be >= 1")
    if n_buckets not in (16, 256, 4096):
        raise ValueError("n_buckets must be a power-of-16 prefix size")
    prefix_len = {16: 1, 256: 2, 4096: 3}[n_buckets]
    sid = F.col(id_col).cast("string")
    strata = [F.col(strata_col).alias("__s")] if strata_col else []
    bucketed = corpus.select(
        F.col(id_col).alias("__cand"),
        F.substring(F.md5(sid), 1, prefix_len).alias("__b"),
        *strata,
    )
    draws = corpus.select(F.col(id_col).alias("__anchor"), *strata).select(
        "__anchor",
        *(["__s"] if strata_col else []),
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("draw"),
    ).select(
        "__anchor",
        *(["__s"] if strata_col else []),
        "draw",
        F.substring(
            F.md5(F.concat_ws(":", F.col("__anchor").cast("string"),
                              F.col("draw").cast("string"))),
            1, prefix_len,
        ).alias("__b"),
    )
    join_keys = ["__b", "__s"] if strata_col else ["__b"]
    joined = draws.join(bucketed, join_keys).filter(
        F.col("__cand") != F.col("__anchor")
    )
    return (
        joined.groupBy("__anchor", "draw")
        .agg(F.min("__cand").alias("neg_id"))
        .select(F.col("__anchor").alias(id_col), "draw", "neg_id")
    )
