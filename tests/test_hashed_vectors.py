"""hashed_tf_vector: text -> fixed-dim signed-TF vectors as pure
expressions, feeding the similarity family with no embedding model."""

from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.similarity import brute_force_topk, lsh_topk
from bbt_etl_dw_spark.operators.textstats import hashed_tf_vector

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (3, "completely unrelated treatise on database engines and planners"),
    (4, "another text about cooking pasta with garlic and fresh basil"),
    (5, "the quick brown fox naps beside the lazy dog"),  # near dup of 1
]


def _vectors(spark, dim=32):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.select(
        F.col("doc_id").alias("vec_id"),
        hashed_tf_vector("text", dim=dim).alias("embedding"),
    )


def test_hashed_vectors_rank_duplicates_first(spark):
    vecs = _vectors(spark)
    q = vecs.selectExpr("vec_id AS query_id", "embedding")
    top = brute_force_topk(vecs, q, k=2)
    by_query = {}
    for r in top.collect():
        by_query.setdefault(r["query_id"], []).append(r)
    # doc 1's neighbors: itself and its exact dup, both at cosine 1
    got = {r["corpus_id"]: r["cosine"] for r in by_query[1]}
    assert set(got) == {1, 2}
    assert all(abs(c - 1.0) < 1e-12 for c in got.values())
    # doc 3 is nobody's duplicate: its only cosine-1 neighbor is itself
    top3 = sorted(by_query[3], key=lambda r: r["rank"])
    assert top3[0]["corpus_id"] == 3
    assert top3[1]["cosine"] < 0.999


def test_hashed_vectors_through_lsh_infer_dims(spark):
    vecs = _vectors(spark, dim=32)
    q = vecs.filter("vec_id = 1").selectExpr("vec_id AS query_id", "embedding")
    # dims inferred (32, not the 64 default) — would raise on mismatch
    out = lsh_topk(vecs, q, k=3, planes=4, tables=4)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["corpus_id"] in (1, 2) and abs(rows[0]["cosine"] - 1.0) < 1e-12


def test_near_dup_scores_between_dup_and_unrelated(spark):
    vecs = _vectors(spark)
    q = vecs.filter("vec_id = 1").selectExpr("vec_id AS query_id", "embedding")
    top = {r["corpus_id"]: r["cosine"] for r in brute_force_topk(vecs, q, k=5).collect()}
    assert top[5] > 0.5          # near-dup shares most tokens
    assert top[5] < 1.0 - 1e-9   # but is not identical
    assert top[3] < top[5]       # unrelated text scores below the near-dup


def test_ivf_small_corpus_and_null_vectors(spark):
    """Review findings: a corpus smaller than nlist trains with the rows
    it has (the old code threw IndexError rebuilding centroids[j] for
    j >= len(seeds)); NULL embeddings carry no geometry — excluded from
    seeding, NULL LSH signature (row drops from bucketing) instead of a
    raise_error whose message itself concat'd to NULL."""
    import pytest
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.similarity import (
        hyperplane_signature,
        ivf_centroids,
        ivf_topk,
    )

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None), (4, [0.7, 0.7]), (5, [0.5, 0.1])],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids(tiny, nlist=16, iters=1)
    assert 1 <= len(cents) <= 4  # trained from the non-null rows only
    # end-to-end probe still works on the shrunken model
    out = ivf_topk(tiny.filter(F.col("embedding").isNotNull()),
                   tiny.filter(F.col("vec_id") == 1).select(
                       F.col("vec_id").alias("query_id"), "embedding"),
                   k=2, nlist=16, nprobe=4, iters=1)
    assert out.count() > 0

    sig = tiny.select(
        "vec_id",
        hyperplane_signature(F.col("embedding"), planes=4, dims=2).alias("s"),
    ).collect()
    by = {r["vec_id"]: r["s"] for r in sig}
    assert by[3] is None and by[1] is not None  # null vec -> null signature

    with pytest.raises(ValueError, match="no non-null vectors"):
        ivf_centroids(tiny.filter(F.col("embedding").isNull()), nlist=4)


def test_dot_fold_survives_large_unnormalized_vectors(spark):
    """Review finding: the old decimal(25,18) fold accumulator overflowed
    to NULL once the RUNNING sum passed 1e7 — un-normalized 64-dim
    vectors with ~1e3 elements hit that legitimately and pairs were
    silently dropped."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.similarity import cosine_expr, dot_expr

    big = [1000.0] * 64  # products 1e6 each, running sum 6.4e7
    df = spark.createDataFrame([(big, big)], "a array<double>, b array<double>")
    r = df.select(
        dot_expr(F.col("a"), F.col("b")).alias("d"),
        cosine_expr(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert r["d"] == 64e6 and abs(r["c"] - 1.0) < 1e-12


def test_minhash_bands_validation(spark):
    import pytest

    from bbt_etl_dw_spark.operators.dedup import minhash_band_keys

    with pytest.raises(ValueError, match="must divide"):
        minhash_band_keys("text", num_hashes=64, bands=100, shingle_k=3)
    with pytest.raises(ValueError, match="must divide"):
        minhash_band_keys("text", num_hashes=64, bands=10, shingle_k=3)


# --- JL random projection ---------------------------------------------------


def test_jl_projection_norm_concentration(spark, sf_dir):
    """With the 1/sqrt(k) scale, E[||proj||^2] = ||v||^2; over the 500
    deterministic embeddings the mean ratio concentrates hard around 1
    (component variance 2/k) - and the projection must be reproducible
    run-to-run (seeded, no RNG state)."""
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.projection import jl_project
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = jl_project(emb, "embedding", 64, 16)
    pn = sum(F.col(f"rp_{j:02d}") ** 2 for j in range(16))
    on = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ratio = proj.select(F.avg(pn / on).alias("r")).head().r
    assert 0.85 < ratio < 1.15
    again = jl_project(emb, "embedding", 64, 16)
    assert proj.orderBy("vec_id").collect() == again.orderBy("vec_id").collect()


def test_jl_scale_requires_power_of_four():
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.projection import _check_scale

    assert _check_scale(16) == 0.25
    assert _check_scale(4) == 0.5
    for bad in (2, 8, 12, 32):
        with _pytest.raises(ValueError):
            _check_scale(bad)


def test_negative_samples_deterministic_and_self_free(spark):
    from bbt_etl_dw_spark.operators.similarity import negative_samples

    corpus = spark.range(0, 200).select(F.col("id").alias("vec_id"))
    out = negative_samples(corpus, k=3, n_buckets=16).collect()
    assert out  # 16 buckets over 200 ids: every bucket occupied
    assert all(r.neg_id != r.vec_id for r in out)
    assert all(0 <= r.draw < 3 for r in out)
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r.vec_id, []).append(r.draw)
    assert all(len(ds) <= 3 for ds in per_anchor.values())
    again = negative_samples(corpus, k=3, n_buckets=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
