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
