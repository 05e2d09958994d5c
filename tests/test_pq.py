"""Operator-level tests for product quantization (operators/pq.py) —
structural and semantic checks on tiny constructed corpora; the
end-to-end queries are oracle-verified in tests/test_suite_oracle.py."""

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_rerank_topk,
)


def _corpus(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


# Two well-separated 2-d clusters per subspace: the codebooks must land
# on the exact points, making ADC distances EXACT.
_SEPARABLE = [
    [0.0, 0.0, 10.0, 10.0],
    [0.0, 0.0, 10.0, 10.0],
    [100.0, 100.0, -50.0, -50.0],
    [100.0, 100.0, -50.0, -50.0],
]


def test_codebook_shapes(spark):
    df = _corpus(spark, _SEPARABLE)
    books = pq_codebooks(df, m=2, ksub=2, iters=2, dims=4)
    assert len(books) == 2
    assert all(len(b) == 2 for b in books)
    assert all(len(c) == 2 for b in books for c in b)


def test_dims_not_divisible_raises(spark):
    df = _corpus(spark, _SEPARABLE)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, m=3, ksub=2, iters=1, dims=4)


def test_encode_codes_in_range_and_partition_invariant(spark):
    df = _corpus(spark, _SEPARABLE)
    books = pq_codebooks(df, m=2, ksub=2, iters=2, dims=4)
    codes = {r.corpus_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert set(codes) == {0, 1, 2, 3}
    assert all(0 <= c < 2 for cs in codes.values() for c in cs)
    # same cluster -> same codes; different clusters -> different codes
    assert codes[0] == codes[1] and codes[2] == codes[3]
    assert codes[0] != codes[2]
    # repartitioned input encodes identically (plan-literal codebooks)
    codes2 = {
        r.corpus_id: list(r.codes)
        for r in pq_encode(df.repartition(5), books).collect()
    }
    assert codes == codes2


def test_adc_exact_on_centroid_aligned_corpus(spark):
    # every vector IS a centroid, so quantization error is zero and the
    # ADC distance must equal the true squared L2 distance
    df = _corpus(spark, _SEPARABLE)
    books = pq_codebooks(df, m=2, ksub=2, iters=2, dims=4)
    codes = pq_encode(df, books)
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        r.corpus_id: r.adc_dist
        for r in pq_adc_topk(codes, queries, books, k=4).collect()
    }
    v0, v2 = _SEPARABLE[0], _SEPARABLE[2]
    true_d = sum((a - b) ** 2 for a, b in zip(v0, v2))
    assert got[0] == 0.0 and got[1] == 0.0
    assert got[2] == true_d and got[3] == true_d


def test_rerank_with_full_shortlist_equals_exact_order(spark):
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = _corpus(spark, vecs)
    books = pq_codebooks(df, m=2, ksub=4, iters=2, dims=8)
    codes = pq_encode(df, books)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # shortlist covers the whole corpus -> re-rank IS the exact answer
    got = (
        pq_rerank_topk(df, codes, queries, books, k=5, shortlist=40)
        .orderBy("query_id", "rank")
        .collect()
    )
    for qid in (0, 1):
        q = vecs[qid]
        exact = sorted(
            range(40),
            key=lambda i: (sum((a - b) ** 2 for a, b in zip(vecs[i], q)), i),
        )[:5]
        ours = [r.corpus_id for r in got if r.query_id == qid]
        assert ours == exact
