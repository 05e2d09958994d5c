"""Regression: hyperplane_signature must FAIL LOUDLY on a dims mismatch
(a wrong dims literal used to zip-pad with nulls and silently collapse
every vector into bucket 0, degenerating LSH into a full cross product),
and the wrapper ops must infer dims from the data."""

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.similarity import (
    _infer_dims,
    hyperplane_signature,
    lsh_topk,
    random_projection,
)


@pytest.fixture()
def four_dim(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, -1.0]), (2, [0.5, -2.0, 1.0, 4.0])],
        "vec_id long, embedding array<double>",
    )


def test_signature_raises_on_dims_mismatch(spark, four_dim):
    with pytest.raises(Exception, match="expected 64-dim"):
        four_dim.select(
            hyperplane_signature(F.col("embedding"), planes=4, dims=64).alias("b")
        ).collect()


def test_signature_buckets_with_correct_dims(spark, four_dim):
    out = four_dim.select(
        hyperplane_signature(F.col("embedding"), planes=8, dims=4).alias("b")
    ).collect()
    assert len({r["b"] for r in out}) == 2  # not collapsed into one bucket


def test_wrappers_infer_dims(spark, four_dim):
    assert _infer_dims(four_dim, "embedding") == 4
    q = four_dim.withColumnRenamed("vec_id", "query_id")
    assert lsh_topk(four_dim, q, k=2).count() > 0
    row = random_projection(four_dim, out_dims=4).collect()[0]
    assert all(row[f"proj_{p}"] is not None for p in range(4))


def test_infer_dims_skips_leading_null_vector(spark):
    """A NULL vector in the arbitrary first row must not poison dims
    inference (default fallback would then raise on every valid row of a
    non-default-dim corpus)."""
    from bbt_etl_dw_spark.operators.similarity import _infer_dims

    df = spark.createDataFrame(
        [(1, None), (2, [0.1, 0.2, 0.3, 0.4])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    assert _infer_dims(df, "embedding") == 4
