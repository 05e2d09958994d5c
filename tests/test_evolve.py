"""Schema-evolution reader (sources/evolve.py): widening ladder laws and
multi-generation union behavior."""

import pytest
from pyspark.sql import types as T

from bbt_etl_dw_spark.sources.evolve import evolved_schema, read_evolved, widen


def test_widen_ladder():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.ByteType(), T.ShortType()) == T.ShortType()
    assert widen(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.IntegerType(), T.FloatType()) == T.DoubleType()  # exact
    assert widen(T.StringType(), T.StringType()) == T.StringType()
    assert widen(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())
    ) == T.ArrayType(T.LongType())


def test_widen_refuses_lossy_and_offers_string_fallback():
    with pytest.raises(ValueError, match="lossless"):
        widen(T.StringType(), T.IntegerType())
    with pytest.raises(ValueError, match="lossless"):
        widen(T.LongType(), T.DoubleType())  # long does not fit double
    assert widen(T.StringType(), T.IntegerType(), allow_to_string=True) == T.StringType()


def test_evolved_schema_names_column_in_error():
    s1 = T.StructType([T.StructField("score", T.StringType())])
    s2 = T.StructType([T.StructField("score", T.IntegerType())])
    with pytest.raises(ValueError, match="'score'"):
        evolved_schema([s1, s2])


def test_read_evolved_three_generations(spark, tmp_path):
    """gen1: (id int, score int); gen2 adds lang, widens score to long;
    gen3 drops score. One frame, widened schema, typed NULL fill —
    exactly the case where Spark's mergeSchema refuses to merge."""
    g1 = spark.createDataFrame([(1, 10), (2, 20)], "id int, score int")
    g2 = spark.createDataFrame(
        [(3, 5_000_000_000, "en")], "id int, score long, lang string"
    )
    g3 = spark.createDataFrame([(4, "de")], "id int, lang string")
    p1, p2, p3 = (str(tmp_path / n) for n in ("g1", "g2", "g3"))
    g1.write.parquet(p1)
    g2.write.parquet(p2)
    g3.write.parquet(p3)

    # control: plain mergeSchema cannot read this drift
    with pytest.raises(Exception):
        spark.read.option("mergeSchema", "true").parquet(p1, p2, p3).collect()

    out = read_evolved(spark, [p1, p2, p3])
    assert dict(out.dtypes) == {"id": "int", "score": "bigint", "lang": "string"}
    rows = {r["id"]: (r["score"], r["lang"]) for r in out.collect()}
    assert rows == {
        1: (10, None),
        2: (20, None),
        3: (5_000_000_000, "en"),
        4: (None, "de"),
    }

    # pushdown reaches every member scan of the union
    plan = out.filter("id = 3")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PushedFilters: [IsNotNull(id), EqualTo(id,3)]") >= 3
