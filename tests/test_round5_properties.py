"""Property tests (hypothesis vs brute-force references) for the round-5
operators: Morton keys, shard export, OOV scoring."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.zorder import interleave_bits

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_morton(vals: list[int], bits: int) -> int:
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


@_SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    )
)
def test_interleave_matches_reference_3col(spark, points):
    df = spark.createDataFrame(points, "x long, y long, z long")
    got = df.select(
        "x",
        "y",
        "z",
        interleave_bits([F.col("x"), F.col("y"), F.col("z")], bits=8).alias("m"),
    ).collect()
    for r in got:
        assert r["m"] == _ref_morton([r["x"], r["y"], r["z"]], 8)


@_SLOW
@given(st.integers(1, 60), st.integers(2, 9))
def test_shard_export_partition_of_corpus(spark, tmp_path_factory, n, per):
    """Every input row lands in EXACTLY one shard; manifest totals are
    exact; verify_shards is empty on an untampered export."""
    from bbt_etl_dw_spark.sources.shards import verify_shards, write_training_shards

    path = str(tmp_path_factory.mktemp("sh") / "out")
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"),
    )
    manifest = write_training_shards(df, path, target_rows_per_shard=per)
    assert manifest["total_rows"] == n
    assert manifest["n_shards"] == -(-n // per)
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n
    assert verify_shards(spark, path).count() == 0


def _py_trigrams(text: str) -> list[str]:
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    padded = "\x02\x02" + norm
    if len(padded) < 3:
        return []
    return [padded[i : i + 3] for i in range(len(padded) - 2)]


@_SLOW
@given(
    st.lists(
        st.text(alphabet="ab cd\t", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.text(alphabet="ab cdxy\t", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
)
def test_oov_rate_matches_python_reference(spark, ref_texts, doc_texts):
    from bbt_etl_dw_spark.operators.lm import oov_rate_vs_reference

    ref = spark.createDataFrame(
        list(enumerate(ref_texts)), "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        list(enumerate(doc_texts)), "doc_id long, text string"
    )
    vocab = {g for t in ref_texts for g in _py_trigrams(t)}
    got = {r["doc_id"]: r for r in oov_rate_vs_reference(docs, ref).collect()}
    for i, t in enumerate(doc_texts):
        grams = _py_trigrams(t)
        assert got[i]["n_grams"] == len(grams)
        if not grams:
            assert got[i]["oov_rate"] is None
        else:
            expect = sum(1 for g in grams if g not in vocab) / len(grams)
            assert abs(got[i]["oov_rate"] - expect) < 1e-12
