"""Training-shard export (sources/shards.py) and char-n-gram LM quality
scoring (operators/lm.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.lm import (
    lm_quality_filter,
    score_char_lm,
    train_char_lm,
)
from bbt_etl_dw_spark.sources.shards import (
    MANIFEST_NAME,
    verify_shards,
    write_training_shards,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_shard_export_manifest_and_balance(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = _docs(spark)
    manifest = write_training_shards(
        df, path, target_rows_per_shard=100
    )
    assert manifest["n_shards"] == 5
    assert manifest["total_rows"] == 500
    assert sorted(s["shard"] for s in manifest["shards"]) == [0, 1, 2, 3, 4]
    # md5-bucket balance: no shard more than 2x the mean
    sizes = [s["n_rows"] for s in manifest["shards"]]
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))
    assert all(s["n_tokens"] > 0 for s in manifest["shards"])
    # one data file per shard
    for s in manifest["shards"]:
        files = [
            f
            for f in os.listdir(f"{path}/shard={s['shard']}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
    # written manifest matches the returned one
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        assert json.load(f)["total_rows"] == 500
    # round-trip: all rows present exactly once
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500


def test_shard_assignment_deterministic_across_rewrites(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(_docs(spark).repartition(7), p1, target_rows_per_shard=100)
    write_training_shards(_docs(spark).repartition(3), p2, target_rows_per_shard=100)
    a = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(p1).select("doc_id", "shard").collect()
    }
    b = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(p2).select("doc_id", "shard").collect()
    }
    assert a == b  # membership independent of input partitioning


def test_verify_shards_catches_corruption(spark, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(_docs(spark, 200), path, target_rows_per_shard=100)
    assert verify_shards(spark, path).count() == 0  # intact

    # tamper: delete one shard's data file
    shard0 = f"{path}/shard=0"
    victim = next(f for f in os.listdir(shard0) if f.endswith(".parquet"))
    os.remove(os.path.join(shard0, victim))
    bad = verify_shards(spark, path).collect()
    assert len(bad) >= 1
    assert any(r["shard"] == 0 for r in bad)


def test_char_lm_orders_english_above_noise(spark):
    """Under a model trained on English-like text, English-like held-out
    docs must score (bits/char) below charset-matched gibberish."""
    train = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog and runs away")
            for i in range(20)
        ]
        + [(100 + i, "a stitch in time saves nine said the old cat") for i in range(20)],
        "doc_id long, text string",
    )
    ng, pf, v = train_char_lm(train)
    assert v > 10
    test = spark.createDataFrame(
        [
            (1, "the brown cat jumps over the old dog"),
            (2, "xq zvwk jfpq mzx bvk qzzt wxjv pqkz"),
            (3, "   "),  # empty after normalization: unscorable
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in score_char_lm(test, ng, pf, v).collect()}
    assert got[1]["bits_per_char"] < got[2]["bits_per_char"]
    assert got[3]["bits_per_char"] is None
    kept = {
        r["doc_id"]
        for r in lm_quality_filter(
            test, ng, pf, v, max_bits_per_char=got[1]["bits_per_char"] + 0.01
        ).collect()
    }
    assert kept == {1}  # noise above threshold, unscorable dropped


def test_char_lm_smoothing_handles_unseen_grams(spark):
    train = spark.createDataFrame([(1, "aaab aaab aaab")], "doc_id long, text string")
    ng, pf, v = train_char_lm(train)
    test = spark.createDataFrame([(9, "zzzz zzzz")], "doc_id long, text string")
    row = score_char_lm(test, ng, pf, v).first()
    assert row["bits_per_char"] is not None  # unseen grams: smoothed, not NULL/inf
    assert row["bits_per_char"] > 0


def test_oov_rate_counts_and_empty_docs(spark):
    from bbt_etl_dw_spark.operators.lm import oov_rate_vs_reference

    ref = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (1, "abcabc"),   # all grams seen
            (2, "xyzxyz"),   # nothing seen (except none shared)
            (3, "   "),      # whitespace-only: no grams
            (4, "abcxyz"),   # mixed
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in oov_rate_vs_reference(docs, ref).collect()}
    assert got[1]["oov_rate"] == 0.0
    assert got[2]["oov_rate"] == 1.0
    assert got[3]["n_grams"] == 0 and got[3]["oov_rate"] is None
    assert 0.0 < got[4]["oov_rate"] < 1.0
    # n_grams: padded 'abcabc' has len 8 -> 6 trigrams
    assert got[1]["n_grams"] == 6


def test_update_char_lm_equals_retrain(spark):
    """Incremental model update must equal retraining on the combined
    corpus exactly: counts, prefixes, AND vocab (charset union — not
    max, which undercounts disjoint charsets)."""
    from bbt_etl_dw_spark.operators.lm import train_char_lm, update_char_lm

    first = spark.createDataFrame(
        [(1, "abab abab"), (2, "the cat sat")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(3, "xyz xyz qrs"), (4, "the dog ran")], "doc_id long, text string"
    )
    both = first.unionByName(batch)

    inc_ng, inc_pf, inc_v = update_char_lm(train_char_lm(first), batch)
    full_ng, full_pf, full_v = train_char_lm(both)

    assert inc_v == full_v
    assert {(r["ngram"], r["ngram_count"]) for r in inc_ng.collect()} == {
        (r["ngram"], r["ngram_count"]) for r in full_ng.collect()
    }
    assert {(r["prefix"], r["prefix_count"]) for r in inc_pf.collect()} == {
        (r["prefix"], r["prefix_count"]) for r in full_pf.collect()
    }


def test_shard_export_empty_input(spark, tmp_path):
    """Zero input rows (a curation pipeline can legitimately filter to
    nothing) still yields a readable dataset, an empty manifest, and a
    clean verify — not unable-to-infer-schema (ADVICE r05)."""
    for sub, kwargs in [("a", {}), ("b", {"n_shards": 4})]:
        path = str(tmp_path / sub)
        manifest = write_training_shards(
            _docs(spark).filter(F.lit(False)), path, **kwargs
        )
        assert manifest["n_shards"] == 0
        assert manifest["total_rows"] == 0 and manifest["shards"] == []
        assert spark.read.parquet(path).count() == 0
        assert verify_shards(spark, path).count() == 0
