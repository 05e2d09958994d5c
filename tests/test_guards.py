"""Join-cardinality guards (operators/guards.py)."""

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.guards import (
    CardinalityError,
    assert_row_ratio,
    assert_unique,
    checked_dim_join,
)


def test_assert_unique_passes_and_chains(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert assert_unique(df, ["k"]) is df


def test_assert_unique_reports_worst_offenders(spark):
    df = spark.createDataFrame(
        [(1, "a")] * 3 + [(2, "b")] * 2 + [(3, "c")], "k long, v string"
    )
    with pytest.raises(CardinalityError, match=r"k=1.*x3"):
        assert_unique(df, ["k"], label="dim_product")


def test_checked_dim_join_blocks_fanout(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double")
    good_dim = spark.createDataFrame([(1, "A"), (2, "B")], "k long, name string")
    out = checked_dim_join(fact, good_dim, on="k")
    assert out.count() == 2

    bad_dim = spark.createDataFrame(
        [(1, "A"), (1, "A2"), (2, "B")], "k long, name string"
    )
    with pytest.raises(CardinalityError, match="not unique"):
        checked_dim_join(fact, bad_dim, on="k")


def test_assert_row_ratio_bounds(spark):
    inp = spark.range(10)
    out_ok = spark.range(10)
    assert assert_row_ratio(inp, out_ok) is out_ok
    out_fan = spark.range(25)
    with pytest.raises(CardinalityError, match="fan-out"):
        assert_row_ratio(inp, out_fan, lo=1.0, hi=2.0)
    # empty input with non-empty output is infinite fan-out
    with pytest.raises(CardinalityError):
        assert_row_ratio(spark.range(0), spark.range(1))
    # empty -> empty is ratio 0.0: allowed only if lo permits
    assert_row_ratio(spark.range(0), spark.range(0), lo=0.0, hi=1.0)


def test_assert_broadcastable_passes_and_raises(spark):
    from bbt_etl_dw_spark.operators.guards import (
        CardinalityError,
        assert_broadcastable,
    )

    small = spark.range(10).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("s")
    )
    # passes under the session default threshold and chains
    assert assert_broadcastable(small, "small dim").count() == 10
    # raises with frame name + remedy once the budget is exceeded
    with pytest.raises(CardinalityError, match="tiny model.*use a shuffle"):
        assert_broadcastable(
            small, "tiny model", remedy="use a shuffle", max_bytes=100
        )


def test_lm_broadcast_guard_trips_loudly(spark):
    """The char-LM scorers check the broadcast-model contract (VERDICT
    r05 #8): an over-budget model raises a named error instead of OOMing
    executors mid-job; the default-sized model passes untouched."""
    from bbt_etl_dw_spark.operators.guards import CardinalityError
    from bbt_etl_dw_spark.operators.lm import (
        oov_rate_vs_reference,
        score_char_lm,
        train_char_lm,
    )

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some text number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    model = train_char_lm(docs)
    # happy path: default threshold, both scorers run
    assert score_char_lm(docs, *model).count() == 20
    assert oov_rate_vs_reference(docs, docs).count() == 20
    # hostile threshold: both scorers refuse the broadcast loudly.
    # (The guard floor is shrunk for the test — in production sub-32MB
    # frames are categorically safe regardless of the auto threshold,
    # which governs the optimizer, not explicit hints.)
    import bbt_etl_dw_spark.operators.guards as guards

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_floor = guards.GUARD_FLOOR_BYTES
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100b")
    guards.GUARD_FLOOR_BYTES = 1
    try:
        with pytest.raises(CardinalityError, match="char-LM"):
            score_char_lm(docs, *model)
        with pytest.raises(CardinalityError, match="OOV reference"):
            oov_rate_vs_reference(docs, docs)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        guards.GUARD_FLOOR_BYTES = prev_floor


def test_decontam_blocklist_guard_trips_loudly(spark):
    """The decontamination blocklist carries the same fits-a-broadcast
    contract as the LM models: an over-budget eval n-gram set raises
    naming the broadcast_eval=False remedy instead of OOMing the join."""
    from bbt_etl_dw_spark.operators.decontam import contamination_hits

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    assert contamination_hits(docs, docs, n=4).count() > 0  # happy path
    import bbt_etl_dw_spark.operators.guards as guards

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_floor = guards.GUARD_FLOOR_BYTES
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100b")
    guards.GUARD_FLOOR_BYTES = 1
    try:
        with pytest.raises(CardinalityError, match="blocklist.*broadcast_eval"):
            contamination_hits(docs, docs, n=4)
        # the documented remedy path still works under the tiny threshold
        assert contamination_hits(docs, docs, n=4, broadcast_eval=False).count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        guards.GUARD_FLOOR_BYTES = prev_floor


def test_guard_floor_keeps_small_frames_safe_under_tiny_threshold(spark):
    """A conservative cluster threshold (1KB / -1) steers the optimizer;
    it must NOT make kilobyte-scale hinted broadcasts fail the guard —
    the regression driver_sim --hostile-confs caught."""
    from bbt_etl_dw_spark.operators.guards import assert_broadcastable

    df = spark.range(100).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("s")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for hostile in ("1KB", "-1"):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", hostile)
        try:
            assert_broadcastable(df, "small model")  # must not raise
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_basket_freq_broadcast_guard_trips_loudly(spark):
    """cooccurrence_pairs forces a broadcast of the per-item frequency
    table, which is O(#distinct items) for a GENERIC item column (VERDICT
    r10 #1): over the budget it must raise a named error up front, not
    OOM building the hash relation; the dim-sized happy path passes."""
    from bbt_etl_dw_spark.operators.basket import cooccurrence_pairs
    from bbt_etl_dw_spark.operators.guards import CardinalityError
    import bbt_etl_dw_spark.operators.guards as guards

    baskets = spark.range(40).select(
        (F.col("id") % 10).alias("basket"),
        F.concat(F.lit("item_"), (F.col("id") % 7).cast("string")).alias("item"),
    )
    assert cooccurrence_pairs(baskets, "basket", "item", min_pair_count=1).count() > 0

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_floor = guards.GUARD_FLOOR_BYTES
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100b")
    guards.GUARD_FLOOR_BYTES = 1
    try:
        with pytest.raises(CardinalityError, match="per-item frequency"):
            cooccurrence_pairs(baskets, "basket", "item", min_pair_count=1)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        guards.GUARD_FLOOR_BYTES = prev_floor
