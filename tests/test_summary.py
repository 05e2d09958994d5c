"""Incremental summary-table maintenance (operators/summary.py): the
fold of appended per-batch partials must EQUAL the direct aggregate over
the full history — exactly, including double sums (decimal partials make
the equality independent of batch boundaries) — through appends, an
in-place compaction, and further appends; and the streaming wrapper must
equal sequential batch application."""

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.summary import (
    append_summary_batch,
    fold_summary,
    partial_summary,
    read_summary,
    streaming_summary,
)

KEYS = ["event_type"]
SPECS = {
    "n_events": ("count", None),
    "total_value": ("sum", "value"),
    "first_ts": ("min", "ts"),
    "last_ts": ("max", "ts"),
}


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(mins=F.col("id"))).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        # adversarial doubles: 0.1 increments accumulate differently per
        # batching under float partials — the case decimals exist for
        (F.col("id") * 0.1 + 0.05).alias("value"),
    )


def _direct(spark, lo, hi):
    return (
        _events(spark, lo, hi)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").try_cast("decimal(38,18)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def _as_map(rows):
    return {
        r["event_type"]: (r["n_events"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in rows
    }


def test_incremental_fold_equals_direct_through_compaction(spark, tmp_path):
    path = str(tmp_path / "summary")
    cuts = [0, 37, 41, 100, 230]
    for lo, hi in zip(cuts, cuts[1:]):
        append_summary_batch(_events(spark, lo, hi), path, KEYS, SPECS)
    got = _as_map(read_summary(spark, path, KEYS, SPECS).collect())
    want = _as_map(_direct(spark, 0, 230).collect())
    assert got == want  # exact, incl. the double sums

    # compact in place, then keep appending: still exact
    n = fold_summary(spark, path, KEYS, SPECS)
    assert n == 3
    append_summary_batch(_events(spark, 230, 301), path, KEYS, SPECS)
    got2 = _as_map(read_summary(spark, path, KEYS, SPECS).collect())
    want2 = _as_map(_direct(spark, 0, 301).collect())
    assert got2 == want2

    # derived mean: exact sum / exact count, one IEEE division
    avg = read_summary(
        spark, path, KEYS, SPECS,
        derived_avgs={"avg_value": ("total_value", "n_events")},
    ).collect()
    for r in avg:
        assert r["avg_value"] == r["total_value"] / r["n_events"]


def test_streaming_summary_equals_batch(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    cuts = [0, 50, 120, 230]
    for i, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
        chunk = tmp_path / f"chunk{i}"
        _events(spark, lo, hi).coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(feed / f"part-{i:03d}.parquet")

    schema = _events(spark, 0, 1).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    path = str(tmp_path / "summary")
    q = streaming_summary(stream, path, KEYS, SPECS).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _as_map(read_summary(spark, path, KEYS, SPECS).collect())
    want = _as_map(_direct(spark, 0, 230).collect())
    assert got == want


def test_rejects_non_mergeable_spec(spark):
    with pytest.raises(ValueError, match="not mergeable"):
        partial_summary(_events(spark, 0, 5), KEYS, {"m": ("avg", "value")})
    with pytest.raises(ValueError, match="needs a column"):
        partial_summary(_events(spark, 0, 5), KEYS, {"m": ("sum", None)})


def test_rejects_reserved_epoch_name(spark):
    # r07 review: 'epoch' is the log's exactly-once partition column —
    # fold_summary drops it, so a user key/output named 'epoch' would be
    # silently lost. Must raise loudly at spec-check time.
    with pytest.raises(ValueError, match="reserved"):
        partial_summary(
            _events(spark, 0, 5), KEYS, {"epoch": ("max", "value")}
        )
    with pytest.raises(ValueError, match="reserved"):
        partial_summary(
            _events(spark, 0, 5), ["epoch"], {"m": ("sum", "value")}
        )


def test_streaming_log_replay_and_fold(spark, tmp_path):
    """Streaming-mode log: replaying an epoch replaces its own partials
    (no double counting — count/sum are not duplicate-tolerant), and
    fold_summary collapses the epoch partitions into the reserved
    epoch=-1 baseline while staying exact through further epoch
    appends."""
    path = str(tmp_path / "log")
    append_summary_batch(_events(spark, 0, 40), path, KEYS, SPECS, epoch_id=0)
    append_summary_batch(_events(spark, 40, 90), path, KEYS, SPECS, epoch_id=1)
    # crash-replay of epoch 1: same content, same epoch -> no-op overall
    append_summary_batch(_events(spark, 40, 90), path, KEYS, SPECS, epoch_id=1)
    got = _as_map(read_summary(spark, path, KEYS, SPECS).collect())
    assert got == _as_map(_direct(spark, 0, 90).collect())

    n = fold_summary(spark, path, KEYS, SPECS)
    assert n == 3
    # folded layout keeps the epoch partitioning (reserved epoch=-1)
    assert set(spark.read.parquet(path).select("epoch").distinct().toPandas()["epoch"]) == {-1}
    append_summary_batch(_events(spark, 90, 140), path, KEYS, SPECS, epoch_id=2)
    got2 = _as_map(read_summary(spark, path, KEYS, SPECS).collect())
    assert got2 == _as_map(_direct(spark, 0, 140).collect())
    # the atomic-swap staging dir does not linger
    import os
    assert not os.path.exists(path + ".__staging__")


def test_argmax_latest_state_view(spark, tmp_path):
    """argmax over event time = an incrementally-maintained latest-state
    (SCD-type-1 current) view: correct across batch boundaries, through
    compaction, under replay, and with null order values excluded."""
    path = str(tmp_path / "state")
    specs = {
        "n": ("count", None),
        "latest": ("argmax", ("ts", "payload")),
        "earliest": ("argmin", ("ts", "payload")),
    }

    def batch(rows):
        return spark.createDataFrame(rows, "k int, ts int, payload string")

    append_summary_batch(
        batch([(1, 10, "a"), (1, 30, "c"), (2, 5, "x"), (3, None, "dropme")]),
        path, ["k"], specs, epoch_id=0,
    )
    append_summary_batch(
        batch([(1, 20, "b"), (2, 50, "y"), (3, 1, "z")]),
        path, ["k"], specs, epoch_id=1,
    )
    # replay epoch 1: no effect
    append_summary_batch(
        batch([(1, 20, "b"), (2, 50, "y"), (3, 1, "z")]),
        path, ["k"], specs, epoch_id=1,
    )
    fold_summary(spark, path, ["k"], specs)
    append_summary_batch(
        batch([(2, 40, "late-but-not-latest")]), path, ["k"], specs, epoch_id=2
    )
    got = {
        r["k"]: (r["n"], r["latest"], r["earliest"])
        for r in read_summary(spark, path, ["k"], specs).collect()
    }
    assert got[1] == (3, "c", "a")       # argmax 30->c despite batch order
    assert got[2] == (3, "y", "x")       # the late epoch-2 row doesn't win
    assert got[3] == (2, "z", "z")       # null-ts row counted but never wins


def test_argmax_rejects_bad_spec(spark):
    with pytest.raises(ValueError, match="pair"):
        partial_summary(
            _events(spark, 0, 5), KEYS, {"m": ("argmax", "value")}
        )
