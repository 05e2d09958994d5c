"""Structured Streaming execution tests: the SAME plans the suite checks
in batch mode (suite/stream.py, DuckDB-oracled) are run here as real
micro-batch streams — parquet file source (1 file per trigger) → memory
sink — and compared against their batch results."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.streaming.ops import (
    events_file_stream,
    first_event_per_key,
    session_window_stats,
    stream_dedup,
    tumbling_event_stats,
)
from bbt_etl_dw_spark.streaming.stateful import (
    final_user_totals_batch,
    running_user_totals_stream,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def chunked_dir(spark, events_batch, tmp_path_factory):
    """events split into 3 parquet files in event-time order, so the file
    stream replays them as 3 in-order micro-batches."""
    root = tmp_path_factory.mktemp("events_stream")
    n = events_batch.count()
    ordered = events_batch.orderBy("ts", "event_id").collect()
    per = (n + 2) // 3
    for i in range(3):
        chunk = ordered[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, events_batch.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(root / f"chunk{i}"))
    # flatten: file source wants one directory of files
    files_dir = root / "files"
    files_dir.mkdir()
    idx = 0
    for i in range(3):
        d = root / f"chunk{i}"
        if d.exists():
            for f_ in sorted(d.glob("*.parquet")):
                f_.rename(files_dir / f"part-{idx:03d}.parquet")
                idx += 1
    return str(files_dir)


def _run_stream(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _key_rows(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_tumbling_stream_equals_batch(spark, events_batch, chunked_dir):
    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark, tumbling_event_stats(stream, "1 hour"), "t_tumbling", "complete"
    )
    want = tumbling_event_stats(events_batch, "1 hour")
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _key_rows(got, cols) == _key_rows(want, cols)


def test_tumbling_append_emits_closed_windows_only(spark, events_batch, chunked_dir):
    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark,
        tumbling_event_stats(stream, "1 hour", watermark="2 hours"),
        "t_append",
        "append",
    )
    batch_rows = _key_rows(
        tumbling_event_stats(events_batch, "1 hour"),
        ["window_start", "event_type", "n_events"],
    )
    got_rows = _key_rows(got, ["window_start", "event_type", "n_events"])
    # every finalized window matches batch exactly; windows past the final
    # watermark are (correctly) still open and unemitted
    assert got_rows <= batch_rows
    assert len(got_rows) > 0.5 * len(batch_rows)


def test_session_stream_subset_of_batch(spark, events_batch, chunked_dir):
    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark,
        session_window_stats(stream, "30 minutes", watermark="2 hours"),
        "t_session",
        "append",
    )
    want = _key_rows(
        session_window_stats(events_batch, "30 minutes"),
        ["user_id", "session_start", "session_end", "n_events"],
    )
    got_rows = _key_rows(got, ["user_id", "session_start", "session_end", "n_events"])
    assert got_rows <= want
    assert len(got_rows) > 0


def test_stream_dedup_matches_deterministic_batch(spark, events_batch, chunked_dir):
    keys = ["user_id", "event_type"]
    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark, stream_dedup(stream, keys, watermark=None), "t_dedup", "append"
    )
    want = first_event_per_key(events_batch, keys)
    # unbounded-state dedup: exactly one row per key, same key universe
    # (row choice may differ on ties)
    assert _key_rows(got, keys) == _key_rows(want, keys)
    assert got.count() == want.count()

    # bounded-state variant: still covers every key, but duplicates farther
    # apart than the watermark horizon re-emit (state was evicted)
    bounded = _run_stream(
        spark,
        stream_dedup(events_file_stream(spark, chunked_dir), keys, watermark="10 hours"),
        "t_dedup_bounded",
        "append",
    )
    assert _key_rows(bounded, keys) == _key_rows(want, keys)
    assert bounded.count() >= want.count()


def test_stream_stream_interval_join_equals_batch(spark, events_batch, chunked_dir):
    from bbt_etl_dw_spark.operators.rangejoin import interval_join, stream_interval_join

    def split(df, kind, idc, tsc):
        return df.filter(F.col("event_type") == kind).select(
            F.col("event_id").alias(idc), "user_id", F.col("ts").alias(tsc)
        )

    want_df = interval_join(
        split(events_batch, "purchase", "purchase_id", "purchase_ts"),
        split(events_batch, "click", "click_id", "click_ts"),
        ["user_id"],
        "purchase_ts",
        "click_ts",
        -3600,
        0,
    )
    want = _key_rows(want_df, ["purchase_id", "click_id"])

    got_df = _run_stream(
        spark,
        stream_interval_join(
            split(events_file_stream(spark, chunked_dir), "purchase", "purchase_id", "purchase_ts"),
            split(events_file_stream(spark, chunked_dir), "click", "click_id", "click_ts"),
            ["user_id"],
            "purchase_ts",
            "click_ts",
            -3600,
            0,
            watermark="2 hours",
        ),
        "t_ssjoin",
        "append",
    )
    got = _key_rows(got_df, ["purchase_id", "click_id"])
    assert got == want
    assert len(want) > 0


def test_foreachbatch_partitioned_sink(spark, events_batch, chunked_dir, tmp_path):
    """foreachBatch append-mode restatement: finalized windows land in
    window-partitioned parquet, each complete and exactly-once; every row
    must equal the batch computation."""
    from bbt_etl_dw_spark.streaming.sink import stream_to_partitioned_parquet

    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    stream = events_file_stream(spark, chunked_dir)
    q = stream_to_partitioned_parquet(
        tumbling_event_stats(stream, "1 hour", watermark="2 hours"), out, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_df = spark.read.parquet(out)
    cols = ["window_end", "event_type", "n_events", "total_value"]
    got = {tuple(r[c] for c in cols) for r in got_df.collect()}
    want = {
        tuple(r[c] for c in cols)
        for r in tumbling_event_stats(events_batch, "1 hour").collect()
    }
    assert got <= want  # every emitted window is complete & correct
    assert len(got) > 0.5 * len(want)  # all but the watermark tail emitted


def test_stateful_running_totals_final_state(spark, events_batch, chunked_dir):
    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark, running_user_totals_stream(stream), "t_state", "update"
    )
    # last emitted row per user == final cumulative state
    final = {
        r["user_id"]: r
        for r in got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    want = {r["user_id"]: r for r in final_user_totals_batch(events_batch).collect()}
    assert set(final) == set(want)
    for uid, row in want.items():
        assert final[uid]["n_events"] == row["n_events"]
        # exact, not approx: state accumulates decimal digit strings (the
        # dsum discipline), so stream == batch bit-for-bit by construction
        assert final[uid]["total_value"] == row["total_value"]


def test_dim_enrich_stream_equals_batch(spark, events_batch, chunked_dir, sf_dir):
    """Stream-static broadcast enrichment: the streaming side joins the
    static nation dim per micro-batch with no state; complete-mode result
    equals the batch twin exactly."""
    from bbt_etl_dw_spark.functions.numeric import dsum
    from bbt_etl_dw_spark.streaming.ops import enrich_with_dim

    dim = (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )

    def plan(df):
        keyed = df.withColumn("n_nationkey", (F.col("user_id") % 25).cast("long"))
        return (
            enrich_with_dim(keyed, dim, ["n_nationkey"])
            .groupBy(F.window("ts", "1 hour").alias("w"), "nation")
            .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
            .select(
                F.col("w.start").alias("window_start"), "nation",
                "n_events", "total_value",
            )
        )

    got = _run_stream(
        spark, plan(events_file_stream(spark, chunked_dir)), "t_dim_enrich", "complete"
    )
    cols = ["window_start", "nation", "n_events", "total_value"]
    assert _key_rows(got, cols) == _key_rows(plan(events_batch), cols)


def test_stream_stream_left_interval_join_equals_batch(
    spark, events_batch, chunked_dir, tmp_path
):
    """Left-outer stream-stream interval join == batch left interval join.
    Unmatched left rows only emit after the watermark passes their join
    window, so the stream gets a far-future sentinel pair (excluded from
    the comparison) to flush every real row's state."""
    import shutil
    from pathlib import Path

    from bbt_etl_dw_spark.operators.rangejoin import interval_join, stream_interval_join

    files_dir = tmp_path / "files"
    shutil.copytree(chunked_dir, files_dir)
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [
            (999_999_901, max_ts, 999_999_901, "purchase", 0.0, "{}"),
            (999_999_902, max_ts, 999_999_902, "click", 0.0, "{}"),
        ],
        events_batch.schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 240 HOURS"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "sentinel"))
    for i, f_ in enumerate(sorted(Path(tmp_path / "sentinel").glob("*.parquet"))):
        f_.rename(files_dir / f"part-zz{i}.parquet")

    def split(df, kind, idc, tsc):
        return df.filter(F.col("event_type") == kind).select(
            F.col("event_id").alias(idc), "user_id", F.col("ts").alias(tsc)
        )

    want_df = interval_join(
        split(events_batch, "purchase", "purchase_id", "purchase_ts"),
        split(events_batch, "click", "click_id", "click_ts"),
        ["user_id"],
        "purchase_ts",
        "click_ts",
        -3600,
        0,
        how="left",
        left_id="purchase_id",
    )
    want = _key_rows(want_df, ["purchase_id", "click_id"])

    from bbt_etl_dw_spark.streaming.ops import events_file_stream

    got_df = _run_stream(
        spark,
        stream_interval_join(
            split(events_file_stream(spark, str(files_dir)), "purchase", "purchase_id", "purchase_ts"),
            split(events_file_stream(spark, str(files_dir)), "click", "click_id", "click_ts"),
            ["user_id"],
            "purchase_ts",
            "click_ts",
            -3600,
            0,
            watermark="2 hours",
            how="left",
        ),
        "t_ssjoin_left",
        "append",
    )
    got = {
        (p, c)
        for p, c in _key_rows(got_df, ["purchase_id", "click_id"])
        if p < 999_999_000
    }
    assert got == want
    # non-vacuous both ways: matched rows AND unmatched (null-click) rows
    assert any(c is not None for _, c in want)
    assert any(c is None for _, c in want)


def test_streaming_dedup_ingest_equals_sequential_batches(spark, tmp_path):
    """The corpus ingest loop run as a real stream (3 document files = 3
    micro-batches through foreachBatch) must produce exactly the corpus
    that sequential batch application of incremental_minhash_dedup
    produces: cross-batch near-dups dropped, in-batch dups keep the
    min id, the index grows only with survivors."""
    from bbt_etl_dw_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_corpus_index,
    )
    from bbt_etl_dw_spark.streaming.ops import docs_file_stream, streaming_dedup_ingest

    base = "the quick brown fox jumps over the lazy dog near the old wooden door"
    batches = [
        [(1, base), (2, "totally unrelated first text about engines and planners")],
        [(11, base + " x"),  # near-dup of doc 1 -> dropped
         (12, "fresh second-batch content that stands completely alone")],
        [(21, "totally unrelated first text about engines and planners"),  # exact dup of 2
         (22, "final unique document closing out the ingest test run"),
         (23, "final unique document closing out the ingest test run")],  # in-batch dup
    ]
    files_dir = tmp_path / "feed"
    files_dir.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        chunk = tmp_path / f"chunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(files_dir / f"part-{i:03d}.parquet")

    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    q = streaming_dedup_ingest(
        docs_file_stream(spark, str(files_dir)), corpus_path, index_path
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())

    # sequential batch-mode application over the same batches
    idx = None
    want = []
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        if idx is None:
            idx = minhash_corpus_index(df.limit(0), "doc_id", "text")
        surv = incremental_minhash_dedup(idx, df, "doc_id", "text")
        rows_kept = [(r.doc_id, r.text) for r in surv.collect()]
        want += [d for d, _ in rows_kept]
        kept_df = spark.createDataFrame(rows_kept, "doc_id long, text string")
        idx = idx.unionByName(minhash_corpus_index(kept_df, "doc_id", "text"))
    assert got == sorted(want)
    assert got == [1, 2, 12, 22]  # 11 near-dups 1; 21 dups 2; 23 dups 22

    # the index holds exactly the survivors
    assert sorted(
        r.doc_id for r in spark.read.parquet(index_path).collect()
    ) == got


def test_streaming_first_event_dim_retention_equals_batch(spark, tmp_path):
    """The incrementally-maintained first-event dimension (3 event files =
    3 micro-batches, append-only MIN candidates) must yield EXACTLY the
    retention matrix the batch operator computes from the full history —
    including a user whose true first event arrives in an EARLIER batch
    than a later sighting (the MIN merge case), both before and after the
    in-place compaction fold."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.behavior import retention_cohorts, week_index
    from bbt_etl_dw_spark.streaming.ops import (
        events_file_stream,
        fold_first_event_dim,
        read_first_event_dim,
        streaming_first_event_dim,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(u, days):
        nonlocal eid
        rows.append((eid, base + dt.timedelta(days=days), u, "click", 1.0, "{}"))
        eid += 1

    # batch 0: users 1,2 week0 | batch 1: user 1 week1, user 3 week0 |
    # batch 2: user 2 again in week0 (MIN-merge must not move their first)
    batches = [[(1, 0), (2, 1)], [(1, 7), (3, 2)], [(2, 3), (3, 9)]]
    files_dir = tmp_path / "evfeed"
    files_dir.mkdir()
    all_rows = []
    for i, specs in enumerate(batches):
        rows = []
        for u, d in specs:
            ev(u, d)
        batch_rows = rows[:]
        all_rows += batch_rows
        df = spark.createDataFrame(
            batch_rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        chunk = tmp_path / f"evchunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(files_dir / f"part-{i:03d}.parquet")

    dim_path = str(tmp_path / "first_dim")
    q = streaming_first_event_dim(
        events_file_stream(spark, str(files_dir)), dim_path
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame(
        all_rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    want = sorted(
        map(tuple, retention_cohorts(full).collect())
    )

    def retention_from_dim(dim):
        wk = full.select("user_id", week_index("ts").alias("w")).distinct()
        first = dim.select("user_id", week_index("first_ts").alias("cw"))
        sizes = first.groupBy("cw").agg(F.count(F.lit(1)).alias("n_cohort"))
        ret = (
            wk.join(first, "user_id")
            .groupBy("cw", (F.col("w") - F.col("cw")).alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
        return sorted(
            map(
                tuple,
                ret.join(sizes, "cw")
                .select(
                    F.date_add(F.lit("2024-01-01").cast("date"), (F.col("cw") * 7).cast("int")).alias("cohort_week"),
                    F.col("week_offset").cast("long"),
                    "n_users",
                    "n_cohort",
                )
                .collect(),
            )
        )

    # raw candidate log has multiple rows for users 1-3 — the fold-on-read
    # MIN merge must fix that
    dim = read_first_event_dim(spark, dim_path)
    assert retention_from_dim(dim) == want
    raw_rows = spark.read.parquet(dim_path).count()
    assert raw_rows > dim.count()  # the log really is append-only

    # in-place compaction: one row per user, same retention
    n = fold_first_event_dim(spark, dim_path)
    assert n == 3
    assert spark.read.parquet(dim_path).count() == 3
    assert retention_from_dim(read_first_event_dim(spark, dim_path)) == want


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The stateful streaming funnel's final per-user depth must reproduce
    the batch funnel's stage counts on an ordered feed — including the
    out-of-order-step user (purchase before click) and a stage reached
    only across a micro-batch boundary."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.behavior import funnel_stage_counts
    from bbt_etl_dw_spark.streaming.ops import events_file_stream
    from bbt_etl_dw_spark.streaming.stateful import funnel_progress_stream

    steps = ("signup", "click", "purchase")
    base = dt.datetime(2024, 1, 1)
    rows = []

    def ev(u, typ, minutes):
        rows.append(
            (len(rows), base + dt.timedelta(minutes=minutes), u, typ, 1.0, "{}")
        )

    # time-ordered feed split into 3 files at minute boundaries 0-9/10-19/20+
    ev(1, "signup", 0); ev(2, "signup", 1); ev(3, "click", 2); ev(2, "purchase", 5)
    ev(1, "click", 10); ev(3, "signup", 11); ev(2, "click", 12)
    ev(1, "purchase", 20); ev(2, "purchase", 21)  # 2 completes AFTER its click
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    full = spark.createDataFrame(rows, schema)

    files_dir = tmp_path / "funnelfeed"
    files_dir.mkdir()
    for i, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 10**6)]):
        part = full.filter(
            (F.col("ts") >= base + dt.timedelta(minutes=lo))
            & (F.col("ts") < base + dt.timedelta(minutes=hi))
        )
        chunk = tmp_path / f"fchunk{i}"
        part.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(files_dir / f"part-{i:03d}.parquet")

    out = funnel_progress_stream(
        events_file_stream(spark, str(files_dir)), steps
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # final depth per user = last emitted row per user
    emitted = spark.sql(
        "SELECT user_id, stages_reached FROM funnel_stream"
    ).toPandas()
    final = emitted.groupby("user_id")["stages_reached"].last().to_dict()
    # user 1: all three in order; user 2: purchase@5 doesn't count, the
    # one @21 does; user 3: click precedes signup -> depth 1
    assert final == {1: 3, 2: 3, 3: 1}

    want = {
        r["stage"]: r["n_users"]
        for r in funnel_stage_counts(full, steps).collect()
    }
    got = {
        s: sum(1 for d in final.values() if d >= i + 1)
        for i, s in enumerate(steps)
    }
    assert got == want


def test_streaming_span_ingest_equals_sequential_batches(spark, tmp_path):
    """The span ingest loop run as a real 3-micro-batch stream must log
    exactly the spans sequential batch application produces: cross-batch
    hits against earlier batches' windows, in-batch cross-doc sharing,
    and clean docs logging nothing."""
    from bbt_etl_dw_spark.operators.spans import (
        incremental_span_dedup,
        span_corpus_index,
    )
    from bbt_etl_dw_spark.streaming.ops import docs_file_stream, streaming_span_ingest

    run8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    batches = [
        [(1, run8 + " tail"), (2, "clean first batch text with nothing shared here")],
        [(11, "lead " + run8), (12, "unique second batch doc completely fresh words")],
        [(21, "p1 p2 p3 p4 p5 p6 p7 p8 x"), (22, "p1 p2 p3 p4 p5 p6 p7 p8 y")],
    ]
    files_dir = tmp_path / "spanfeed"
    files_dir.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        chunk = tmp_path / f"spanchunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(files_dir / f"part-{i:03d}.parquet")

    spans_path, index_path = str(tmp_path / "spans"), str(tmp_path / "spanidx")
    q = streaming_span_ingest(
        docs_file_stream(spark, str(files_dir)), spans_path, index_path
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spark.read.parquet(spans_path).collect()
    )

    idx = None
    want = []
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        if idx is None:
            idx = span_corpus_index(df.limit(0))
        want += [
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in incremental_span_dedup(idx, df).collect()
        ]
        idx = idx.union(span_corpus_index(df)).distinct()
    assert got == sorted(want)
    # batch 2 doc 11 hits batch 1's run; batch 3 docs share in-batch
    assert {d for d, _, _ in got} == {11, 21, 22}
    # index stayed distinct despite append-only writes
    idx_rows = spark.read.parquet(index_path)
    assert idx_rows.count() == idx_rows.distinct().count()


def test_streaming_cdc_apply_equals_sequential(spark, tmp_path):
    """A 3-batch CDC change feed applied through streaming_cdc_apply must
    leave the target exactly where sequential apply_changes calls leave a
    twin target: upserts land, deletes disappear, later batches see
    earlier batches' state (an insert updated in a later batch, a row
    deleted after being updated)."""
    from bbt_etl_dw_spark.operators.diff import apply_changes
    from bbt_etl_dw_spark.streaming.ops import streaming_cdc_apply

    schema = (
        "k long, op string, changed_cols array<string>, "
        "old_name string, old_v double, new_name string, new_v double, "
        "old_part string, new_part string"
    )
    initial = spark.createDataFrame(
        [(1, "a", 1.0, "p1"), (2, "b", 2.0, "p2")],
        "k long, name string, v double, part string",
    )
    batches = [
        # b0: insert k=3 into p1, update k=1's value
        [
            (3, "insert", [], None, None, "c", 3.0, None, "p1"),
            (1, "update", ["v"], "a", 1.0, "a", 1.5, "p1", "p1"),
        ],
        # b1: update the b0 insert (proves batch order), move k=2 p2->p1
        [
            (3, "update", ["v"], "c", 3.0, "c", 3.5, "p1", "p1"),
            (2, "update", ["part"], "b", 2.0, "b", 2.0, "p2", "p1"),
        ],
        # b2: delete the row updated in b1
        [(3, "delete", [], "c", 3.5, None, None, "p1", None)],
    ]

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        chunk = tmp_path / f"chunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(feed / f"part-{i:03d}.parquet")

    stream_target = str(tmp_path / "t_stream")
    batch_target = str(tmp_path / "t_batch")
    initial.write.partitionBy("part").parquet(stream_target)
    initial.write.partitionBy("part").parquet(batch_target)

    changes_stream = (
        spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = streaming_cdc_apply(
        changes_stream, stream_target, keys=["k"], part_col="part"
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    for rows in batches:
        apply_changes(
            spark,
            batch_target,
            spark.createDataFrame(rows, schema),
            keys=["k"],
            part_col="part",
        )

    def snap(path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .selectExpr("k", "name", "v", "CAST(part AS STRING) part")
            .collect()
        )

    assert snap(stream_target) == snap(batch_target)
    assert snap(stream_target) == [
        (1, "a", 1.5, "p1"),
        (2, "b", 2.0, "p1"),
    ]


def test_watermark_drop_is_observable(spark, tmp_path):
    """A row arriving behind the watermark is silently dropped by design;
    streaming/monitor.py must make that loss visible in the progress
    metrics (the alertable counter a 100TB pipeline watches)."""
    import datetime

    from bbt_etl_dw_spark.streaming.monitor import (
        cumulative_dropped,
        progress_metrics,
    )
    from bbt_etl_dw_spark.streaming.ops import tumbling_event_stats

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    feed = tmp_path / "feed"
    feed.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def write_batch(i, rows):
        df = spark.createDataFrame(rows, schema)
        chunk = tmp_path / f"chunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(feed / f"part-{i:03d}.parquet")

    # batch 0: events up to t+10h -> watermark advances to ~t+9h (1h delay)
    write_batch(0, [(i, base + datetime.timedelta(hours=h), 1, "click", 1.0)
                    for i, h in enumerate([0, 1, 2, 10])])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        tumbling_event_stats(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("wm_drop_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: an event 9 hours late — behind the t+9h watermark
        write_batch(1, [(100, base + datetime.timedelta(hours=1, minutes=30), 1, "click", 1.0)])
        q.processAllAvailable()
        m = progress_metrics(q)
        assert m["batch_id"] >= 1
        assert m["watermark"] is not None
        assert cumulative_dropped(q) >= 1  # the late row's loss is VISIBLE
    finally:
        q.stop()


def test_streaming_semantic_ingest_equals_sequential_batches(spark, tmp_path):
    """The SemDeDup ingest loop run as a real stream (3 embedding files =
    3 micro-batches) must equal sequential batch application of
    incremental_semantic_dedup: cross-batch near-dups dropped, in-batch
    keeps the min id, the index grows only with survivors."""
    from bbt_etl_dw_spark.operators.similarity import (
        incremental_semantic_dedup,
        semantic_index,
    )
    from bbt_etl_dw_spark.streaming.ops import (
        embeddings_file_stream,
        streaming_semantic_ingest,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    batches = [
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        [(11, [0.999, 0.01]),   # near-dup of 1 (same cluster) -> dropped
         (12, [0.6, 0.55])],    # cluster 0, far from 1 -> kept
        [(21, [0.01, 0.999]),   # near-dup of 2 -> dropped
         (22, [0.58, 0.57]),    # near-dup of 12 (cross-batch) -> dropped
         (23, [-1.0, 0.2]),     # new direction -> kept
         (24, [-0.999, 0.21])], # in-batch near-dup of 23 -> dropped
    ]
    files_dir = tmp_path / "feed"
    files_dir.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        chunk = tmp_path / f"chunk{i}"
        df.coalesce(1).write.parquet(str(chunk))
        for f_ in sorted(chunk.glob("*.parquet")):
            f_.rename(files_dir / f"part-{i:03d}.parquet")

    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    q = streaming_semantic_ingest(
        embeddings_file_stream(spark, str(files_dir)),
        corpus_path,
        index_path,
        cents,
        threshold=0.98,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.vec_id for r in spark.read.parquet(corpus_path).collect())

    # sequential batch-mode application over the same batches
    idx = None
    want = []
    for rows in batches:
        bdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        if idx is None:
            idx = semantic_index(bdf.limit(0), cents)
        surv = incremental_semantic_dedup(idx, bdf, cents, threshold=0.98)
        surv = surv.localCheckpoint()
        want += [r.vec_id for r in surv.collect()]
        idx = idx.unionByName(semantic_index(surv.drop("cluster_id"), cents))
    assert got == sorted(want)
    assert got == [1, 2, 12, 23]
    # index rows exist exactly for survivors
    assert sorted(
        r.vec_id for r in spark.read.parquet(index_path).collect()
    ) == got


def test_idempotent_ingest_batches_survive_replay(spark, tmp_path):
    """idempotent=True ingest: re-applying a micro-batch with the SAME
    epoch_id (Structured Streaming's replay-after-crash contract) leaves
    the corpus, index, and span log EXACTLY as a single application —
    dynamic epoch-partition overwrite replaces the partial attempt, and
    the probe excludes the current epoch so the batch never self-collides
    (the double-apply here is a superset of any partial crash state).
    The default append mode demonstrably duplicates under the same
    replay, which is the at-least-once contract the flag exists to
    close."""
    from bbt_etl_dw_spark.streaming.ops import (
        dedup_ingest_batch,
        read_epoch_sink,
        semantic_ingest_batch,
        span_ingest_batch,
    )

    doc_batches = [
        [(1, "the quick brown fox jumps over the lazy dog by the door"),
         (2, "completely different text about query planners and engines")],
        [(11, "the quick brown fox jumps over the lazy dog by the door x"),
         (12, "fresh second-batch content that stands completely alone")],
    ]

    # --- minhash dedup loop
    cp, ip = str(tmp_path / "c1"), str(tmp_path / "i1")
    for eid, rows in enumerate(doc_batches):
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        dedup_ingest_batch(bdf, eid, cp, ip, idempotent=True)
        if eid == 1:  # replay the second batch: crash-after-append case
            dedup_ingest_batch(bdf, eid, cp, ip, idempotent=True)
    got = sorted(r.doc_id for r in read_epoch_sink(spark, cp).collect())
    assert got == [1, 2, 12]  # 11 near-dups 1; NO duplicates from replay
    assert sorted(
        r.doc_id for r in read_epoch_sink(spark, ip).select("doc_id").distinct().collect()
    ) == got

    # --- append mode under the same replay duplicates (the closed gap)
    cp_a, ip_a = str(tmp_path / "c1a"), str(tmp_path / "i1a")
    for eid, rows in enumerate(doc_batches):
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        dedup_ingest_batch(bdf, eid, cp_a, ip_a)
        if eid == 1:
            dedup_ingest_batch(bdf, eid, cp_a, ip_a)
    dup = [r.doc_id for r in spark.read.parquet(cp_a).collect()]
    assert sorted(dup) != sorted(set(dup))  # duplicates present

    # --- span loop: replayed batch re-detects the same spans once
    sp, ip2 = str(tmp_path / "s2"), str(tmp_path / "i2")
    span_rows = [
        [(1, "a b c d e f g h i j")],
        # shares the 8-token windows of doc 1 (windows slide per token)
        [(2, "x y a b c d e f g h i j z w")],
    ]
    for eid, rows in enumerate(span_rows):
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        span_ingest_batch(bdf, eid, sp, ip2, n=8, idempotent=True)
        if eid == 1:
            span_ingest_batch(bdf, eid, sp, ip2, n=8, idempotent=True)
    spans_once = read_epoch_sink(spark, sp).collect()
    assert len(spans_once) == len({tuple(r) for r in spans_once}) > 0
    idx_rows = read_epoch_sink(spark, ip2).select("h").collect()
    assert len(idx_rows) == len({r.h for r in idx_rows})  # index stays distinct

    # --- semantic loop
    cents = [[1.0, 0.0], [0.0, 1.0]]
    cp3, ip3 = str(tmp_path / "c3"), str(tmp_path / "i3")
    emb_batches = [
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        [(11, [0.999, 0.01]), (12, [0.6, 0.55])],
    ]
    for eid, rows in enumerate(emb_batches):
        bdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        semantic_ingest_batch(
            bdf, eid, cp3, ip3, cents, threshold=0.98, idempotent=True
        )
        if eid == 1:
            semantic_ingest_batch(
                bdf, eid, cp3, ip3, cents, threshold=0.98, idempotent=True
            )
    got3 = sorted(r.vec_id for r in read_epoch_sink(spark, cp3).collect())
    assert got3 == [1, 2, 12]  # 11 near-dups 1; replay added nothing


def test_ingest_probe_ignores_uncommitted_dirs_and_epoch_is_reserved(
    spark, tmp_path
):
    """(a) A sink path containing only hidden entries (_temporary/_SUCCESS
    — the footprint of a crash during the very first committed write)
    reads as 'no index yet' instead of wedging every retry on an
    unreadable parquet read. (b) 'epoch' is a reserved sink column name:
    ingesting a frame that already carries it raises instead of silently
    corrupting the column."""
    import pytest

    from bbt_etl_dw_spark.streaming.ops import _epoch_write, _fs_exists

    p = tmp_path / "index"
    (p / "_temporary" / "0").mkdir(parents=True)
    (p / "_SUCCESS").touch()
    assert not _fs_exists(spark, str(p))
    # a committed file (incl. inside an epoch partition) flips the probe
    (p / "epoch=3").mkdir()
    (p / "epoch=3" / "part-000.parquet").touch()
    assert _fs_exists(spark, str(p))

    df = spark.range(3).select(F.col("id"), F.lit(7).alias("epoch"))
    with pytest.raises(ValueError, match="reserve.*epoch"):
        _epoch_write(df, str(tmp_path / "sink"), 0, idempotent=True)
    with pytest.raises(ValueError, match="reserve.*epoch"):
        _epoch_write(df, str(tmp_path / "sink"), 0, idempotent=False)


def test_compact_epochs_folds_baseline_and_preserves_rows(spark, tmp_path):
    """Epoch compaction: partitions <= the committed watermark fold into
    the reserved epoch=-1 baseline atomically; newer epochs and row
    content are untouched; a second compaction at the same watermark is
    a no-op; file/partition count actually shrinks (the operational
    point)."""
    import os

    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    path = str(tmp_path / "sink")
    for eid in range(4):
        df = spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )
        _epoch_write(df, path, eid, idempotent=True)
    before = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())

    assert compact_epochs(spark, path, upto_epoch=2) == 3
    after_epochs = {
        r["epoch"]
        for r in spark.read.parquet(path).select("epoch").distinct().collect()
    }
    assert after_epochs == {-1, 3}
    assert sorted(r.doc_id for r in read_epoch_sink(spark, path).collect()) == before
    assert compact_epochs(spark, path, upto_epoch=2) == 0  # idempotent
    assert not os.path.exists(path + ".__staging__")
    # epoch 3 still replaceable by a replay after compaction
    df3 = spark.range(30, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    _epoch_write(df3, path, 3, idempotent=True)
    assert sorted(r.doc_id for r in read_epoch_sink(spark, path).collect()) == before


def test_compact_epochs_fence_aborts_on_concurrent_ingest(spark, tmp_path):
    """VERDICT r06 #6 race pytest: an ingest loop committing a NEW epoch
    between compaction's snapshot and its atomic swap must abort the
    compaction (ConcurrentWriteDetected) with the target fully intact —
    including the racing epoch, which the full-table swap would
    otherwise silently destroy. Staging is cleaned up; a re-run then
    succeeds and folds the new epoch too."""
    import os

    from bbt_etl_dw_spark.sources.parquet import ConcurrentWriteDetected
    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    path = str(tmp_path / "sink")

    def batch(eid):
        return spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    for eid in range(3):
        _epoch_write(batch(eid), path, eid, idempotent=True)

    def racing_ingest():
        _epoch_write(batch(3), path, 3, idempotent=True)

    with pytest.raises(ConcurrentWriteDetected, match="epoch partitions changed"):
        compact_epochs(spark, path, upto_epoch=2, _race_injection=racing_ingest)

    # target intact INCLUDING the racing epoch; staging and lock cleaned
    got = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())
    assert got == list(range(40))
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__lock__")
    # the retry folds everything below the watermark, epoch 3 untouched
    assert compact_epochs(spark, path, upto_epoch=2) == 3
    assert sorted(r.doc_id for r in read_epoch_sink(spark, path).collect()) == got


def test_overwrite_atomic_single_writer_lock(spark, tmp_path):
    """Two lock-honoring writers exclude each other: with the lock file
    present, overwrite_atomic raises WriterLockHeld naming the holder and
    leaves the target untouched; after release it succeeds and removes
    the lock."""
    import os

    from bbt_etl_dw_spark.sources.parquet import (
        WriterLockHeld,
        acquire_swap_lock,
        overwrite_atomic,
        release_swap_lock,
    )

    path = str(tmp_path / "t")
    spark.range(5).write.parquet(path)
    lock = acquire_swap_lock(spark, path, owner="writer-A")
    with pytest.raises(WriterLockHeld, match="writer-A"):
        overwrite_atomic(spark.range(9), path)
    assert spark.read.parquet(path).count() == 5  # untouched
    release_swap_lock(spark, lock)
    overwrite_atomic(spark.range(9), path)
    assert spark.read.parquet(path).count() == 9
    assert not os.path.exists(path + ".__lock__")


def test_swap_lock_threaded_race_single_winner(spark, tmp_path):
    """N concurrent claimants of ONE lock: exactly one wins, every loser
    gets WriterLockHeld, and the winner's identity record survives
    un-truncated. Pins the file:-URI claim path (File.createNewFile):
    Hadoop's local create(overwrite=false) is check-then-create, under
    which two racers could both 'win' and the loser would truncate the
    winner's identity."""
    import threading

    from bbt_etl_dw_spark.sources.parquet import (
        WriterLockHeld,
        acquire_swap_lock,
        release_swap_lock,
    )

    path = str(tmp_path / "t")
    results: dict[str, object] = {}
    barrier = threading.Barrier(6)

    def claim(name):
        barrier.wait()  # maximize claim overlap
        try:
            results[name] = acquire_swap_lock(spark, path, owner=name)
        except WriterLockHeld as e:
            results[name] = e

    threads = [
        threading.Thread(target=claim, args=(f"w{i}",)) for i in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [n for n, r in results.items() if isinstance(r, str)]
    losers = [n for n, r in results.items() if isinstance(r, WriterLockHeld)]
    assert len(winners) == 1 and len(losers) == 5, results
    with open(path + ".__lock__") as f:
        assert f.read().startswith(f"{winners[0]} pid=")  # not truncated
    release_swap_lock(spark, results[winners[0]])


def test_vacuum_orphans_sweeps_staging_and_temporary(spark, tmp_path):
    """VACUUM companion of the epoch sinks: abandoned __staging__ dirs and
    in-table _temporary dirs are removed under the writer lock; committed
    rows are untouched; a held lock refuses the sweep."""
    import os

    from bbt_etl_dw_spark.sources.parquet import (
        WriterLockHeld,
        acquire_swap_lock,
        release_swap_lock,
        vacuum_orphans,
    )
    from bbt_etl_dw_spark.streaming.ops import _epoch_write, read_epoch_sink

    path = str(tmp_path / "sink")
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    _epoch_write(df, path, 0, idempotent=True)
    # plant crash leftovers: an abandoned staging dir + a task-attempt dir
    os.makedirs(path + ".__staging__/epoch=0")
    open(path + ".__staging__/epoch=0/part-x.parquet", "w").write("junk")
    os.makedirs(path + "/epoch=0/_temporary/0")
    open(path + "/epoch=0/_temporary/0/task.parquet", "w").write("junk")

    lock = acquire_swap_lock(spark, path, owner="live-writer")
    with pytest.raises(WriterLockHeld, match="live-writer"):
        vacuum_orphans(spark, path)
    release_swap_lock(spark, lock)

    # default sweep: staging only — _temporary may belong to a LIVE
    # ingest micro-batch (ingest does not take the lock), so it is opt-in
    removed = vacuum_orphans(spark, path)
    assert len(removed) == 1 and removed[0].endswith(".__staging__")
    assert os.path.exists(path + "/epoch=0/_temporary")  # untouched
    removed = vacuum_orphans(spark, path, include_temporary=True)
    assert len(removed) == 1
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + "/epoch=0/_temporary")
    assert not os.path.exists(path + ".__lock__")  # released after sweep
    assert read_epoch_sink(spark, path).count() == 10  # data intact
    assert vacuum_orphans(spark, path, include_temporary=True) == []


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the stateful
    automatons without a streaming query."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_zscore_automaton_survives_inf_huge_and_tiny_history(spark):
    """r07 review: Inf/NaN and |v| >= 1e20 crashed to_dec
    (decimal.InvalidOperation -> permanently wedged stream); |v| in
    [1e10, 1e20) diverged from the batch twin's NULLed v-squared term;
    min_history=1 hit ZeroDivisionError. The try_dec gate + clamp must
    keep the automaton running and the state aligned with try_cast
    semantics."""
    import pandas as pd

    from bbt_etl_dw_spark.streaming.stateful import _make_update_zscore

    fn = _make_update_zscore(min_history=1)  # clamps to 2 internally
    st = _FakeState()
    batch = pd.DataFrame({
        "user_id": [1] * 7,
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "ts": pd.to_datetime([1, 2, 3, 4, 5, 6, 7], unit="s"),
        "value": [1.0, float("inf"), 1e10, 2.0, float("nan"), 1e21, 3.0],
    })
    out = pd.concat(list(fn((1,), iter([batch]), st)), ignore_index=True)
    # state took only 1.0, 2.0, 3.0 (inf/1e10/nan/1e21 all gated out:
    # v*v overflows decimal(38,18) for 1e10)
    n, s, ss = st.get
    assert n == 3 and s.startswith("6") and ss.startswith("14")
    # scored rows appear once history >= 2: events after the first two
    # valid values with positive variance
    assert all(z == z for z in out["z"])  # no NaN emitted


def test_funnel_automaton_skips_null_timestamps(spark):
    """r07 review: int(NaT.value) is garbage epoch -9.2e15, letting a
    NULL-ts event claim stage 0 and trivially satisfy the next gap test;
    the batch twin's NULL comparisons skip such rows."""
    import pandas as pd

    from bbt_etl_dw_spark.streaming.stateful import _make_update_funnel

    fn = _make_update_funnel(("signup", "purchase"))
    st = _FakeState()
    batch = pd.DataFrame({
        "user_id": [1, 1, 1],
        "event_id": [1, 2, 3],
        "ts": [pd.NaT, pd.Timestamp("2024-01-02"), pd.Timestamp("2024-01-03")],
        "event_type": ["signup", "signup", "purchase"],
    })
    out = pd.concat(list(fn((1,), iter([batch]), st)), ignore_index=True)
    assert out["stages_reached"].tolist() == [2]
    # stage 0 anchored at the NON-null signup, not the NaT garbage epoch
    (reached_s,) = st.get
    t0 = int(reached_s.split(",")[0])
    assert t0 == int(pd.Timestamp("2024-01-02").value) // 1000


def test_span_ingest_idempotent_progresses_past_first_batch(spark, tmp_path):
    """Pin: the index write (dynamic partition overwrite of epoch=N) may
    read the SAME index path for its left-anti probe — Spark's
    overwrite-read rejection does not fire for this shape, and batch 1+
    must progress (r07 review candidate, empirically disproved; this
    test keeps it that way)."""
    from bbt_etl_dw_spark.streaming.ops import span_ingest_batch

    sp, ix = str(tmp_path / "spans"), str(tmp_path / "index")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda")],
        "doc_id long, text string",
    )
    span_ingest_batch(b0, 0, sp, ix, idempotent=True)
    span_ingest_batch(b1, 1, sp, ix, idempotent=True)
    assert spark.read.parquet(ix).count() > 0
    # retry of batch 1 replaces its own partition: index stays distinct
    n_before = spark.read.parquet(ix).count()
    span_ingest_batch(b1, 1, sp, ix, idempotent=True)
    assert spark.read.parquet(ix).count() == n_before


def test_interval_join_left_guards_null_and_duplicate_ids(spark):
    """r07 review: the anti-join recovery cannot represent NULL left ids
    (row duplicates) and duplicate ids suppress each other — NULL raises
    in-plan, validate_unique=True proves uniqueness up front."""
    import datetime as dt

    import pytest as _pytest

    from bbt_etl_dw_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    rdf = spark.createDataFrame(
        [(1, base, 10)], "k long, rt timestamp, rid long"
    )
    ldf_null = spark.createDataFrame(
        [(1, base, None)], "k long, lt timestamp, lid long"
    )
    with _pytest.raises(Exception, match="NULL left_id"):
        interval_join(
            ldf_null, rdf, ["k"], "lt", "rt", -5, 5, how="left", left_id="lid"
        ).collect()
    ldf_dup = spark.createDataFrame(
        [(1, base, 7), (1, base, 7)], "k long, lt timestamp, lid long"
    )
    with _pytest.raises(ValueError, match="not unique"):
        interval_join(
            ldf_dup, rdf, ["k"], "lt", "rt", -5, 5,
            how="left", left_id="lid", validate_unique=True,
        )
    # ADVICE r07: two NULL-id rows must get the NULL-specific message,
    # not the misleading "not unique" (groupBy lumps NULLs into one group)
    ldf_two_nulls = spark.createDataFrame(
        [(1, base, None), (1, base, None)], "k long, lt timestamp, lid long"
    )
    with _pytest.raises(ValueError, match="contains NULLs"):
        interval_join(
            ldf_two_nulls, rdf, ["k"], "lt", "rt", -5, 5,
            how="left", left_id="lid", validate_unique=True,
        )


def test_salted_ops_deterministic_and_correct(spark):
    """r07 review: the salt is now a pure content hash (retry-stable);
    results must equal the unsalted equivalents."""
    from bbt_etl_dw_spark.operators.skew import salted_count, salted_join

    big = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, name string"
    )
    got = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join(big, small, ["k"], salt=8).collect()
    )
    want = sorted(
        (r.k, r.payload, r.name) for r in big.join(small, "k").collect()
    )
    assert got == want
    counts = {r.k: r.n_rows for r in salted_count(big, ["k"], salt=8).collect()}
    assert counts == {0: 334, 1: 333, 2: 333}


def test_stateful_ewma_final_state_equals_batch(spark, events_batch, chunked_dir):
    from bbt_etl_dw_spark.streaming.stateful import ewma_stream, final_ewma_batch

    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(spark, ewma_stream(stream, alpha=0.5), "t_ewma", "update")
    # last emitted row per user (highest n_events) == final state
    final = {
        r["user_id"]: r
        for r in got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    want = {r["user_id"]: r for r in final_ewma_batch(events_batch, 0.5).collect()}
    assert set(final) == set(want)
    for uid, row in want.items():
        assert final[uid]["n_events"] == row["n_events"]
        # EXACT equality: alpha=0.5 fold steps are exact scalings + one
        # correctly rounded add, identical in pandas-land and the JVM
        # fold, at any micro-batch slicing
        assert final[uid]["ewma"] == row["ewma"], uid


def test_stateful_attribution_stream_equals_batch(spark, events_batch, chunked_dir):
    from bbt_etl_dw_spark.operators.attribution import attribute_conversions
    from bbt_etl_dw_spark.streaming.ops import events_file_stream
    from bbt_etl_dw_spark.streaming.stateful import attribution_stream

    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(
        spark, attribution_stream(stream), "t_attr", "update"
    )
    # every conversion is emitted exactly once, in its arrival batch
    emitted = {r["event_id"]: r for r in got.collect()}
    assert len(emitted) == got.count()

    want = {
        r["event_id"]: r
        for r in attribute_conversions(
            events_batch,
            touch_pred=F.col("event_type").isin("click", "view"),
            conv_pred=F.col("event_type") == "purchase",
            touch_label=F.col("event_type"),
            lookback_days=7,
        ).collect()
    }
    assert set(emitted) == set(want)
    for eid, row in want.items():
        # EXACT equality: channel + epoch-us are integer/string decisions,
        # identical at any micro-batch slicing when arrival is time-ordered
        assert emitted[eid]["channel"] == row["channel"], eid
        assert emitted[eid]["conv_us"] == row["conv_us"], eid
        assert emitted[eid]["user_id"] == row["user_id"], eid


def test_stateful_zscore_stream_equals_batch_bitexact(
    spark, events_batch, chunked_dir
):
    """Every z the stream emits must equal the batch window's z
    BIT-FOR-BIT at this 3-micro-batch slicing: the stream's exact-decimal
    (n, sum, sumsq) state is the same quantity the batch frame
    aggregates, and both close with the identical IEEE sequence."""
    from bbt_etl_dw_spark.streaming.ops import events_file_stream
    from bbt_etl_dw_spark.streaming.stateful import zscore_stream
    from bbt_etl_dw_spark.suite.stream import user_value_zscores_batch

    stream = events_file_stream(spark, chunked_dir)
    got = _run_stream(spark, zscore_stream(stream), "t_zscore", "update")
    want = user_value_zscores_batch(events_batch)
    g = {(r.user_id, r.event_id): (r.value, r.z) for r in got.collect()}
    w = {(r.user_id, r.event_id): (r.value, r.z) for r in want.collect()}
    assert set(g) == set(w)
    assert len(g) > 0
    for k, (gv, gz) in g.items():
        wv, wz = w[k]
        assert gv == wv and gz == wz, k


def test_overwrite_atomic_rename_aside_preserves_raced_write(spark, tmp_path):
    """ADVICE r07: a write landing AFTER the pre-swap fence check but
    before the swap used to be silently destroyed by the delete+rename.
    The swap now renames the old table aside to <path>.__old__ and runs
    the EXPLICIT post_fence(old_path) before discarding it (ADVICE r08:
    formerly inferred from the fence's signature): the raced write is
    detected and PRESERVED in __old__ for manual merge."""
    import os

    from bbt_etl_dw_spark.sources.parquet import (
        ConcurrentWriteDetected,
        overwrite_atomic,
    )

    path = str(tmp_path / "tbl")
    spark.range(5).withColumn("epoch", F.lit(0)).write.partitionBy(
        "epoch"
    ).parquet(path)
    snapshot = {"epoch=0"}

    def listing(p):
        return {d for d in os.listdir(p) if d.startswith("epoch=")}

    calls = []

    def fence(at=None):
        calls.append(at)
        if at is None:
            # pre-swap check passes on the stale listing, then a lockless
            # writer lands an epoch in the window before the rename-aside
            # (mutating here is timing-equivalent: after the check, before
            # the swap)
            spark.range(100, 105).withColumn("epoch", F.lit(1)).write.mode(
                "append"
            ).partitionBy("epoch").parquet(path)
            return
        if listing(at) != snapshot:
            raise ConcurrentWriteDetected(f"raced epochs preserved at {at}")

    folded = spark.range(5).withColumn("epoch", F.lit(-1))
    with pytest.raises(ConcurrentWriteDetected, match="preserved"):
        overwrite_atomic(
            folded,
            path,
            partition_by=("epoch",),
            fence=fence,
            post_fence=lambda old: fence(at=old),
        )

    assert calls == [None, path + ".__old__"]
    # the raced epoch survives in __old__ (not silently destroyed)
    assert listing(path + ".__old__") == {"epoch=0", "epoch=1"}
    # the swap itself completed: the table shows the folded data
    assert listing(path) == {"epoch=-1"}
    assert not os.path.exists(path + ".__lock__")


def test_overwrite_atomic_refuses_preexisting_old(spark, tmp_path):
    import os

    from bbt_etl_dw_spark.sources.parquet import (
        ConcurrentWriteDetected,
        overwrite_atomic,
    )

    path = str(tmp_path / "tbl2")
    spark.range(3).write.parquet(path)
    os.makedirs(path + ".__old__")
    with pytest.raises(ConcurrentWriteDetected, match="__old__ already exists"):
        overwrite_atomic(spark.range(3), path)
    # staging cleaned, lock released, target untouched
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__lock__")
    assert spark.read.parquet(path).count() == 3


def test_overwrite_atomic_plain_fence_still_works(spark, tmp_path):
    """A fence without post_fence keeps working: called once before the
    swap; the old copy is discarded without the re-check. ADVICE r08:
    the re-check is opted into by the EXPLICIT post_fence parameter, so
    no signature shape can silently change this behavior."""
    import os

    from bbt_etl_dw_spark.sources.parquet import overwrite_atomic

    path = str(tmp_path / "tbl3")
    spark.range(4).write.parquet(path)
    calls = []

    def fence():
        calls.append("pre")

    overwrite_atomic(spark.range(7), path, fence=fence)
    assert calls == ["pre"]
    assert spark.read.parquet(path).count() == 7
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__staging__")


def test_overwrite_atomic_post_fence_partial_runs(spark, tmp_path):
    """ADVICE r08's failure mode: a functools.partial (no inspectable
    'at' parameter) used to silently downgrade the post-swap re-check.
    With the explicit post_fence parameter ANY callable runs."""
    import functools
    import os

    from bbt_etl_dw_spark.sources.parquet import overwrite_atomic

    path = str(tmp_path / "tbl4")
    spark.range(4).write.parquet(path)
    calls = []

    def check(tag, old_path):
        calls.append((tag, old_path))

    overwrite_atomic(
        spark.range(6), path, post_fence=functools.partial(check, "post")
    )
    assert calls == [("post", path + ".__old__")]
    assert spark.read.parquet(path).count() == 6
    assert not os.path.exists(path + ".__old__")


def test_salted_ops_skip_map_columns(spark):
    """ADVICE r07: a MapType column must not break the content-hash salt
    (xxhash64 cannot hash maps) — it is skipped; an all-map frame raises
    a clear error instead of an analysis failure."""
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.skew import (
        _content_hash_cols,
        salted_count,
        salted_join,
    )

    big = spark.createDataFrame(
        [(1, {"a": 1}), (1, {"b": 2}), (2, {"c": 3})],
        "k long, props map<string,int>",
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, label string")
    got = sorted(
        (r.k, r.label) for r in salted_join(big, small, ["k"], salt=4).collect()
    )
    assert got == [(1, "x"), (1, "x"), (2, "y")]
    counts = {r.k: r.n_rows for r in salted_count(big, ["k"], salt=4).collect()}
    assert counts == {1: 2, 2: 1}

    all_maps = spark.createDataFrame([({"a": 1},)], "m map<string,int>")
    with _pytest.raises(ValueError, match="MapType"):
        _content_hash_cols(all_maps)


def test_compact_epochs_occ_retry_folds_after_race(spark, tmp_path):
    """r07 stretch: retries>0 turns the pre-swap fence abort into
    compare-and-retry — the second attempt restages from a fresh listing
    that includes the racing epoch, so compaction succeeds with zero
    manual intervention and the racer is preserved unfolded."""
    import os

    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    path = str(tmp_path / "sink_occ")

    def batch(eid):
        return spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    for eid in range(3):
        _epoch_write(batch(eid), path, eid, idempotent=True)

    def racing_ingest():
        _epoch_write(batch(3), path, 3, idempotent=True)

    assert (
        compact_epochs(
            spark, path, upto_epoch=2, retries=1, _race_injection=racing_ingest
        )
        == 3
    )
    got = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())
    assert got == list(range(40))
    dirs = {d for d in os.listdir(path) if d.startswith("epoch=")}
    assert dirs == {"epoch=-1", "epoch=3"}  # 0-2 folded, racer unfolded
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__lock__")


@pytest.mark.parametrize("seed", [11, 23, 47, 83])
def test_compact_epochs_occ_fuzz_no_epoch_loss(spark, tmp_path, seed):
    """VERDICT r08 #7 (stretch): property fuzz of the OCC loop. A seeded
    random schedule injects ingest races into BOTH windows (pre-swap
    fence check -> abort+retry; post-fence swap window -> __old__
    recovery) across retry attempts. Invariant under EVERY schedule:
    no row ever lost, no row duplicated, no lock/staging/__old__ litter."""
    import os
    import random

    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"sink_fuzz_{seed}")

    def batch(eid):
        return spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    for eid in range(3):
        _epoch_write(batch(eid), path, eid, idempotent=True)
    written = [0, 1, 2]
    next_eid = [3]

    # random subset of attempt indices races the PRE-check window (each
    # forces one abort+retry), and independently the POST-check window
    # (each lands in __old__ and must be recovered losslessly)
    pre_races = {i for i in range(3) if rng.random() < 0.6}
    post_races = {i for i in range(3) if rng.random() < 0.4}
    pre_seen = [0]
    post_seen = [0]

    def ingest():
        eid = next_eid[0]
        next_eid[0] += 1
        _epoch_write(batch(eid), path, eid, idempotent=True)
        written.append(eid)

    def race_pre():
        i = pre_seen[0]
        pre_seen[0] += 1
        if i in pre_races:
            ingest()

    def race_post():
        i = post_seen[0]
        post_seen[0] += 1
        if i in post_races:
            ingest()

    folded = compact_epochs(
        spark,
        path,
        upto_epoch=2,
        retries=len(pre_races) + 1,
        _race_injection=race_pre,
        _race_injection_post_check=race_post,
    )
    assert folded >= 3  # the initial epochs always fold; racers may too

    got = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())
    want = sorted(d for e in written for d in range(e * 10, e * 10 + 10))
    assert got == want, f"seed={seed} pre={pre_races} post={post_races}"
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__lock__")


def test_compact_epochs_two_compactors_exclude_and_preserve(spark, tmp_path):
    """VERDICT r08 #7 (stretch): two concurrent compactors. The
    single-writer lock admits at most one swap at a time — the loser
    either finishes after the winner (folding nothing new) or raises
    WriterLockHeld — and under every interleaving the sink's rows
    survive intact."""
    import os
    import threading

    from bbt_etl_dw_spark.sources.parquet import WriterLockHeld
    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    path = str(tmp_path / "sink_two_writers")

    def batch(eid):
        return spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    for eid in range(4):
        _epoch_write(batch(eid), path, eid, idempotent=True)

    results: dict[str, object] = {}

    def run(tag):
        try:
            results[tag] = compact_epochs(spark, path, upto_epoch=3, retries=2)
        except Exception as e:  # loser outcomes recorded, asserted below
            results[tag] = e

    threads = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # The lock admits one swap: exactly one compactor folds the epochs.
    # The loser either ran after the winner (folds 0), raised
    # WriterLockHeld, or lost a read race against the winner's atomic
    # swap (it held no lock yet, so nothing was mutated) — never both
    # fail, never a corrupt sink.
    assert any(isinstance(v, int) and v > 0 for v in results.values()), results
    losers = [v for v in results.values() if not isinstance(v, int)]
    assert all(
        isinstance(v, (WriterLockHeld, Exception)) for v in losers
    ), results
    got = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())
    assert got == list(range(40))
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__lock__")


def test_compact_epochs_recovers_epoch_raced_into_swap_window(spark, tmp_path):
    """An epoch landing AFTER the passing pre-swap check (the narrow
    fence-to-rename window) travels into __old__ during the swap; the
    post-swap fence detects it and compact_epochs restores the directory
    into the new table — lossless, automatic, no manual merge."""
    import os

    from bbt_etl_dw_spark.streaming.ops import (
        _epoch_write,
        compact_epochs,
        read_epoch_sink,
    )

    path = str(tmp_path / "sink_window")

    def batch(eid):
        return spark.range(eid * 10, eid * 10 + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    for eid in range(3):
        _epoch_write(batch(eid), path, eid, idempotent=True)

    def post_check_ingest():
        _epoch_write(batch(3), path, 3, idempotent=True)

    assert (
        compact_epochs(
            spark,
            path,
            upto_epoch=2,
            _race_injection_post_check=post_check_ingest,
        )
        == 3
    )
    got = sorted(r.doc_id for r in read_epoch_sink(spark, path).collect())
    assert got == list(range(40))  # raced epoch 3 recovered, nothing lost
    dirs = {d for d in os.listdir(path) if d.startswith("epoch=")}
    assert dirs == {"epoch=-1", "epoch=3"}
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__lock__")
