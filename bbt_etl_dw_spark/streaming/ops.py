"""Unified batch/stream event-time operators.

Every function here takes a DataFrame that may be BATCH or STREAMING and
returns the same logical plan for both — Structured Streaming's core
promise. Watermarks are applied only on streaming inputs (they are a
no-op barrier on batch). At scale each of these is one shuffle on its
grouping keys; state-store size is bounded by the watermark horizon.

The reference pipeline has no streaming (SURVEY §2.9) — this is the
engine's scale extension (§7 phase 6) for the events table
(event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.ckpt import materialize
from pyspark.sql import types as T

from bbt_etl_dw_spark.functions.numeric import dsum

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _with_watermark(df: DataFrame, watermark: str) -> DataFrame:
    return df.withWatermark("ts", watermark) if df.isStreaming else df


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """COMMITTED-data probe. The ingest loops below use this instead of
    try/except around the index read: a bare except treated ANY failure
    (transient FS error, corrupt footer) as "first batch" and silently
    deduped against an empty index, admitting duplicates (ADVICE r05).
    With an explicit probe, real read errors propagate and fail the
    micro-batch, which Structured Streaming then retries.

    The probe asks for committed data files, not bare directory
    existence: a crash during the very first index write can leave the
    path created with only ``_temporary``/``_SUCCESS`` inside, and a
    bare ``fs.exists`` would then send every retry into an unreadable
    read (unable-to-infer-schema) forever — a permanently wedged stream.
    Hidden entries (``_*``, ``.*``) are uncommitted or metadata by the
    FileOutputCommitter contract and don't count."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    base = fs.getFileStatus(jpath).getPath().toUri().getPath()
    it = fs.listFiles(jpath, True)  # recursive: data may sit in epoch=N/
    while it.hasNext():
        f = it.next().getPath().toUri().getPath()
        rel = f[len(base):].lstrip("/")
        # committed data = no hidden (_*/.*) component below the base
        if all(not c.startswith(("_", ".")) for c in rel.split("/")):
            return True
    return False


def events_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Parquet file-source stream over an events directory. Each file is a
    micro-batch unit; in production the same plan reads Kafka/queue sources
    — only this constructor changes, never the transformations."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_event_stats(
    df: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + exact value sum.
    On a stream: append-mode emits each window once its end passes the
    watermark; state per open window is O(#event_types)."""
    return (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_stats(
    df: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping windows. Same shuffle shape as tumbling; state scales by
    the overlap factor."""
    return (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(
    df: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity; end = last event + gap (Spark session_window semantics).
    Streaming state per user is one open session row."""
    return (
        _with_watermark(df, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    df: DataFrame, keys: list[str], watermark: str | None = "2 hours"
) -> DataFrame:
    """Streaming-safe dedup on ``keys``. With a ``watermark``, stream state
    is bounded by the horizon (dropDuplicatesWithinWatermark) — duplicates
    farther apart in event time than the horizon re-emit, the price of
    bounded state at 100TB. ``watermark=None`` keeps exact forever-dedup at
    the cost of state growing with key cardinality. Batch is a plain
    dropDuplicates. Row choice is engine-arbitrary — use
    :func:`first_event_per_key` when determinism matters."""
    if df.isStreaming and watermark is not None:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def first_event_per_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic dedup: the earliest event per key (ties broken by
    event_id). Batch twin of :func:`stream_dedup` with exact semantics —
    one shuffle on the keys, rank window inside each partition."""
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def enrich_with_dim(
    df: DataFrame, dim: DataFrame, on: list[str], how: str = "inner"
) -> DataFrame:
    """Stream-static dimension enrichment: broadcast-hash join of a
    (possibly streaming) fact against a bounded static dim. Stateless on a
    stream — each micro-batch joins against the broadcast table, no
    watermark or state store involved; the static side is re-resolved per
    batch, so a dim refresh (new parquet snapshot) is picked up without
    restarting the query. The canonical Kafka-enrichment shape at scale:
    the stream never shuffles, only the dim moves."""
    return df.join(F.broadcast(dim), on=on, how=how)


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def docs_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Parquet file-source stream of document batches — the corpus-append
    feed. One file per trigger = one ingest batch."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _epoch_write(
    df: DataFrame, path: str, epoch_id: int, idempotent: bool
) -> None:
    """Ingest-sink write. Plain mode: parquet append (at-least-once — a
    batch retried after a partial append re-appends). Idempotent mode:
    each batch lands in its own ``epoch=N`` partition via DYNAMIC
    partition overwrite, so a replayed batch (same epoch_id from the
    stream checkpoint, deterministic content from the replayed source)
    OVERWRITES its own partition instead of duplicating it — exactly-once
    on plain parquet, no table format needed. Readers of idempotent sinks
    see an extra ``epoch`` partition column (drop it, or read through
    :func:`read_epoch_sink`).

    ``epoch`` is a RESERVED column name for ingest sinks in BOTH modes:
    in idempotent mode a real ``epoch`` data column would be silently
    overwritten with the batch id, and in append mode
    :func:`read_epoch_sink` could not tell data from bookkeeping when
    dropping it — so a frame already carrying the name raises here
    instead."""
    if "epoch" in df.columns:
        raise ValueError(
            "ingest sinks reserve the column name 'epoch' for replay "
            "bookkeeping — rename the data column before ingesting"
        )
    if idempotent:
        # A zero-row epoch writes zero partition directories (an
        # unreadable dataset if it is the sink's FIRST write) and has
        # nothing to replace on replay: skip it. Safe under replay
        # because batch content is deterministic — an epoch empty on the
        # replay was empty on every earlier attempt too. Costs one
        # isEmpty probe per sink per micro-batch.
        if df.isEmpty():
            return
        (
            df.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(path)
        )
    else:
        df.write.mode("append").parquet(path)


def read_epoch_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read an ingest sink uniformly: drops the ``epoch`` bookkeeping
    column if the sink was written idempotently."""
    df = spark.read.parquet(path)
    return df.drop("epoch") if "epoch" in df.columns else df


def _epoch_dirs(spark: SparkSession, path: str) -> list[str]:
    """FS listing of the sink's epoch=* partition directories."""
    from bbt_etl_dw_spark.sources.parquet import _hadoop_fs

    fs, p, _ = _hadoop_fs(spark, path)
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory() and st.getPath().getName().startswith("epoch=")
    )


class RacedEpochsPreserved(Exception):
    """Internal signal from the post-swap fence: epochs raced into the
    fence-to-rename window and are sitting in ``<path>.__old__``. Caught
    by :func:`compact_epochs` for lossless recovery; never escapes it."""

    def __init__(self, raced: list[str], missing: list[str], old_dir: str):
        self.raced = raced
        self.missing = missing
        self.old_dir = old_dir
        super().__init__(f"raced={raced} missing={missing} at {old_dir}")


def compact_epochs(
    spark: SparkSession,
    path: str,
    upto_epoch: int,
    files_per_epoch: int | None = 1,
    retries: int = 0,
    _race_injection=None,
    _race_injection_post_check=None,
) -> int:
    """Fold an idempotent sink's epoch partitions ``<= upto_epoch`` into
    the reserved ``epoch=-1`` baseline — the retention companion of the
    exactly-once ingest: without it a long-lived stream accumulates one
    partition directory (and its small files) per micro-batch forever,
    and at 100 TB partition-listing cost alone would dominate reads.

    The rewrite is one atomic full-table swap
    (sources/parquet.overwrite_atomic): replacing SOME partitions while
    deleting others cannot be atomic on plain parquet, so the crash
    outcome here is always the intact old layout, never duplicates.
    ``files_per_epoch`` coalesces the baseline (compaction exists to
    shrink file counts; None keeps the natural layout).

    Coordination contract (made loud in r07, VERDICT r06 #6): the swap
    runs under the single-writer lock (two compactors/folders exclude
    each other via WriterLockHeld), and an EPOCH FENCE re-lists the
    sink's epoch partitions immediately before the destructive swap —
    an ingest loop that committed a new epoch after this function's
    snapshot (the ingestor does not take the lock; holding it across
    every micro-batch would serialize the stream on its compactor)
    aborts the compaction with ConcurrentWriteDetected, target
    untouched, instead of the full-table swap silently DESTROYING the
    freshly ingested epoch. The stream's checkpoint must additionally be
    committed PAST ``upto_epoch`` (a folded epoch replayed later would
    re-add its rows beside the baseline).

    OCC (r07 stretch): ``retries`` > 0 turns the pre-swap fence abort
    into compare-and-RETRY — the standard optimistic loop (snapshot,
    compute, validate, commit; on conflict re-snapshot and recompute),
    sound here because each attempt restages from a FRESH listing, so a
    retried fold includes the epoch that aborted the previous attempt.
    Default stays 0 (loud abort) so an ingest hot loop cannot livelock a
    compactor silently. Independently of ``retries``, an epoch that
    races into the narrower post-fence window (landing in the
    renamed-aside ``__old__`` copy during the swap) is RECOVERED
    automatically: epoch partitions are directory-granular and the raced
    epoch cannot exist in the staged output (it landed after the read),
    so renaming its directory back into the new table is lossless —
    detection-plus-restore where r07 had detection-only and pre-r07 had
    silent destruction. ``_race_injection`` is a test-only hook between
    the staging write and the fence check; ``_race_injection_post_check``
    runs after a PASSING pre-swap check (simulating the post-fence
    window). Returns the number of epochs folded."""
    from bbt_etl_dw_spark.sources.parquet import (
        ConcurrentWriteDetected,
        _hadoop_fs,
        overwrite_atomic,
    )

    df0 = spark.read.parquet(path)
    if "epoch" not in df0.columns:
        raise ValueError(f"{path} is not an epoch-partitioned sink")

    for attempt in range(retries + 1):
        snapshot = _epoch_dirs(spark, path)
        df = spark.read.parquet(path)
        # epoch ids come from the directory listing already taken for the
        # fence snapshot — a select('epoch').distinct() would scan data
        # files of every partition (metadata-only-query is off by
        # default), a full extra pass over exactly the 100 TB sink this
        # function serves.
        folded_epochs = [
            e
            for e in (int(name.split("=", 1)[1]) for name in snapshot)
            if e != -1 and e <= upto_epoch
        ]
        if not folded_epochs:
            return 0
        staged = df.withColumn(
            "epoch",
            F.when(F.col("epoch") <= upto_epoch, F.lit(-1)).otherwise(
                F.col("epoch")
            ),
        )
        if files_per_epoch:
            staged = staged.repartition(files_per_epoch, "epoch")

        def fence(at: str | None = None) -> None:
            # Called twice by overwrite_atomic: as fence() before the
            # swap on the live target (at=None — abort leaves the target
            # untouched, eligible for the OCC retry), and as
            # post_fence(old) after the swap on the renamed-aside
            # previous table (at=<path>.__old__), where a mismatch means
            # epochs raced into the swap window and are sitting in
            # __old__ — signalled for recovery, not aborted.
            if _race_injection is not None and at is None:
                _race_injection()
            now = _epoch_dirs(spark, at or path)
            if now != snapshot:
                if at is not None:
                    raise RacedEpochsPreserved(
                        raced=sorted(set(now) - set(snapshot)),
                        missing=sorted(set(snapshot) - set(now)),
                        old_dir=at,
                    )
                raise ConcurrentWriteDetected(
                    f"compact_epochs({path}): epoch partitions changed "
                    f"during compaction (snapshot {snapshot} -> now {now})"
                    f" — a concurrent ingest committed; aborting the swap "
                    f"(target untouched). Re-run compaction; the new "
                    f"epochs fold next time."
                )
            if _race_injection_post_check is not None and at is None:
                _race_injection_post_check()

        try:
            overwrite_atomic(
                staged, path, partition_by=("epoch",), fence=fence,
                post_fence=lambda old: fence(at=old),
                owner=f"compact_epochs(upto={upto_epoch})",
            )
            return len(folded_epochs)
        except RacedEpochsPreserved as raced:
            if raced.missing:
                # dirs VANISHED during the swap — not an ingest race;
                # nothing lossless to do. __old__ stays on disk.
                raise ConcurrentWriteDetected(
                    f"compact_epochs({path}): epoch partitions "
                    f"{raced.missing} disappeared during the swap; the "
                    f"previous table is preserved at {raced.old_dir} — "
                    f"inspect and merge manually."
                ) from raced
            fs, dstp, jvm = _hadoop_fs(spark, path)
            oldp = jvm.org.apache.hadoop.fs.Path(raced.old_dir)
            for name in raced.raced:
                src = jvm.org.apache.hadoop.fs.Path(f"{raced.old_dir}/{name}")
                dst = jvm.org.apache.hadoop.fs.Path(
                    f"{path.rstrip('/')}/{name}"
                )
                # an idempotent replay may have re-landed the epoch in the
                # new table already — identical content, skip the restore
                if fs.exists(dst):
                    continue
                if not fs.rename(src, dst):
                    raise IOError(
                        f"restore of raced epoch {name} from "
                        f"{raced.old_dir} failed — merge manually"
                    ) from raced
            fs.delete(oldp, True)
            return len(folded_epochs)
        except ConcurrentWriteDetected:
            if attempt >= retries:
                raise
            # OCC retry: staging was cleaned, target untouched — loop
            # restages from a fresh snapshot that includes the racer.
    raise AssertionError("unreachable")


def _read_ingest_index(
    spark: SparkSession,
    path: str,
    epoch_id: int,
    idempotent: bool,
    empty,
) -> DataFrame:
    """The standing-index read shared by the ingest loops. On the first
    batch (path truly absent — real read errors propagate, see
    :func:`_fs_exists`) returns ``empty()``. In idempotent mode the
    CURRENT epoch's partition is excluded from the probe: a retried
    batch's earlier partial attempt must not make the batch's own rows
    look like pre-existing corpus (every row would self-collide and be
    dropped)."""
    if not _fs_exists(spark, path):
        return empty()
    idx = spark.read.parquet(path)
    if idempotent:
        idx = idx.filter(F.col("epoch") != int(epoch_id)).drop("epoch")
    return idx


def dedup_ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_path: str,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    idempotent: bool = False,
    **dedup_kwargs,
) -> None:
    """One micro-batch of the MinHash dedup ingest loop (module-level so
    retry semantics are directly testable). See
    :func:`streaming_dedup_ingest`."""
    from bbt_etl_dw_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_corpus_index,
    )

    sess = batch_df.sparkSession
    idx = _read_ingest_index(
        sess,
        index_path,
        epoch_id,
        idempotent,
        lambda: minhash_corpus_index(
            batch_df.limit(0), id_col, text_col, **dedup_kwargs
        ),
    )
    survivors = incremental_minhash_dedup(
        idx, batch_df, id_col, text_col, **dedup_kwargs
    )
    # survivors feed two sinks; materialize once, not twice
    survivors = materialize(survivors)
    _epoch_write(survivors, corpus_path, epoch_id, idempotent)
    _epoch_write(
        minhash_corpus_index(survivors, id_col, text_col, **dedup_kwargs),
        index_path,
        epoch_id,
        idempotent,
    )


def streaming_dedup_ingest(
    docs_stream: DataFrame,
    corpus_path: str,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    idempotent: bool = False,
    **dedup_kwargs,
):
    """The corpus ingest loop as a stream: per micro-batch, probe the
    persisted MinHash index (operators/dedup.incremental_minhash_dedup),
    append the surviving rows to the corpus and their index rows to the
    index. Returns the DataStreamWriter (caller .start()s it).

    This is the production shape of near-dup dedup at 100TB: the corpus
    is only ever APPENDED to, each batch costs O(batch + collisions), and
    the corpus text is never re-read — the compact index (band keys +
    hashed shingle sets) is the only standing state. foreachBatch runs
    micro-batches serially, so batch N+1 sees batch N's survivors in the
    index (in-batch and cross-batch dups both resolve).

    ``idempotent=True`` makes batch RETRIES exactly-once: every sink
    write lands in an ``epoch=N`` partition replaced by dynamic
    partition overwrite on replay, and the probe index excludes the
    current epoch so a partial earlier attempt never self-collides the
    batch (see :func:`_epoch_write` / :func:`_read_ingest_index`;
    readers drop the ``epoch`` column via :func:`read_epoch_sink`)."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_ingest_batch(
            batch_df,
            epoch_id,
            corpus_path,
            index_path,
            id_col,
            text_col,
            idempotent,
            **dedup_kwargs,
        )

    return docs_stream.writeStream.foreachBatch(ingest).outputMode("update")


def streaming_first_event_dim(
    events_stream: DataFrame,
    dim_path: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Maintain the first-event-per-user dimension incrementally — the
    standing input cohort retention needs (operators/behavior.
    retention_cohorts docstring: "at 100TB the first-event table is a
    maintained incremental dimension, not a recomputed groupBy").

    Per micro-batch, ONLY the batch's per-user minima are appended
    (O(batch users) rows, never a rewrite of the dimension — at 100TB a
    per-batch rewrite of a billion-user dim would dwarf the batch
    itself). Readers fold the appended candidates with a MIN merge
    (:func:`read_first_event_dim`); :func:`fold_first_event_dim`
    compacts the log back to one row per user when the fold cost grows.
    Returns the DataStreamWriter (caller .start()s it)."""
    from pyspark.sql import functions as F

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy(F.col(user_col).alias("user_id"))
            .agg(F.min(ts_col).alias("first_ts"))
            .write.mode("append")
            .parquet(dim_path)
        )

    return events_stream.writeStream.foreachBatch(ingest).outputMode("update")


def read_first_event_dim(spark, dim_path: str) -> DataFrame:
    """Fold the appended first-event candidates to one MIN row per user.
    The fold is a single hash aggregate over candidate rows (one small
    row per user per batch that saw that user), partial-aggregated
    map-side."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(dim_path)
        .groupBy("user_id")
        .agg(F.min("first_ts").alias("first_ts"))
    )


def fold_first_event_dim(spark, dim_path: str) -> int:
    """Compact the candidate log: rewrite ``dim_path`` as one row per
    user. Returns the folded row count. Run when the appended file count
    makes the read-side fold noticeable (the usual log + periodic-
    compaction lifecycle, same as sources/compact.py). The rewrite is a
    staging-write-then-swap (sources/parquet.overwrite_atomic): a plain
    in-place overwrite deletes the log FIRST, so a mid-write failure —
    or losing the executor holding the localCheckpoint blocks — would
    destroy the only copy. Run with no concurrent appender (an append
    landing between read and swap is lost with the old layout)."""
    from bbt_etl_dw_spark.sources.parquet import overwrite_atomic

    folded = materialize(read_first_event_dim(spark, dim_path))
    n = folded.count()
    overwrite_atomic(folded, dim_path)
    return n


def span_ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    spans_path: str,
    index_path: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    idempotent: bool = False,
) -> None:
    """One micro-batch of the span-dedup ingest loop (module-level so
    retry semantics are directly testable). See
    :func:`streaming_span_ingest`."""
    from bbt_etl_dw_spark.operators.spans import (
        incremental_span_dedup,
        span_corpus_index,
    )

    sess = batch_df.sparkSession
    idx = _read_ingest_index(
        sess,
        index_path,
        epoch_id,
        idempotent,
        lambda: span_corpus_index(batch_df.limit(0), n, id_col, text_col),
    )
    spans = incremental_span_dedup(idx, batch_df, n, id_col, text_col)
    _epoch_write(spans, spans_path, epoch_id, idempotent)
    # new digests only: the index stays distinct without a rewrite
    _epoch_write(
        span_corpus_index(batch_df, n, id_col, text_col).join(
            idx, "h", "left_anti"
        ),
        index_path,
        epoch_id,
        idempotent,
    )


def streaming_span_ingest(
    docs_stream: DataFrame,
    spans_path: str,
    index_path: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    idempotent: bool = False,
):
    """Append-time span dedup as a stream: per micro-batch, probe the
    digest-only span index for the batch's duplicated spans
    (operators/spans.incremental_span_dedup), append the detected spans
    to the removal log, and append the batch's distinct digests to the
    index. foreachBatch runs batches serially, so batch N+1 sees batch
    N's windows — cross-batch AND in-batch duplication both resolve, and
    the corpus text is never re-read (the index is the only standing
    state, same lifecycle as streaming_dedup_ingest).

    ``idempotent=True``: exactly-once batch retries via per-epoch dynamic
    partition overwrite with the current epoch excluded from the probe —
    same contract as :func:`streaming_dedup_ingest`."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        span_ingest_batch(
            batch_df,
            epoch_id,
            spans_path,
            index_path,
            n,
            id_col,
            text_col,
            idempotent,
        )

    return docs_stream.writeStream.foreachBatch(ingest).outputMode("update")


def streaming_cdc_apply(
    changes_stream: DataFrame,
    target_path: str,
    keys: list[str],
    part_col: str,
):
    """A CDC change feed (snapshot_diff-shaped rows: keys, op,
    new_<col>/old_<col>) applied to a partitioned parquet target as a
    stream: per micro-batch, operators/diff.apply_changes rewrites ONLY
    the partitions that batch touches. Returns the DataStreamWriter
    (caller .start()s it).

    foreachBatch runs micro-batches serially, so batch N+1 reads the
    target state batch N left — the same guarantee the incremental dedup
    ingest relies on. At 100 TB this is the standing consumer of an
    upstream CDC topic: per interval, O(churn) partition rewrites, never
    a table rewrite, and the target stays queryable parquet throughout."""
    from bbt_etl_dw_spark.operators.diff import apply_changes

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # no isEmpty() pre-check: apply_changes checkpoints the batch once
        # and returns before writing when it touches no partition
        apply_changes(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys=keys,
            part_col=part_col,
        )

    return changes_stream.writeStream.foreachBatch(apply_batch).outputMode("update")


EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def embeddings_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Parquet file-source stream of embedding batches — the vector-corpus
    append feed. One file per trigger = one ingest batch."""
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def semantic_ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_path: str,
    index_path: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    idempotent: bool = False,
) -> None:
    """One micro-batch of the semantic-dedup ingest loop (module-level so
    retry semantics are directly testable). See
    :func:`streaming_semantic_ingest`."""
    from bbt_etl_dw_spark.operators.similarity import (
        incremental_semantic_dedup,
        semantic_index,
    )

    sess = batch_df.sparkSession
    idx = _read_ingest_index(
        sess,
        index_path,
        epoch_id,
        idempotent,
        lambda: semantic_index(batch_df.limit(0), centroids, id_col, vec_col),
    )
    survivors = incremental_semantic_dedup(
        idx, batch_df, centroids, threshold, id_col, vec_col
    ).localCheckpoint()  # two sinks; materialize once
    _epoch_write(survivors.drop("cluster_id"), corpus_path, epoch_id, idempotent)
    _epoch_write(
        semantic_index(survivors.drop("cluster_id"), centroids, id_col, vec_col),
        index_path,
        epoch_id,
        idempotent,
    )


def streaming_semantic_ingest(
    emb_stream: DataFrame,
    corpus_path: str,
    index_path: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    idempotent: bool = False,
):
    """Semantic (embedding) dedup as an ingest stream — the SemDeDup twin
    of :func:`streaming_dedup_ingest`: per micro-batch, probe the
    persisted assigned index (operators/similarity.semantic_index) under
    FROZEN centroids, append surviving vectors to the corpus and their
    index rows to the index. Returns the DataStreamWriter (caller
    .start()s it).

    Scale shape: centroids are plan literals (retraining is a scheduled
    compaction, never a per-batch cost); the index join probes only the
    clusters the batch lands in; foreachBatch serializes micro-batches so
    batch N+1 sees batch N's survivors — cross-batch AND in-batch
    near-dups both resolve, exactly as sequential batch application
    (pytest-asserted equal).

    Retry contract (shared by all three ingest loops): with the default
    append sinks, a micro-batch that fails BEFORE its first append is
    retried cleanly, but a crash BETWEEN the corpus append and the index
    append can re-admit that batch's survivors on retry (at-least-once).
    ``idempotent=True`` closes that window — per-epoch dynamic partition
    overwrite replaces a replayed batch's own partition, and the probe
    index excludes the current epoch so the partial attempt never
    self-collides the batch (exactly-once on plain parquet; readers drop
    the ``epoch`` column via :func:`read_epoch_sink`)."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        semantic_ingest_batch(
            batch_df,
            epoch_id,
            corpus_path,
            index_path,
            centroids,
            threshold,
            id_col,
            vec_col,
            idempotent,
        )

    return emb_stream.writeStream.foreachBatch(ingest).outputMode("update")
