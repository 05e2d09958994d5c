"""Incremental summary-table (materialized aggregate) maintenance.

The classic warehouse pattern the reference's full-reload ETL cannot do
(its loads are complete overwrites, ``etl_load.py`` — cited for parity
scope): keep a per-key aggregate table current as fact batches arrive,
WITHOUT ever re-scanning history or rewriting the whole summary. The
engine already maintains one such table for a single aggregate
(``streaming/ops.streaming_first_event_dim`` — MIN over first-event
timestamps); this module is the general operator for any bundle of
MERGEABLE aggregates:

- ``count``   — per-batch counts; merged by SUM
- ``sum``     — per-batch EXACT decimal sums (functions/numeric
  discipline); merged by decimal SUM, cast to double only at the read
  boundary. Exactness is what makes *incremental == recompute-from-
  scratch* an equality, not an approximation: float partial sums would
  drift with batch boundaries.
- ``min`` / ``max`` — per-batch extrema; merged by MIN/MAX
- ``argmin`` / ``argmax`` — the payload at the key's extreme order
  value, as struct(ord, payload) partials merged by struct MIN/MAX.
  ``argmax`` over an event-time column is an incrementally-maintained
  latest-state (SCD-type-1 current) view per key.
- ``avg`` is DERIVED at read time from sum + count (never stored — a
  stored mean cannot merge)

Lifecycle (same log-plus-compaction shape as the first-event dim and
sources/compact.py):

- :func:`partial_summary` reduces ONE batch to one row per key it
  touches — O(batch keys) appended rows, never a summary rewrite (at
  100 TB rewriting a billion-key summary per batch would dwarf the
  batch);
- :func:`streaming_summary` runs that per micro-batch via foreachBatch;
- :func:`read_summary` folds the appended partials with each column's
  merge function — one hash aggregate, partial-aggregated map-side;
- :func:`fold_summary` compacts the log back to one row per key when
  the read-side fold grows noticeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import _dec, _dec_to_double

# spec: {out_col: ("count", None) | ("sum"|"min"|"max", in_col)
#        | ("argmin"|"argmax", (order_col, payload_col))}
# argmin/argmax keep the PAYLOAD at the key's extreme order value — the
# mergeable form of "latest state per key" (argmax over an event-time
# column is an incrementally-maintained SCD-type-1 current view; history
# is never re-scanned to refresh it). Partials store struct(ord, payload)
# and merge by struct MIN/MAX, whose field-order comparison makes the
# payload itself the deterministic tie-break.
_FNS = ("count", "sum", "min", "max", "argmin", "argmax")


def _check_specs(
    specs: dict[str, tuple[str, str | None]], keys: list[str] | None = None
) -> None:
    # 'epoch' is the log's exactly-once partition column: fold_summary
    # detects a streaming-written log by its presence and DROPS it, so a
    # user key or output column with that name would be silently lost or
    # misread as partition metadata (r07 review; same reserved-name
    # discipline as er.blocked_fuzzy_lookup).
    reserved = {"epoch"} & ({*specs} | set(keys or ()))
    if reserved:
        raise ValueError(
            "summary: 'epoch' is reserved for the log's partition column "
            "— rename the key/output column"
        )
    for out, (fn, col) in specs.items():
        if fn not in _FNS:
            raise ValueError(
                f"summary column {out!r}: {fn!r} is not mergeable — "
                f"supported: {_FNS} (derive avg from sum+count at read)"
            )
        if fn in ("argmin", "argmax"):
            if not (isinstance(col, tuple) and len(col) == 2):
                raise ValueError(
                    f"summary column {out!r}: {fn} needs an "
                    f"(order_col, payload_col) pair"
                )
        elif fn != "count" and col is None:
            raise ValueError(f"summary column {out!r}: {fn} needs a column")


def partial_summary(
    batch: DataFrame, keys: list[str], specs: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """One batch reduced to one partial row per touched key. Sums are
    stored as exact decimals so later merges are order- and
    batch-boundary-independent."""
    _check_specs(specs, keys)
    aggs = []
    for out, (fn, col) in specs.items():
        if fn == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif fn == "sum":
            # numeric._dec carries the cross-engine cast discipline —
            # never open-code the double->decimal conversion
            aggs.append(F.sum(_dec(F.col(col))).alias(out))
        elif fn == "min":
            aggs.append(F.min(col).alias(out))
        elif fn == "max":
            aggs.append(F.max(col).alias(out))
        else:  # argmin / argmax: struct extremum keeps ord + payload
            ord_col, payload_col = col
            pair = F.when(
                # null order = no position in the ordering: such rows
                # must not win (a null struct FIELD would sort first and
                # hijack argmin); a null STRUCT is skipped by min/max
                F.col(ord_col).isNotNull(),
                F.struct(
                    F.col(ord_col).alias("o"), F.col(payload_col).alias("p")
                ),
            )
            agg = F.min(pair) if fn == "argmin" else F.max(pair)
            aggs.append(agg.alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def append_summary_batch(
    batch: DataFrame,
    path: str,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
    epoch_id: int | None = None,
) -> None:
    """Reduce ``batch`` and append its partial rows to the summary log.
    With ``epoch_id``, the partials land in an ``epoch=N`` partition via
    dynamic overwrite — re-applying the same (batch, epoch) replaces its
    own earlier rows instead of double-counting them (count/sum are NOT
    duplicate-tolerant the way the first-event dim's MIN merge is), the
    same exactly-once mechanism as streaming/ops._epoch_write."""
    from bbt_etl_dw_spark.streaming.ops import _epoch_write

    partial = partial_summary(batch, keys, specs)
    if epoch_id is None:
        partial.write.mode("append").parquet(path)
    else:
        _epoch_write(partial, path, epoch_id, idempotent=True)


def streaming_summary(
    stream: DataFrame,
    path: str,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
):
    """Maintain the summary log from a stream: per micro-batch, append
    the batch's partial rows (O(batch keys), never a rewrite). Returns
    the DataStreamWriter (caller .start()s it).

    Batch replays are exactly-once: partials are keyed by the stream's
    epoch_id (per-epoch dynamic overwrite), so a micro-batch replayed
    after a crash-between-append-and-checkpoint replaces its own rows —
    an unguarded append would permanently double-count every key the
    batch touched. Consequence for compaction: :func:`fold_summary`
    collapses the epoch partitions, so run it only with the stream
    stopped AND its checkpoint committed past the folded epochs (a
    pre-fold epoch replayed after folding would re-add its partial on
    top of the folded total)."""
    _check_specs(specs, keys)

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        append_summary_batch(batch_df, path, keys, specs, epoch_id=epoch_id)

    return stream.writeStream.foreachBatch(ingest).outputMode("update")


def _merge_aggs(
    specs: dict[str, tuple[str, str | None]], keep_decimal: bool = False
) -> list:
    """Fold expressions over partial rows. ``keep_decimal`` keeps the
    LOG form (sums in decimal, argmin/argmax as packed structs) for
    re-writing a compacted log that will keep merging exactly; the
    default produces the READ form (sums as double, arg payloads
    unpacked)."""
    aggs = []
    for out, (fn, _col) in specs.items():
        if fn == "count":
            aggs.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            # decimal sum of decimal partials == the direct decimal sum
            # over raw rows (associative)
            s = F.sum(out)
            aggs.append((s if keep_decimal else _dec_to_double(s)).alias(out))
        elif fn == "min":
            aggs.append(F.min(out).alias(out))
        elif fn == "max":
            aggs.append(F.max(out).alias(out))
        else:  # argmin/argmax: merge the struct partials; unpack the
            # payload at the read boundary, keep the struct in a fold
            m = F.min(out) if fn == "argmin" else F.max(out)
            aggs.append((m if keep_decimal else m["p"]).alias(out))
    return aggs


def read_summary(
    spark: SparkSession,
    path: str,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
    derived_avgs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Fold the partial log to the current summary: one hash aggregate
    over candidate rows. ``derived_avgs`` adds mean columns computed from
    already-folded (sum_col, count_col) pairs — exact decimal sum over
    exact long count, one IEEE division, bit-stable at any batching."""
    _check_specs(specs, keys)
    out = spark.read.parquet(path).groupBy(*keys).agg(*_merge_aggs(specs))
    for avg_col, (sum_col, count_col) in (derived_avgs or {}).items():
        out = out.withColumn(
            avg_col, F.col(sum_col) / F.col(count_col).cast("double")
        )
    return out


def fold_summary(
    spark: SparkSession,
    path: str,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
) -> int:
    """Compact the partial log to one row per key. The folded sums stay
    decimal so further appends keep merging exactly. Returns the folded
    row count.

    The rewrite goes through sources/parquet.overwrite_atomic (full
    staging write, then swap) — a plain in-place ``mode("overwrite")``
    deletes the log FIRST, so a mid-write failure would destroy the only
    copy. Coordination contract: run with no concurrent writer — an
    append landing between the fold's read and its swap is deleted with
    the old log; for a streaming writer, also see
    :func:`streaming_summary` (fold only past the stream's committed
    checkpoint, or a replayed pre-fold epoch double-counts)."""
    from bbt_etl_dw_spark.sources.parquet import overwrite_atomic

    _check_specs(specs, keys)
    log = spark.read.parquet(path)
    epoch_layout = "epoch" in log.columns  # streaming-written log
    if epoch_layout:
        log = log.drop("epoch")
    folded = log.groupBy(*keys).agg(*_merge_aggs(specs, keep_decimal=True))
    if epoch_layout:
        # keep the partitioned layout: the compacted baseline lands in a
        # reserved epoch=-1 partition (base-level files mixed with
        # epoch=N dirs would break partition discovery for later writes)
        folded = folded.withColumn("epoch", F.lit(-1))
    from bbt_etl_dw_spark.operators.ckpt import materialize

    folded = materialize(folded)
    n = folded.count()
    overwrite_atomic(
        folded, path, partition_by=("epoch",) if epoch_layout else ()
    )
    return n
