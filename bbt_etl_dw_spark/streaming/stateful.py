"""Custom stateful streaming operator: per-user running totals.

``applyInPandasWithState`` is the engine's escape hatch for stateful
semantics the built-in windowed aggregates can't express (the SURVEY §7
"custom stateful operator" slot). State here is one (count, sum) pair per
user — O(#users) across the cluster, partitioned by the grouping key.

The deterministic batch twin is :func:`running_totals_batch` (a cumulative
window over the same keys) — pytest asserts the stream's final emitted row
per user equals the batch result; the suite registers the batch twin with
a SQL oracle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bbt_etl_dw_spark.functions.numeric import dsum

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
# total is a decimal digit string, NOT a double: state accumulates exactly
# (same discipline as functions/numeric.dsum) so the stream's final row is
# bit-identical to the batch twin regardless of batch boundaries or
# accumulation order — not merely close within float tolerance.
STATE_SCHEMA = "n long, total string"


def _make_update_user_totals():
    # nested def => cloudpickle ships it by value; executors' Python
    # workers may not have this package importable (see multimodal.py)
    def update_user_totals(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import decimal

        import pandas as _pd

        n, total_s = state.get if state.exists else (0, "0")
        # Decimal(repr(double)) is the shortest-repr string->decimal hop
        # dsum uses; summing Decimals is exact. Python's float(Decimal) is
        # correctly rounded, matching Spark's decimal-string->double cast.
        total = decimal.Decimal(total_s)
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"].dropna():
                fv = float(v)
                # mirror the batch twins' decimal(38,18) try_cast EXACTLY:
                # NaN/Inf and |v| >= 1e20 cast to NULL there (skipped by
                # SUM) — accumulating them here made the documented
                # stream == batch equality false for such rows (review
                # finding)
                if fv != fv or fv in (float("inf"), float("-inf")):
                    continue
                if abs(fv) >= 1e20:
                    continue
                total += decimal.Decimal(repr(fv))
        state.update((n, str(total)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [float(total)]}
        )

    return update_user_totals


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming: emit the updated cumulative (count, sum) per user every
    micro-batch that touches that user. Arrow-batched state updates — the
    Python boundary is per-group-per-batch, never per-row."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_totals(),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def final_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stream's final state: one exact aggregate."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value")
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Per-event running totals (what the stream would have emitted had
    every event been its own batch). Cumulative decimal-sum window => exact
    and order-independent, so it matches any engine's oracle bit-for-bit."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        F.sum(F.col("value").cast("string").try_cast("decimal(38,18)")).over(w)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events"),
        running.cast("string").cast("double").alias("running_value"),
    )


# --- streaming funnel progression ----------------------------------------

FUNNEL_OUTPUT_SCHEMA = "user_id long, stages_reached int"
# Reached-stage timestamps as comma-joined epoch micros: exact integer
# state (no float drift), variable funnel depth in a fixed state schema.
FUNNEL_STATE_SCHEMA = "reached string"


def _make_update_funnel(steps: tuple[str, ...]):
    def update_funnel(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (reached_s,) = state.get if state.exists else ("",)
        reached = [int(x) for x in reached_s.split(",") if x]
        rows = _pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], na_position="first")
        for _, r in rows.iterrows():
            if len(reached) >= len(steps):
                break
            # NULL event time has no position in event-time order: the
            # batch twin's min(when(reached, t)) skips NULL t and every
            # `t > prev` comparison is NULL — mirrored by skipping the
            # row (int(NaT.value) is garbage epoch -9.2e15; r07 review)
            if _pd.isna(r["ts"]):
                continue
            t = int(r["ts"].value) // 1000  # ns -> us
            if r["event_type"] == steps[len(reached)] and (
                not reached or t > reached[-1]
            ):
                reached.append(t)
        state.update((",".join(str(x) for x in reached),))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "stages_reached": [len(reached)]}
        )

    return update_funnel


def funnel_progress_stream(events: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """Streaming funnel progression: per user, how many ordered stages
    (steps[0] then steps[1] strictly after it, ...) have been reached so
    far — emitted every micro-batch that touches the user. State is the
    reached-stage timestamps (O(depth) integers per user, keyed state
    partitioned by user). CONTRACT: ordered arrival across batches (same
    as first_event_per_key's streaming twin); within a batch events are
    sorted by event time before the automaton runs, so only cross-batch
    disorder would need a watermark+retention design. The batch twin is
    operators/behavior.funnel_stage_counts — pytest asserts the stream's
    final per-user depth reproduces its stage counts exactly."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_funnel(tuple(steps)),
        FUNNEL_OUTPUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- streaming EWMA (recursive smoother as keyed state) -------------------

EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma double"
# acc is a plain double: with alpha = 0.5 both fold multiplications are
# EXACT (scaling by a power of two), so the only rounding per step is the
# one correctly rounded addition — the stream state equals the batch fold
# bit-for-bit at any micro-batch slicing (same argument as
# operators/smooth.trailing_ewma, which is the bounded-window batch
# variant of this operator).
EWMA_STATE_SCHEMA = "n long, acc double"


def _make_update_ewma(alpha: float):
    a = float(alpha)
    b = 1.0 - a

    def update_ewma(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, acc = state.get if state.exists else (0, None)
        batch = _pd.concat(list(pdfs), ignore_index=True)
        # events arrive per micro-batch unordered within the batch: the
        # recursion is order-sensitive, so impose the same total order
        # the batch twin folds in (ts, then event_id tie-break)
        batch = batch.sort_values(["ts", "event_id"], na_position="first")
        for v in batch["value"]:
            # skip BOTH null and NaN: pandas folds SQL NULL into NaN
            # (float64 column), so the stream cannot tell them apart —
            # the batch twin filters the same pair for lock-step
            if v is None or v != v:
                continue
            fv = float(v)
            acc = fv if n == 0 else a * fv + b * acc
            n += 1
        state.update((n, acc))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [acc]}
        )

    return update_ewma


def ewma_stream(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming full-history EWMA per user — the recursive smoother as a
    custom stateful operator (state: one (n, acc) pair per key, O(#users)
    cluster-wide). Emits the updated smoothed value per touched user per
    micro-batch. The bounded-window batch variant is
    operators/smooth.trailing_ewma; the exact batch twin of the FINAL
    state is :func:`final_ewma_batch`."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_ewma(alpha),
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def final_ewma_batch(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Batch twin of the stream's final EWMA state: sort each user's
    (non-null) values into one array and fold the recursion over it.
    The per-key collect is bounded by events-per-user (a per-entity
    history, not the corpus); for a corpus-bounded formulation use
    trailing_ewma."""
    a = F.lit(float(alpha))
    b = F.lit(1.0 - float(alpha))
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts"), F.col("event_id"), F.col("value").cast("double").alias("v")
            )
        )
    )
    vals = F.filter(
        F.transform(arr, lambda s: s["v"]),
        lambda v: v.isNotNull() & ~F.isnan(v),
    )

    def step(acc, x):
        return F.when(acc.isNull(), x).otherwise(a * x + b * acc)

    return events.groupBy("user_id").agg(
        F.size(vals).cast("long").alias("n_events"),
        F.aggregate(vals, F.lit(None).cast("double"), step).alias("ewma"),
    )


# --- streaming last-touch attribution -------------------------------------

ATTR_OUTPUT_SCHEMA = (
    "user_id long, event_id long, conv_us long, channel string, value double"
)
# "no touch yet" encodes as (\"\", -1): GroupState round-trips of typed
# None fields are avoided the same way the EWMA state avoids them
ATTR_STATE_SCHEMA = "t_label string, t_us long"

ATTR_DIRECT = "direct"


def _make_update_attribution(
    touch_types: tuple[str, ...], conv_type: str, lookback_us: int
):
    touch = frozenset(touch_types)
    lb = int(lookback_us)

    def update_attribution(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        t_label, t_us = state.get if state.exists else ("", -1)
        out: dict[str, list] = {
            "user_id": [], "event_id": [], "conv_us": [], "channel": [],
            "value": [],
        }
        batch = _pd.concat(list(pdfs), ignore_index=True)
        # same total order the batch twin's window folds in; within a
        # micro-batch rows arrive unordered
        batch = batch.sort_values(["ts", "event_id"], na_position="first")
        for row in batch.itertuples():
            # NULL event time: no position in event-time order — the
            # stream's ordering contract is meaningless for it, and
            # Timestamp(NaT).value is garbage (r07 review). Skipped; the
            # batch twin handles such rows per SQL NULL semantics (a
            # NULL-ts conversion surfaces as 'direct' with NULL conv_us).
            if _pd.isna(row.ts):
                continue
            us = _pd.Timestamp(row.ts).value // 1000  # ns -> µs, integer
            et = row.event_type
            if et in touch:
                t_label, t_us = et, us
            if et == conv_type:
                if t_us >= 0 and us - t_us <= lb:
                    ch = t_label
                else:
                    ch = ATTR_DIRECT
                out["user_id"].append(key[0])
                out["event_id"].append(row.event_id)
                out["conv_us"].append(us)
                out["channel"].append(ch)
                out["value"].append(row.value)
        state.update((t_label, t_us))
        yield _pd.DataFrame(out)

    return update_attribution


def attribution_stream(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("click", "view"),
    conv_type: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """Streaming last-touch attribution as a custom stateful operator:
    state is ONE (label, epoch-µs) pair per user — O(#users) cluster-wide,
    partitioned on the grouping key — and each conversion is emitted
    exactly once, in the micro-batch it arrives in. The bit-exact batch
    twin is operators/attribution.attribute_conversions: all decisions
    are integer epoch-µs comparisons and string equality, so stream and
    batch agree exactly (not within tolerance) when events arrive in
    event-time order across micro-batches — the streaming contract the
    stream-equals-batch pytest pins."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_attribution(
            touch_types, conv_type, lookback_days * 86_400_000_000
        ),
        ATTR_OUTPUT_SCHEMA,
        ATTR_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- streaming per-user z-score anomaly scoring ----------------------------

ZSCORE_OUTPUT_SCHEMA = "user_id long, event_id long, value double, z double"
# exact-decimal sufficient statistics ride as STRINGS (GroupState has no
# decimal type; the digit string round-trips losslessly) — the same
# mergeable (n, Σv, Σv²) formulation the batch window uses, so stream
# state equals the batch frame bit-for-bit at any micro-batch slicing
ZSCORE_STATE_SCHEMA = "n long, sum_s string, sumsq_s string"
ZSCORE_MIN_HISTORY = 8


def _make_update_zscore(min_history: int):
    # n >= 2 is required by the var denominator (n-1): min_history=1
    # would divide by 0.0 — ZeroDivisionError in Python where the batch
    # twin's double division just yields non-finite and skips (r07
    # review). Clamp rather than crash the stream.
    mh = max(int(min_history), 2)

    def update_zscore(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import decimal as _d
        import math as _math

        import pandas as _pd

        # prec=60 keeps every add exact at decimal(38,18) magnitudes
        ctx = _d.Context(prec=60)
        q18 = _d.Decimal("1.000000000000000000")

        def try_dec(x: float):
            # mirror of Spark's try_cast(double -> decimal(38,18)): NULL
            # for NaN/Inf and for values whose integer part needs > 20
            # digits (|x| >= 1e20). Without the mirror, Inf crashed the
            # stateful task (decimal.InvalidOperation — a permanently
            # wedged stream), and |v| in [1e10, 1e20) diverged from the
            # batch twin's NULLed v² term (r07 review).
            if not _math.isfinite(x):
                return None
            d0 = ctx.create_decimal(repr(x))
            # magnitude check BEFORE quantize: quantizing a huge value to
            # 18 dp needs more digits than prec and raises InvalidOperation
            if d0.adjusted() >= 20:
                return None
            d = d0.quantize(q18, rounding=_d.ROUND_HALF_UP, context=ctx)
            # rounding can push 9.99…e19 over the boundary
            if d.adjusted() >= 20:
                return None
            return d

        n, s_s, ss_s = state.get if state.exists else (0, "0", "0")
        s, ss = _d.Decimal(s_s), _d.Decimal(ss_s)
        batch = _pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], na_position="first")
        uids, eids, vals, zs = [], [], [], []
        for _, r in batch.iterrows():
            v = r["value"]
            if v is None or v != v:  # SQL NULL folded to NaN by pandas
                continue
            fv = float(v)
            if n >= mh:
                # score against the PRIOR state: float(Decimal) is
                # correctly rounded, identical to the batch twin's
                # decimal->string->double hop; the close is the same
                # fixed IEEE sequence
                nd, sd, ssd = float(n), float(s), float(ss)
                mean = sd / nd
                var = (ssd - (sd * sd) / nd) / (nd - 1.0)
                if var > 0.0:
                    uids.append(key[0])
                    eids.append(int(r["event_id"]))
                    vals.append(fv)
                    zs.append((fv - mean) / _math.sqrt(var))
            # a row enters the state only when BOTH v and v² fit the
            # decimal — full pairwise deletion, same gate as the batch
            # twin's `ok` (mismatched n/s/ss could fabricate negative
            # variance)
            dv, dvv = try_dec(fv), try_dec(fv * fv)
            if dv is None or dvv is None:
                continue
            s = ctx.add(s, dv)
            ss = ctx.add(ss, dvv)
            n += 1
        state.update((n, str(s), str(ss)))
        yield _pd.DataFrame(
            {"user_id": uids, "event_id": eids, "value": vals, "z": zs}
        )

    return update_zscore


def zscore_stream(events: DataFrame, min_history: int = ZSCORE_MIN_HISTORY) -> DataFrame:
    """Streaming per-user anomaly scoring: each event's value z-scored
    against that user's FULL PRIOR history (never including itself), the
    per-entity streaming twin of the batch trailing z-score detector
    (suite `nation_revenue_zscore_anomalies` / `events_user_value_zscores`).
    State is the mergeable (n, Σv, Σv²) triple as exact decimals —
    O(#users) cluster-wide — so every emitted z is bit-equal to the
    batch window's at any micro-batch slicing (pytest-pinned). Ordered
    arrival across batches is the contract, as for every stateful twin
    here; within a batch events re-sort by (ts, event_id)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_zscore(min_history),
        ZSCORE_OUTPUT_SCHEMA,
        ZSCORE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
