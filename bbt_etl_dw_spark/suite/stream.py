"""Event-time streaming suite over the events table.

Each query runs the SAME transformation the streaming path uses
(bbt_etl_dw_spark.streaming.ops) on the batch events table — Structured
Streaming's unified semantics make the batch result the ground truth for
the stream, so these are oracle-checkable; the real readStream →
micro-batch → memory-sink execution of the identical plans is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import sql_dsum
from bbt_etl_dw_spark.streaming.ops import (
    first_event_per_key,
    session_window_stats,
    sliding_event_stats,
    tumbling_event_stats,
)
from bbt_etl_dw_spark.streaming.stateful import running_totals_batch
from bbt_etl_dw_spark.suite import register

_TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'total_value')}
FROM events
GROUP BY 1, 2, 3 ORDER BY 1, 3
"""


@register("events_tumbling_hourly", oracle=_TUMBLING_ORACLE, bench=True)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows per event_type — the canonical
    streaming aggregation, run in batch mode (identical plan on a stream
    with a 2h watermark). One shuffle on (window, event_type)."""
    ev = table(spark, sf_dir, "events")
    return tumbling_event_stats(ev, "1 hour").orderBy("window_start", "event_type")


_SLIDING_ORACLE = f"""
WITH fanout AS (
    SELECT event_type, value,
           UNNEST([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
               AS window_start
    FROM events
)
SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'total_value')}
FROM fanout
GROUP BY 1, 2, 3 ORDER BY 1, 3
"""


@register("events_sliding_2h1h", oracle=_SLIDING_ORACLE)
def events_sliding_2h1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows hopping every 1h: each event contributes to
    exactly window/slide = 2 windows (the oracle fans out both starts)."""
    ev = table(spark, sf_dir, "events")
    return sliding_event_stats(ev, "2 hours", "1 hour").orderBy(
        "window_start", "event_type"
    )


_SESSION_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
), numbered AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS session_id
    FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'total_value')}
FROM numbered
GROUP BY user_id, session_id ORDER BY user_id, session_start
"""


@register("events_session_windows", oracle=_SESSION_ORACLE)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30 min inactivity closes the
    session; end = last event + gap). The oracle is the classic
    gaps-and-islands rewrite — Spark's session_window must agree."""
    ev = table(spark, sf_dir, "events")
    return session_window_stats(ev, "30 minutes").orderBy("user_id", "session_start")


_FIRST_EVENT_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id
    ) AS rn
    FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
"""


@register("events_first_per_user_type", oracle=_FIRST_EVENT_ORACLE)
def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic streaming-dedup twin: earliest event per
    (user_id, event_type). The stream path is dropDuplicatesWithinWatermark
    (state bounded by the watermark horizon) — asserted equivalent on
    ordered arrival in tests/test_streaming.py."""
    ev = table(spark, sf_dir, "events")
    return first_event_per_key(ev, ["user_id", "event_type"]).orderBy(
        "user_id", "event_type"
    )


_RUNNING_ORACLE = """
SELECT user_id, event_id, ts,
       COUNT(*) OVER w AS n_events,
       CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) OVER w
            AS VARCHAR) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@register("events_running_user_totals", oracle=_RUNNING_ORACLE)
def events_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event running (count, value-sum) per user — the batch twin of
    the custom applyInPandasWithState stateful operator; cumulative decimal
    window keeps it exact and oracle-matchable."""
    ev = table(spark, sf_dir, "events")
    return running_totals_batch(ev).orderBy("user_id", "event_id")


_INTERVAL_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       p.ts AS purchase_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


@register("events_interval_join", oracle=_INTERVAL_ORACLE)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: each purchase paired with the same user's clicks in
    the preceding hour. Time-bucketed equi-join fan-out (never a nested
    loop — SURVEY §2.3 'range joins absent'); the streaming twin is the
    native watermarked stream-stream join, asserted equivalent in
    tests/test_streaming.py."""
    from bbt_etl_dw_spark.operators.rangejoin import interval_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    j = interval_join(
        purchases, clicks, ["user_id"], "purchase_ts", "click_ts", -3600, 0
    )
    return j.select(
        "purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"
    ).orderBy("purchase_id", "click_id")


_INTERVAL_LEFT_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       p.ts AS purchase_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


@register("events_interval_join_left", oracle=_INTERVAL_LEFT_ORACLE)
def events_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT interval join: every purchase kept, preceding-hour clicks
    attached where they exist. The bucket fan-out makes a naive left join
    wrong (one null row per probed bucket), so the operator recovers
    unmatched rows with an anti join on the unique left key — the shape a
    100TB attribution pipeline needs (no row loss, no nested loop)."""
    from bbt_etl_dw_spark.operators.rangejoin import interval_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    j = interval_join(
        purchases,
        clicks,
        ["user_id"],
        "purchase_ts",
        "click_ts",
        -3600,
        0,
        how="left",
        left_id="purchase_id",
    )
    return j.select(
        "purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"
    ).orderBy("purchase_id", "click_id")


_DIM_ENRICH_ORACLE = f"""
SELECT date_trunc('hour', e.ts) AS window_start,
       date_trunc('hour', e.ts) + INTERVAL 1 HOUR AS window_end,
       n.n_name AS nation,
       COUNT(*) AS n_events,
       {sql_dsum('e.value', 'total_value')}
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY 1, 2, 3 ORDER BY 1, 3
"""


@register("events_dim_enrich_hourly", oracle=_DIM_ENRICH_ORACLE)
def events_dim_enrich_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment + tumbling hourly rollup per
    nation: the fact (stream) side broadcast-joins the bounded nation dim
    (stateless — no watermark, dim re-resolved per micro-batch), then windows
    as usual. tests/test_streaming.py runs this very plan as a real
    micro-batch stream."""
    from bbt_etl_dw_spark.functions.numeric import dsum
    from bbt_etl_dw_spark.streaming.ops import enrich_with_dim

    ev = table(spark, sf_dir, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("long")
    )
    dim = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        enrich_with_dim(ev, dim, ["n_nationkey"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "nation")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "nation",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "nation")
    )


# --------------------------------------------------------------------------
# Incremental summary-table maintenance (operators/summary.py) — the
# materialized-aggregate log+fold pattern, value-checked end to end:
# the oracle recomputes the summary DIRECTLY from raw events, so the
# driver row proves incremental-over-3-batches == full recompute.
# --------------------------------------------------------------------------

_SUMMARY_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'total_value')},
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# Per-process cache of the maintained summary log (same lifecycle as
# classic._dpp_fact_path: one mkdtemp + one incremental build per
# (process, sf_dir), atexit cleanup).
_SUMMARY_LOG_CACHE: dict[str, str] = {}

_SUMMARY_SPECS = {
    "n_events": ("count", None),
    "total_value": ("sum", "value"),
    "first_ts": ("min", "ts"),
    "last_ts": ("max", "ts"),
}


def _summary_log_path(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from bbt_etl_dw_spark.operators.summary import (
        append_summary_batch,
        fold_summary,
    )

    if sf_dir in _SUMMARY_LOG_CACHE:
        return _SUMMARY_LOG_CACHE[sf_dir]
    path = tempfile.mkdtemp(prefix="bbt_summary_log_")
    ev = table(spark, sf_dir, "events")
    # three deterministic disjoint batches (hash split covers every row)
    for b in range(3):
        batch = ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(3)) == b)
        append_summary_batch(batch, path, ["event_type"], _SUMMARY_SPECS)
        if b == 1:  # compact mid-history: the fold is on the oracled path
            fold_summary(spark, path, ["event_type"], _SUMMARY_SPECS)
    _SUMMARY_LOG_CACHE[sf_dir] = path
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


@register("events_incremental_summary", oracle=_SUMMARY_ORACLE)
def events_incremental_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental summary-table maintenance, value-checked: the events
    fact is applied in three disjoint batches through
    operators/summary.append_summary_batch (O(batch keys) appended
    partial rows each — never a summary rewrite), with an in-place
    compaction after the second batch; the returned fold must equal the
    oracle's DIRECT aggregate over all raw events — exactly, including
    the double sum, because partials hold exact decimals (a float
    partial would drift with batch boundaries). This is how a 100 TB
    dashboard aggregate stays current: per-batch partial cost, read-time
    fold, periodic compaction — history is never re-scanned."""
    from bbt_etl_dw_spark.operators.summary import read_summary

    path = _summary_log_path(spark, sf_dir)
    return read_summary(
        spark, path, ["event_type"], _SUMMARY_SPECS
    ).orderBy("event_type")


_EWMA_FINAL_ORACLE = """
SELECT user_id,
       CAST(len(l) AS BIGINT) AS n_events,
       list_reduce(l, (acc, x) -> CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * acc) AS ewma
FROM (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id)
           FILTER (value IS NOT NULL AND NOT ISNAN(CAST(value AS DOUBLE))) AS l
  FROM events GROUP BY user_id
)
ORDER BY user_id
"""


@register("events_user_value_ewma", oracle=_EWMA_FINAL_ORACLE)
def events_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final full-history EWMA(α=0.5) per user — the batch twin of the
    streaming stateful smoother (streaming/stateful.ewma_stream, state =
    one (n, acc) double per key), asserted stream==batch bit-exact in
    tests/test_streaming.py. The per-key collect is bounded by
    events-per-user (an entity history); the corpus-bounded variant is
    events_purchase_ewma (trailing window). α=0.5 keeps every fold step
    exact-scaling + one rounded add, so any engine replays it
    bit-identically."""
    from bbt_etl_dw_spark.streaming.stateful import final_ewma_batch

    ev = table(spark, sf_dir, "events")
    return final_ewma_batch(ev, alpha=0.5).orderBy("user_id")


# --- per-user prior-history z-scores (batch twin of zscore_stream) ----------

from bbt_etl_dw_spark.functions.numeric import DEC as _DEC  # noqa: E402
from bbt_etl_dw_spark.functions.numeric import SQL_DEC as _SQL_DEC  # noqa: E402
from bbt_etl_dw_spark.streaming.stateful import (  # noqa: E402
    ZSCORE_MIN_HISTORY as _ZS_MIN,
)

_ZS_WDEC = f"TRY_CAST(CAST(value AS VARCHAR) AS {_SQL_DEC})"
_ZS_WDEC_SQ = f"TRY_CAST(CAST(value * value AS VARCHAR) AS {_SQL_DEC})"
# pairwise-deletion gate: row enters the trailing state only when BOTH
# v and v² fit decimal(38,18) — mirrors the builder and the stream twin
_ZS_OK = f"({_ZS_WDEC} IS NOT NULL AND {_ZS_WDEC_SQ} IS NOT NULL)"
_ZS_FRAME = """PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"""

_USER_ZSCORES_ORACLE = f"""
WITH trail AS (
  SELECT user_id, event_id, value,
         CAST(COUNT(CASE WHEN {_ZS_OK} THEN {_ZS_WDEC} END)
              OVER ({_ZS_FRAME}) AS DOUBLE) AS n,
         CAST(CAST(SUM(CASE WHEN {_ZS_OK} THEN {_ZS_WDEC} END)
              OVER ({_ZS_FRAME}) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CASE WHEN {_ZS_OK} THEN {_ZS_WDEC_SQ} END)
              OVER ({_ZS_FRAME}) AS VARCHAR) AS DOUBLE) AS ss
  FROM events
),
scored AS (
  SELECT user_id, event_id, value,
         CASE WHEN value IS NOT NULL AND NOT isnan(value)
                   AND n >= {_ZS_MIN}
                   AND (ss - (s * s) / n) / (n - 1.0) > 0.0
              THEN (value - s / n)
                   / sqrt((ss - (s * s) / n) / (n - 1.0))
         END AS z
  FROM trail
)
SELECT user_id, event_id, value, z
FROM scored WHERE z IS NOT NULL
ORDER BY event_id
"""


def user_value_zscores_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`bbt_etl_dw_spark.streaming.stateful.zscore_stream`:
    each event scored against the user's PRIOR (ts, event_id)-ordered
    non-null history via one user-keyed window computing the mergeable
    (n, Σv, Σv²) as exact decimals — the same state the stream carries,
    so the two are bit-equal at any micro-batch slicing."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dec = F.col("value").try_cast(_DEC)
    dec_sq = (F.col("value") * F.col("value")).try_cast(_DEC)
    # full pairwise deletion (r07 review): a row enters the trailing
    # state only when BOTH v and v² fit decimal(38,18) — counting a row
    # whose v² term NULLed out of ss (|v| in [1e10, 1e20)) fabricated
    # mismatched sufficient statistics, and diverged from the stream
    # twin. The stream's try_dec gate mirrors this exactly.
    ok = dec.isNotNull() & dec_sq.isNotNull()
    sd = lambda c: F.sum(F.when(ok, c)).over(w).cast("string").cast("double")
    trail = events.select(
        "user_id", "event_id", "value",
        F.count(F.when(ok, dec)).over(w).cast("double").alias("n"),
        sd(dec).alias("s"),
        sd(dec_sq).alias("ss"),
    )
    var = (F.col("ss") - (F.col("s") * F.col("s")) / F.col("n")) / (
        F.col("n") - F.lit(1.0)
    )
    z = F.when(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.col("n") >= _ZS_MIN)
        & (var > 0.0),
        (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var),
    )
    return (
        trail.select("user_id", "event_id", "value", z.alias("z"))
        .filter(F.col("z").isNotNull())
        .orderBy("event_id")
    )


@register("events_user_value_zscores", oracle=_USER_ZSCORES_ORACLE)
def events_user_value_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event anomaly score: each event's value z-scored against its
    user's full PRIOR history (frame ends at 1 PRECEDING — an outlier
    never suppresses itself; minimum 8 prior values). This is the
    batch-ground-truth of the streaming stateful scorer
    (streaming/stateful.zscore_stream, stream==batch bit-exact pytest):
    ONE user-keyed window carries the mergeable (n, Σv, Σv²) exact
    decimals, the close is a fixed IEEE sequence with a guarded
    variance."""
    return user_value_zscores_batch(table(spark, sf_dir, "events"))
