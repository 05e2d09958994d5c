"""Behavioral analytics over the events table: ordered funnels, cohort
retention, and PII scrubbing — the product-analytics layer a warehouse
serves on top of the raw event stream.

Timezone discipline: week-level bucketing via ``date_trunc('week', ts)``
is NOT portable — a session timezone with a non-zero offset moves events
near Monday-midnight across week boundaries and shifts the truncated
value itself (hour truncation survives only because offsets are whole
hours). Cohort weeks here are derived from pure epoch-microsecond
arithmetic (``unix_micros`` / DuckDB ``epoch_us``), which no session
timezone touches, then rendered as real DATEs with date-only arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.suite import register

# --- ordered funnel -------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1 AS stage_idx, 'signup' AS stage, (SELECT COUNT(*) FROM s1) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
ORDER BY stage_idx
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup → click → purchase): a user reaches
    step k only with an event of that type STRICTLY AFTER reaching step
    k-1. ONE shuffle total: the step-type filter pushes to the scan, then
    three chained min-over-user windows share a single hash partitioning
    on user_id (Catalyst plans one Exchange, three Window operators) —
    versus the naive three-join formulation's three shuffles. The final
    stage counts collapse through a tiny per-user distinct."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_FUNNEL_STEPS)
    )
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    typ = F.col("event_type")
    staged = (
        ev.withColumn("t1", F.min(F.when(typ == "signup", t)).over(w))
        .withColumn(
            "t2", F.min(F.when((typ == "click") & (t > F.col("t1")), t)).over(w)
        )
        .withColumn(
            "t3", F.min(F.when((typ == "purchase") & (t > F.col("t2")), t)).over(w)
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("c1"), F.count("t2").alias("c2"), F.count("t3").alias("c3")
    )
    return counts.selectExpr(
        "stack(3, 1, 'signup', c1, 2, 'click', c2, 3, 'purchase', c3)"
        " AS (stage_idx, stage, n_users)"
    ).orderBy("stage_idx")


# --- weekly cohort retention ---------------------------------------------

# Monday 2024-01-01 = epoch day 19723 anchors week indexing; the index is
# pure integer epoch arithmetic, immune to session timezones on BOTH
# engines, and renders back to a DATE with date-only (+days) arithmetic.
_EPOCH_ANCHOR_DAY = 19723
_WEEK_SQL = (
    f"((epoch_us(ts) // 86400000000) - {_EPOCH_ANCHOR_DAY}) // 7"
)

_RETENTION_ORACLE = f"""
WITH wk AS (
  SELECT user_id, CAST({_WEEK_SQL} AS BIGINT) AS w FROM events
),
first_wk AS (SELECT user_id, MIN(w) AS cw FROM wk GROUP BY user_id),
cohort_sizes AS (SELECT cw, COUNT(*) AS n_cohort FROM first_wk GROUP BY cw),
active AS (SELECT DISTINCT user_id, w FROM wk),
ret AS (
  SELECT f.cw, a.w - f.cw AS week_offset, COUNT(*) AS n_users
  FROM active a JOIN first_wk f ON a.user_id = f.user_id
  GROUP BY f.cw, a.w - f.cw
)
SELECT DATE '2024-01-01' + CAST(r.cw * 7 AS INT) AS cohort_week,
       r.week_offset,
       r.n_users,
       s.n_cohort
FROM ret r JOIN cohort_sizes s ON r.cw = s.cw
ORDER BY cohort_week, week_offset
"""


@register("events_retention_cohorts", oracle=_RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week; n_users active at each week offset, with the cohort size for
    rate computation. Three user-keyed shuffles (first-week, distinct
    activity, the retention join) — at 100TB the first-event table is a
    maintained incremental dimension and the join co-partitions on
    user_id; the output is cohorts × offsets, tiny at any scale."""
    ev = table(spark, sf_dir, "events")
    # Integer `div` end-to-end (non-negative here): unix_micros ignores
    # the session timezone, unlike date_trunc('week', ...).
    wk = ev.select(
        "user_id",
        F.expr(
            f"((unix_micros(ts) div 86400000000) - {_EPOCH_ANCHOR_DAY}) div 7"
        ).alias("w"),
    )
    first_wk = wk.groupBy("user_id").agg(F.min("w").alias("cw"))
    cohort_sizes = first_wk.groupBy("cw").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    active = wk.distinct()
    ret = (
        active.join(first_wk, "user_id")
        .groupBy("cw", (F.col("w") - F.col("cw")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        ret.join(cohort_sizes, "cw")
        .select(
            F.date_add(
                F.lit("2024-01-01").cast("date"), (F.col("cw") * 7).cast("int")
            ).alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_users",
            "n_cohort",
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- PII scrubbing --------------------------------------------------------

_SCRUB_ORACLE = """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_masked
FROM events
ORDER BY event_id
"""


@register("events_props_scrub", oracle=_SCRUB_ORACLE)
def events_props_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-run masking over the raw props payload (the numeric-PII
    fallback of functions/redact.py, whose structured email/IP/SSN/phone
    patterns are pattern-tested in pytest): every digit run replaced by
    '#', with a per-row masking count for the audit trail. Pure
    regexp_replace/regexp_count projection — narrow, codegen'd, no
    shuffle but the determinism sort."""
    from bbt_etl_dw_spark.functions.redact import count_digit_runs, mask_digit_runs

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        mask_digit_runs("props").alias("props_masked"),
        count_digit_runs("props").alias("n_masked"),
    ).orderBy("event_id")
