"""Behavioral/product-analytics operators over event streams: ordered
funnels and cohort retention.

Scale shapes:

- The funnel is the classic "did the user do A, then B after A, then C
  after B" question. The naive formulation is one join per step (k
  shuffles); this one filters to the step types (pushed to the scan) and
  chains k min-over-user windows — Catalyst plans ONE hash exchange on
  the user key and k Window operators over the same sort, so funnel
  depth costs sorts, not shuffles.
- Retention buckets by *epoch-integer* weeks, not ``date_trunc('week')``:
  week truncation consults the session timezone, so a non-UTC session
  moves events near Monday midnight across week boundaries (hour
  truncation survives only because zone offsets are whole hours).
  ``unix_micros`` arithmetic is identical in every timezone and every
  engine.

Reference: the BBT-ETL-DW reference has no funnel/retention operators
(its KPIs are store/product aggregates, kpi_*.py); this module is part
of the warehouse extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Monday 2024-01-01 as an epoch day — anchors week indexes on a Monday.
WEEK_ANCHOR_DAY = 19723
WEEK_ANCHOR_DATE = "2024-01-01"


def funnel_stage_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_us: int | None = None,
) -> DataFrame:
    """Users reaching each funnel stage, where stage k requires an event
    of type ``steps[k]`` STRICTLY AFTER the time stage k-1 was reached
    (stage 0 = earliest event of its type). With ``max_gap_us`` the step
    must also land within that many epoch-microseconds of the previous
    stage — the time-boxed conversion funnel, FIRST-ENTRY ANCHORED: each
    stage's clock starts at the EARLIEST qualifying reach of the
    previous stage (the Amplitude-default "first occurrence" semantics).
    A user who re-enters the funnel (A@0, A@10, B@60 with a 50µs gap)
    is NOT credited for the A@10→B@60 path — re-entry funnels are a
    per-event sequencing problem, served by events_sequence_patterns /
    events_session_funnel, not by this window formulation (r07 review:
    the choice is deliberate and now explicit). Within one stage the
    earliest qualifying event is taken, so a user whose only in-window
    step-k event follows a faster out-of-window one still converts.
    Returns ``(stage_idx, stage, n_users)`` ordered by stage.

    One exchange on ``user_col`` regardless of funnel depth — each step
    adds a Window over the same partitioning, not a join."""
    ev = events.filter(F.col(type_col).isin(*steps))
    w = Window.partitionBy(user_col)
    t = F.col(ts_col)
    prev: F.Column | None = None
    cols: list[str] = []
    for i, step in enumerate(steps):
        reached = (F.col(type_col) == step) if prev is None else (
            (F.col(type_col) == step) & (t > prev)
        )
        if prev is not None and max_gap_us is not None:
            reached = reached & (
                (F.unix_micros(t) - F.unix_micros(prev)) <= int(max_gap_us)
            )
        name = f"__t{i}"
        ev = ev.withColumn(name, F.min(F.when(reached, t)).over(w))
        prev = F.col(name)
        cols.append(name)
    per_user = ev.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in cols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"__c{i}") for i, c in enumerate(cols)]
    )
    # unpivot via typed literals, NOT a stack() selectExpr with the step
    # names spliced into SQL text — a quote inside an event-type string
    # was a plan-time parse error, with user data interpreted as SQL
    # (review finding)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"__c{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.stage_idx", "r.stage", "r.n_users")
        .orderBy("stage_idx")
    )


def week_index(ts_col: str = "ts", anchor_day: int = WEEK_ANCHOR_DAY):
    """Timezone-proof week index of a timestamp: pure integer epoch
    arithmetic (micros → days → weeks since the Monday anchor).

    Both divisions are FLOOR divisions built from truncating `div` plus a
    non-negative `pmod` remainder: bare `div` truncates toward zero, so
    every pre-anchor timestamp (and pre-1970 days) would shift its bucket
    — the week containing the anchor became a 13-day pseudo-week and all
    earlier week labels were off by up to 6 days (review finding; the
    SQL oracle's `//` truncates identically, which is why the twin
    check could not catch it)."""
    # floor(x/n) = (x - pmod(x, n)) div n  (numerator multiple of n).
    # The column name is spliced as a BACKTICK-QUOTED identifier (r07
    # review): a bare splice made names needing quoting a parse error
    # and let a crafted name be read as SQL — the funnel unpivot above
    # documents the same hazard for literals.
    quoted = "`" + ts_col.replace("`", "``") + "`"
    micros = f"unix_micros({quoted})"
    day = f"(({micros}) - pmod({micros}, 86400000000)) div 86400000000"
    wk_num = f"(({day}) - {anchor_day})"
    return F.expr(f"(({wk_num}) - pmod({wk_num}, 7)) div 7")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week; for each (cohort_week, week_offset), the count of cohort users
    active that week plus the cohort size. Returns
    ``(cohort_week DATE, week_offset, n_users, n_cohort)``.

    User-keyed shuffles only; the output is cohorts x offsets — tiny at
    any scale. At 100TB the first-event table is a maintained incremental
    dimension (a MIN merge per batch) rather than a recomputed groupBy."""
    wk = events.select(
        F.col(user_col).alias("user_id"), week_index(ts_col).alias("w")
    )
    # user-grain first-week dimension feeds the cohort sizes AND the
    # retention join — materialized (this IS the "maintained incremental
    # dimension" of the docstring), the fact contributes two scans (min
    # pass + distinct pass) instead of three (r14 plan audit)
    from bbt_etl_dw_spark.operators.ckpt import materialize

    first_wk = materialize(wk.groupBy("user_id").agg(F.min("w").alias("cw")))
    cohort_sizes = first_wk.groupBy("cw").agg(F.count(F.lit(1)).alias("n_cohort"))
    active = wk.distinct()
    ret = (
        active.join(first_wk, "user_id")
        .groupBy("cw", (F.col("w") - F.col("cw")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return ret.join(cohort_sizes, "cw").select(
        F.date_add(
            F.lit(WEEK_ANCHOR_DATE).cast("date"), (F.col("cw") * 7).cast("int")
        ).alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        "n_users",
        "n_cohort",
    )


def user_event_sequences(
    events: DataFrame,
    type_map: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "seq",
) -> DataFrame:
    """Per-user chronological event-type string: each event becomes the
    single character ``type_map[event_type]`` (unmapped types DROP — the
    alphabet is the contract), concatenated in (ts, id) order. The id
    tie-break makes the string deterministic under same-microsecond
    events. Returns ``(user_col, out_col)``.

    This is the sequence-mining substrate (MATCH_RECOGNIZE-lite):
    downstream pattern queries are plain regexes over ``out_col``. One
    user-keyed shuffle; ordering happens INSIDE each aggregated array
    (``array_sort`` over (epoch-µs, id, char) structs — epoch-µs so no
    session timezone can reorder ties), never as a global sort. Per-user
    memory is the user's own event count — the same bound every
    sessionization/funnel window in this module already carries."""
    ch = None
    for t, c in type_map.items():
        ch = (F.when(F.col("__t") == t, F.lit(c)) if ch is None
              else ch.when(F.col("__t") == t, F.lit(c)))
    mapped = events.select(
        F.col(user_col),
        F.col("event_type").alias("__t"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(id_col).alias("__id"),
    ).withColumn("__c", ch).filter(F.col("__c").isNotNull())
    return mapped.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__us", "__id", "__c"))
                ),
                lambda x: x["__c"],
            ),
            "",
        ).alias(out_col)
    )
