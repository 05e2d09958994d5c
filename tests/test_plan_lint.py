"""Engine-wide physical-plan lint: every registered suite query must plan
without the two scale-killers —

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: an unkeyed join
  that goes quadratic at 100TB (every keyed join in the engine is an
  equi-join, a broadcast, or a range-bucketed join by design);
- ``BatchEvalPython`` / ``PythonUDF``: a row-at-a-time Python UDF on the
  hot path (the engine's contract is built-in expressions everywhere,
  Arrow-batched mapInPandas only where Spark has no native expression).

This is the standing regression gate for the "no anti-patterns on any
hot path" audit: a future query or refactor that sneaks either pattern
in fails here, not in a 1000-executor postmortem. Plans are *built*, not
executed — physical planning is driver-side and cheap. Builders that
train/collect internally (k-means seeds, LSH coefficients) do run those
bounded sub-jobs; that cost is the same the oracle suite already pays.
"""

import pytest

from bbt_etl_dw_spark.suite import load_all

QUERIES = load_all()

FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",  # row-at-a-time Python UDF
)

# mapInPandas is the documented Arrow-batched escape hatch — allowed only
# where Spark genuinely lacks an expression (multimodal decode).
ARROW_ALLOWED = {"media_decode_features", "video_frame_sample"}

# Deliberately quadratic plans — each one a documented BASELINE or AUDIT
# path, never the production path for its capability:
# - ann_bruteforce_topk: the exact O(corpus x 5-query) correctness
#   baseline every ANN variant is measured against; the query side is a
#   bounded broadcast, so BroadcastNestedLoopJoin IS the intended plan.
# - embedding_cosine_exact_pairs / cosine_pairs_precision: exact all-pairs
#   cosine, the audit/verification twin of the bucketed near-dup pipeline
#   (which is the production path and plans equi-joins only).
QUADRATIC_ALLOWED = {
    "ann_bruteforce_topk",
    "embedding_cosine_exact_pairs",
    "cosine_pairs_precision",
    # exact-L2 ground truth for PQ recall: 5-row broadcast query side
    # against the corpus — the same bounded baseline shape as
    # ann_bruteforce_topk
    "ann_pq_recall",
    # JL neighborhood-recall gate: exact top-5 in both spaces, each a
    # 5-query bounded broadcast against the corpus (baseline shape)
    "rp_projection_recall",
}

# Scalar-subquery attaches (suite.classic._attach_scalar): a broadcast
# cross join whose build side is ONE aggregate row — the canonical plan
# for "compare every row against a global aggregate". The BNLJ here is
# linear (1 comparison per probe row), not quadratic; Catalyst folds any
# constant-equi-key disguise back to BNLJ, so the honest plan is allowed
# by name instead. A regression that grows the build side past one row
# would still be caught by the oracle value checks.
SCALAR_SUBQUERY_ALLOWED = {
    "idle_rich_customers",
    "nation_revenue_share",
    "doc_token_drift_chisq",
    # in-plan MAX-shipdate cutoff (one-row broadcast cross join) — moved
    # in-plan because a driver collect/re-lit of the timestamp round-trips
    # through the OS timezone layer
    "inactive_parts_anti_join",
    # basket-total scalar for support/lift denominators (one-row
    # broadcast cross join in operators/basket.py)
    "order_part_cooccurrence",
    # per-iteration N / dangling-mass scalars (one-row broadcast cross
    # joins in operators/pagerank.py)
    "nation_trade_pagerank",
    # corpus scalars (N docs / avgdl; bigram + token totals) attached as
    # one-row broadcasts in operators/search.py / textstats.collocation_lift
    "doc_bm25_search",
    "doc_pmi_collocations",
    # in-range total scalar for expected counts (operators/stats
    # .benford_digit_audit)
    "lineitem_benford_audit",
    # three 1-row quantile-boundary frames broadcast onto the
    # per-customer aggregate (quantile-boundary scoring, no rank window)
    "customer_rfm_segments",
    # basket-total scalar inside operators/basket.cooccurrence_pairs
    # (same shape as order_part_cooccurrence)
    "part_basket_neighbors",
    # newest-order reference day attached as a 1-row broadcast scalar
    "customer_decayed_revenue",
    # grand-mean daily total attached as a 1-row broadcast scalar
    "events_dow_seasonality",
    # series mean + ACF denominator as 1-row broadcast scalars, plus the
    # 7-row lag dimension broadcast onto the DAY-LEVEL rollup (constant
    # fan-out over a dim-scale frame — the fact reduced one shuffle
    # earlier); every fact-touching join stays equi-keyed
    "events_daily_acf",
    # same shape as events_daily_acf: mean/denominator scalars + the
    # 7-row lag dimension broadcast onto the day-level rollup
    "events_purchase_error_xcorr",
    # corpus-size scalar attached as a 1-row broadcast (same shape as
    # doc_bm25_search's N/avgdl scalars)
    "doc_top_keywords",
    # grand-total and adjusted-series mean/std as 1-row broadcast
    # scalars over the dim-scale day rollup
    "events_seasonal_adjusted_anomalies",
    # token grand-total + weight normalizer as 1-row broadcast scalars
    # over the sources-sized rollup
    "doc_mix_temperature",
    # achievable-total T = min(available/share) attached as a 1-row
    # broadcast scalar over the dim-sized per-source counts
    # (operators/textstats.token_mix_rates)
    "corpus_token_mix",
}
QUADRATIC_ALLOWED |= SCALAR_SUBQUERY_ALLOWED


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = QUERIES[name].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        if marker == "BroadcastNestedLoopJoin" and name in QUADRATIC_ALLOWED:
            continue
        assert marker not in plan, f"{name}: {marker} in physical plan:\n{plan}"
    if name not in ARROW_ALLOWED:
        assert "MapInPandas" not in plan, (
            f"{name}: undeclared MapInPandas stage — either remove it or "
            f"add the query to ARROW_ALLOWED with a justification:\n{plan}"
        )
