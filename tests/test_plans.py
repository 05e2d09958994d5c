"""Physical-plan quality gates: the scale properties the engine promises
(README "Scale design") asserted as regression tests, so a refactor that
silently de-optimizes a plan fails CI, not a 100TB run.

Checks the INITIAL physical plan (pre-AQE) — join strategy choices,
filter pushdown into the parquet scan, and absence of cartesian /
nested-loop joins across the whole suite."""

import contextlib
import io

import pytest

from bbt_etl_dw_spark.suite import load_all

# crossJoin of the corpus against the tiny broadcast query set is the
# intended brute-force baseline (BroadcastNestedLoopJoin by construction).
# intentionally brute-force ground-truth paths: all-pairs/all-queries scoring
# is the semantics, so a broadcast nested-loop is the right physical plan
# cosine_pairs_precision embeds exact_cosine_pairs as its ground-truth
# side, so it inherits that allowlisted nested loop; its LSH (emitted)
# side remains pure equi-joins.
NESTED_LOOP_OK = {
    "ann_bruteforce_topk",
    "embedding_cosine_exact_pairs",
    "cosine_pairs_precision",
    # exact-L2 ground truth side of the PQ recall measurement (5-row
    # broadcast query side, same declared baseline shape)
    "ann_pq_recall",
    # JL neighborhood-recall gate: both rankings are the 5-query bounded
    # broadcast baseline shape (see tests/test_plan_lint.py)
    "rp_projection_recall",
}

# One-row scalar-subquery attaches are linear, not quadratic — shared
# allow-list (with rationale) in tests/test_plan_lint.py.
from tests.test_plan_lint import SCALAR_SUBQUERY_ALLOWED  # noqa: E402

NESTED_LOOP_OK |= SCALAR_SUBQUERY_ALLOWED


def _plan(df) -> str:
    # formatted explain keeps full scan detail (PushedFilters/ReadSchema);
    # plan.toString() truncates long field lists
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, q in load_all().items():
        out[name] = _plan(q.builder(spark, sf_dir))
    return out


def test_no_accidental_cartesian_or_nested_loop(plans):
    bad = {
        name: True
        for name, plan in plans.items()
        if name not in NESTED_LOOP_OK
        and ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
    }
    assert not bad, f"nested-loop/cartesian joins leaked into: {sorted(bad)}"


def test_pricing_summary_pushdown_and_pruning(plans):
    plan = plans["pricing_summary"]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only the 7 needed
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") <= 8, read_schema


def test_star_joins_broadcast(plans):
    assert plans["sales_by_region"].count("BroadcastHashJoin") >= 4
    assert plans["star_fact_assembly"].count("BroadcastHashJoin") >= 3


def test_aggregations_are_partial_then_final(plans):
    # partial (map-side) aggregation before the exchange — two HashAggregate
    # nodes around one shuffle for the flat-group queries
    for name in ("pricing_summary", "customer_order_totals", "events_tumbling_hourly"):
        plan = plans[name]
        assert plan.count("HashAggregate") >= 2, name
        assert "partial_" in plan, name


def test_anti_join_is_native(plans):
    assert "LeftAnti" in plans["inactive_parts_anti_join"]


def test_windows_are_partitioned(plans):
    # the engine's windows carry partitionBy keys; a global window shows up
    # as an Exchange SinglePartition feeding a Window/Sort
    for name in ("top_customers_per_segment", "forward_fill_values",
                 "events_running_user_totals"):
        plan = plans[name]
        window_feeds = [
            l for l in plan.splitlines() if "SinglePartition" in l
        ]
        assert not window_feeds, f"{name}: {window_feeds}"


def test_fact_plan_has_no_single_partition_exchange(spark, sf_dir):
    # hash_key dims: nothing in the fact assembly may funnel through one
    # partition (the ordered_key regression VERDICT r01 flagged). The suite
    # query sorts for the oracle compare, so inspect fact_sales itself.
    from bbt_etl_dw_spark.plans.star import fact_sales

    plan = _plan(fact_sales(spark, sf_dir))
    assert "SinglePartition" not in plan, plan
    assert "Window" not in plan, plan


def test_fact_hash_keys_match_natural_ids(spark, sf_dir):
    # the oracle can't compute xxhash64 — assert key == xxhash64(id) here
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.plans.star import fact_sales

    fact = fact_sales(spark, sf_dir)
    bad = fact.filter(
        ~(
            F.col("customer_key").eqNullSafe(F.xxhash64("customer_id"))
            & F.col("part_key").eqNullSafe(F.xxhash64("part_id"))
            & F.col("supplier_key").eqNullSafe(F.xxhash64("supplier_id"))
        )
    ).count()
    assert bad == 0


def test_md5_key_deterministic_unique_and_python_rederivable(spark, sf_dir):
    """md5_key: stable across runs, unique on a key column, and re-derivable
    outside Spark (hashlib) — the auditability property it exists for."""
    import hashlib

    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.surrogate import check_unique, md5_key

    c = table(spark, sf_dir, "customer")
    keyed = md5_key(c, ["c_custkey"], "sk")
    check_unique(keyed, "sk")
    rows = {r["c_custkey"]: r["sk"] for r in keyed.select("c_custkey", "sk").collect()}
    again = {
        r["c_custkey"]: r["sk"]
        for r in md5_key(c, ["c_custkey"], "sk").select("c_custkey", "sk").collect()
    }
    assert rows == again
    for k in list(rows)[:20]:
        assert rows[k] == int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)


def test_aqe_replans_dim_joins_to_broadcast_under_blind_stats(spark, sf_dir):
    """Join-order sanity WITHOUT usable statistics (the stale-stats
    regime): with static broadcast planning disabled — emulating a
    planner whose size estimates are useless — the engine's contract is
    AQE runtime re-planning. A 4-table fact-dim chain must start as
    all shuffle joins in the initial plan, and end with the dim sides
    converted to broadcast joins from OBSERVED shuffle sizes in the
    final adaptive plan. (spark.sql.adaptive.autoBroadcastJoinThreshold
    is pinned explicitly because it otherwise inherits the static
    threshold's -1 and would disable the runtime conversion too.)"""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.catalog import table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders")
        c = table(spark, sf_dir, "customer")
        n = table(spark, sf_dir, "nation")
        chain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        initial = chain._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in initial  # static planner is blind
        assert initial.count("SortMergeJoin") >= 3
        # collect() drives THIS DataFrame's own queryExecution, so the
        # adaptive plan below is the executed (final) one — a write would
        # spawn a separate execution and leave this plan unexecuted
        assert len(chain.collect()) > 0
        final = chain._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        # runtime sizes rescued the dim joins: customer and nation sides
        # broadcast; only the fact-fact join legitimately keeps shuffling
        assert final.count("BroadcastHashJoin") >= 2, final
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_surrogate_keys_null_and_separator_collisions(spark):
    """Review findings: multi-column xxhash64 passed NULLs through as
    no-ops (('smith',NULL) == (NULL,'smith')), and md5_key's '|' join
    collided ('a|b','c') with ('a','b|c') and NULL-skipped — all now
    distinct under sentinel + unit-separator encoding."""
    from bbt_etl_dw_spark.operators.surrogate import hash_key, md5_key

    df = spark.createDataFrame(
        [("smith", None), (None, "smith"), ("a|b", "c"), ("a", "b|c"), ("x", None), (None, "x")],
        "a string, b string",
    )
    for fn in (hash_key, md5_key):
        keys = [r["k"] for r in fn(df, ["a", "b"], "k").select("k").collect()]
        assert len(set(keys)) == len(keys), (fn.__name__, keys)


def test_forecast_revenue_pushdown_all_three_ranges(plans):
    """Q6 shape is pure scan-agg: ALL THREE range predicates must reach
    the parquet scan (min/max row-group pruning), and the scan must read
    only the 4 referenced columns of the 11-column lineitem."""
    plan = plans["forecast_revenue_change"]
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") <= 5, read_schema


def test_disjunctive_bracket_cnf_extraction(plans):
    """Q19 shape: Catalyst must extract the single-side implications of
    the OR-of-ANDs — the lineitem scan gets the quantity union-range, the
    part scan gets the brand IN-set — while the full disjunction stays as
    a residual on ONE broadcast join (not three unioned fact scans)."""
    plan = plans["disjunctive_bracket_revenue"]
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    li_pushed = [l for l in pushed if "l_quantity" in l]
    assert li_pushed and "GreaterThanOrEqual(l_quantity,1.0)" in li_pushed[0], pushed
    assert "LessThanOrEqual(l_quantity,30.0)" in li_pushed[0], pushed
    part_pushed = [l for l in pushed if "p_brand" in l]
    assert part_pushed and "Brand#12" in part_pushed[0], pushed
    # exactly one join node (the tree line reads "BroadcastHashJoin Inner
    # BuildRight"; the node-detail section repeats the name without "Inner")
    assert plan.count("BroadcastHashJoin Inner") == 1, "fact must be joined once"
    # exactly one lineitem scan — no union-of-three-brackets rewrite
    # (formatted explain names the file on the Location line)
    li_scans = [l for l in plan.splitlines() if "Location" in l and "lineitem" in l]
    assert len(li_scans) == 1, li_scans


def test_part_supplier_counts_anti_join_and_two_level_distinct(plans):
    """Q16 shape: the NOT IN must plan as a broadcast LEFT ANTI (never a
    per-row subquery), and COUNT(DISTINCT) as the two-level partial
    expansion (no single node buffering full supplier sets)."""
    plan = plans["part_supplier_counts"]
    assert "LeftAnti" in plan
    assert plan.count("HashAggregate") >= 3  # distinct expansion adds a level
    assert "partial_" in plan


def test_conditional_aggregates_single_fact_pass(plans):
    """Q12/Q14 shapes: conditional numerator + denominator fold into ONE
    hash aggregate — exactly one lineitem scan in each plan."""
    for name in ("linestatus_priority_counts", "promo_revenue_share"):
        plan = plans[name]
        li_scans = [
            l for l in plan.splitlines() if "Location" in l and "lineitem" in l
        ]
        assert len(li_scans) == 1, (name, li_scans)
        assert "partial_" in plan, name


def test_local_supplier_volume_one_fact_shuffle(plans):
    """Q5 shape: the c_nationkey=s_nationkey equality must evaluate as a
    residual predicate, never a join between two fact-sized sides; the
    only data exchanges are hash joins plus the final group agg."""
    plan = plans["local_supplier_volume"]
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_percentiles_single_sort_serves_both_windows(plans):
    # exact_group_percentiles: row_number + count windows must share ONE
    # hash partitioning on the group key — one Exchange total before the
    # closing aggregate's
    plan = plans["order_price_percentiles"]
    assert plan.count("Exchange hashpartitioning(o_orderpriority") <= 2
    assert plan.count("Window") >= 1


def test_ewma_one_keyed_shuffle_no_python(plans):
    # trailing_ewma: one hash partitioning on user_id for the window; the
    # fold is a Catalyst `aggregate` expression, never Python
    plan = plans["events_purchase_ewma"]
    # one hash Exchange (the user_id window); the only other Exchange is
    # the presentation orderBy's range partitioning
    assert plan.count("hashpartitioning(user_id") >= 1
    assert plan.count("+- Exchange") <= 2
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_cooccurrence_frequencies_broadcast(plans):
    # item frequencies (dim-cardinality) broadcast onto pair counts; the
    # pair self-join is a keyed join, not a nested loop
    plan = plans["order_part_cooccurrence"]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_fuzzy_lookup_broadcasts_canonical_side(plans):
    # the canonical dimension (x3 band expansion) broadcasts; the probe
    # side joins on the block key without a nested loop
    plan = plans["nation_fuzzy_aliases"]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_is_equijoin_plus_partial_agg(plans):
    # ADC scoring: LUT broadcast equi-join + map-side partial aggregation
    # (the m partial rows per pair collapse before the shuffle)
    plan = plans["ann_pq_topk"]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan


def test_ols_trend_two_level_aggregation(plans):
    # stage 1: one fact shuffle on (nation, year); stage 2 (the fit) runs
    # over dim-scale rows — sufficient-statistics sums, no value lists
    plan = plans["nation_yearly_revenue_trend"]
    assert "collect_list" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_attribution_single_user_window_no_self_join(plans):
    # nearest-preceding-touch is a running window over ONE user_id
    # partitioning — not an events x events self-join (no SortMergeJoin
    # of the fact against itself, no Python)
    plan = plans["events_last_touch_attribution"]
    assert plan.count("hashpartitioning(user_id") >= 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_markov_window_then_dim_sized_normalizer(plans):
    # lead window on the user partitioning; the normalizing window runs
    # AFTER the types x types aggregation (input is dim-sized)
    plan = plans["events_markov_transitions"]
    assert plan.count("hashpartitioning(user_id") >= 1
    assert plan.count("hashpartitioning(event_type") >= 1


def test_bm25_topk_is_heap_not_global_sort(plans):
    # the final top-k must plan TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows), never a global Sort+Limit
    plan = plans["doc_bm25_search"]
    assert "TakeOrderedAndProject" in plan


def test_pmi_topk_is_heap_not_global_sort(plans):
    plan = plans["doc_pmi_collocations"]
    assert "TakeOrderedAndProject" in plan


def test_triangles_all_joins_keyed(plans):
    # wedge + closing joins are equi-joins, never a nested loop; the
    # edge/degree/oriented frames are materialized ONCE (r14 — lazy
    # composition multiplied the caller's edge pipeline ~15x), so the
    # final plan reads checkpointed RDDs instead of re-running the geo
    # broadcast joins per subtree. The subtree join strategies are pinned
    # by the _lazy twin below.
    plan = plans["nation_trade_triangles"]
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan, "edge pipeline must not re-run"


def test_triangles_lazy_subplan_joins_keyed(spark, sf_dir, monkeypatch):
    # identity-materialize twin (r14 review finding): the full lazy plan
    # must keep the geo dims broadcast and every join an equi-join
    import bbt_etl_dw_spark.operators.ckpt as C

    monkeypatch.setattr(C, "materialize", lambda df, reliable=None: df)
    plan = _plan(load_all()["nation_trade_triangles"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_mannwhitney_bins_before_ranking(plans):
    # the fact collapses to its value histogram (hash partitioning on
    # the value) BEFORE any window: the rank pass sees distinct values
    plan = plans["lineitem_quantity_mannwhitney"]
    assert plan.count("hashpartitioning(val") >= 1
    assert "BatchEvalPython" not in plan


def test_rfm_one_customer_shuffle_boundaries_broadcast(plans):
    # the customer-grain rollup is materialized ONCE (its o_custkey
    # shuffle runs in the checkpoint job, so the final plan reads the
    # checkpointed RDD — no orders parquet scan survives); quantile
    # boundaries re-attach as one-row broadcasts (scoring is a map
    # stage over customers). The join/partitioning properties inside the
    # materialized subtree are pinned by the _lazy twin below.
    plan = plans["customer_rfm_segments"]
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan, "orders must not be re-scanned"
    assert plan.count("BroadcastNestedLoopJoin") >= 3


def test_rfm_lazy_subplan_one_customer_shuffle(spark, sf_dir, monkeypatch):
    # with materialize patched to identity the WHOLE pipeline is one lazy
    # plan again, so the properties the materialization hides stay
    # testable: the fact reduces on o_custkey, and the boundaries attach
    # as one-row broadcasts (r14 review finding: checkpoint jobs are
    # invisible to the final plan)
    import bbt_etl_dw_spark.suite.analytics as A

    monkeypatch.setattr(A, "materialize", lambda df, reliable=None: df)
    plan = _plan(load_all()["customer_rfm_segments"].builder(spark, sf_dir))
    assert plan.count("hashpartitioning(o_custkey") >= 1
    assert plan.count("BroadcastNestedLoopJoin") >= 3


def test_sessionization_single_user_exchange(plans):
    # lag flag, running session number, and the per-session aggregation
    # all ride ONE user_id hash partitioning; the only other Exchange is
    # the presentation orderBy's range partitioning
    plan = plans["events_gap_sessionization"]
    assert plan.count("hashpartitioning(user_id") >= 1
    assert plan.count("+- Exchange") <= 2


def test_prefix_jaccard_joins_are_keyed(plans):
    # candidate generation and verify are equi-joins end to end — no
    # cartesian anywhere despite the all-pairs SEMANTICS
    plan = plans["doc_prefix_jaccard_pairs"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_independence_windows_after_cell_aggregation(plans):
    # row/col/grand totals are windows over the types x 7 matrix, which
    # exists only AFTER the fact collapses in a hash aggregation
    plan = plans["events_type_dow_independence"]
    assert plan.count("hashpartitioning(event_type") >= 1
