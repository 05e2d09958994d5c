"""Operator-level tests for the round-6 behavioral/graph/search family
(operators/attribution.py, graphstats.py, search.py, basket.py
item_cosine_topk, textstats.collocation_lift, stats.mann_whitney_u /
benford_digit_audit) — hand-computed expectations on tiny frames,
independent of the DuckDB oracle suite."""

import math

from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.attribution import attribute_conversions
from bbt_etl_dw_spark.operators.basket import item_cosine_topk
from bbt_etl_dw_spark.operators.graphstats import triangle_stats
from bbt_etl_dw_spark.operators.search import bm25_topk
from bbt_etl_dw_spark.operators.stats import benford_digit_audit, mann_whitney_u
from bbt_etl_dw_spark.operators.textstats import collocation_lift

EV_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


# --- attribution ----------------------------------------------------------


def _attr(spark, rows, position="last", lookback_days=7):
    ev = _events(spark, rows)
    out = attribute_conversions(
        ev,
        touch_pred=F.col("event_type").isin("click", "view"),
        conv_pred=F.col("event_type") == "purchase",
        touch_label=F.col("event_type"),
        lookback_days=lookback_days,
        position=position,
        keep_cols=("value",),
    )
    return {r.event_id: r.channel for r in out.collect()}


def test_attribution_last_touch_within_window(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "click", None),
        (1, 2, t0 + dt.timedelta(days=1), "purchase", 10.0),
        # second purchase 8 days after the click: outside the 7d lookback
        (1, 3, t0 + dt.timedelta(days=8, seconds=1), "purchase", 5.0),
        # user 2 never touched
        (2, 4, t0, "purchase", 1.0),
    ]
    ch = _attr(spark, rows)
    assert ch == {2: "click", 3: "direct", 4: "direct"}


def test_attribution_last_vs_first_touch(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "click", None),
        (1, 2, t0 + dt.timedelta(hours=1), "view", None),
        (1, 3, t0 + dt.timedelta(hours=2), "purchase", 4.0),
    ]
    assert _attr(spark, rows, "last") == {3: "view"}
    assert _attr(spark, rows, "first") == {3: "click"}


def test_attribution_first_touch_is_within_window_not_first_ever(spark):
    # r07 review: 'first' must credit the earliest touch INSIDE the
    # lookback, not test the window against the user's first-ever touch
    # (which would mark this conversion 'direct' despite a fresh touch).
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "click", None),                            # day 0
        (1, 2, t0 + dt.timedelta(days=28), "view", None),     # in window
        (1, 3, t0 + dt.timedelta(days=29), "click", None),    # in window
        (1, 4, t0 + dt.timedelta(days=30), "purchase", 4.0),
    ]
    assert _attr(spark, rows, "first") == {4: "view"}  # earliest IN window
    assert _attr(spark, rows, "last") == {4: "click"}


def test_attribution_same_timestamp_eligibility_symmetric(spark):
    # ADVICE r07: a touch sharing the conversion's exact timestamp but a
    # LATER event_id must be ineligible for BOTH positions (the 'last'
    # ROWS frame already excluded it; 'first' used a RANGE frame ending
    # at the timestamp VALUE and credited it).
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # touch id=5 shares the conversion's (id=3) timestamp but sorts after
    rows = [(1, 5, t0, "click", None), (1, 3, t0, "purchase", 4.0)]
    assert _attr(spark, rows, "last") == {3: "direct"}
    assert _attr(spark, rows, "first") == {3: "direct"}
    # ...while an EARLIER id at the same timestamp is credited by both
    rows2 = [(1, 2, t0, "click", None), (1, 3, t0, "purchase", 4.0)]
    assert _attr(spark, rows2, "last") == {3: "click"}
    assert _attr(spark, rows2, "first") == {3: "click"}
    # and a strictly earlier touch still beats a same-ts eligible one
    rows3 = [
        (1, 1, t0 - dt.timedelta(hours=1), "view", None),
        (1, 2, t0, "click", None),
        (1, 3, t0, "purchase", 4.0),
    ]
    assert _attr(spark, rows3, "first") == {3: "view"}
    assert _attr(spark, rows3, "last") == {3: "click"}


def test_attribution_null_label_touch_cannot_desync_picks(spark):
    # r07 review: a NULL-label touch must be ignored by BOTH the label
    # and the timestamp pick — independently-picked columns credited an
    # out-of-window channel under the NULL-label touch's fresh timestamp.
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ev = _events(spark, [
        (1, 1, t0, "click", None),                             # day 0
        (1, 2, t0 + dt.timedelta(days=29), "view", None),      # NULL label
        (1, 3, t0 + dt.timedelta(days=30), "purchase", 4.0),
    ])
    out = attribute_conversions(
        ev,
        touch_pred=F.col("event_type").isin("click", "view"),
        conv_pred=F.col("event_type") == "purchase",
        # 'view' maps to NULL: a touch that cannot be credited
        touch_label=F.when(F.col("event_type") == "click", F.lit("click")),
        lookback_days=7,
        position="last",
    )
    ch = {r.event_id: r.channel for r in out.collect()}
    assert ch == {3: "direct"}  # NOT 'click' riding the view's timestamp


def test_attribution_ts_tie_breaks_on_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # click and view at the SAME timestamp: higher event_id wins "last"
    rows = [
        (1, 1, t0, "click", None),
        (1, 2, t0, "view", None),
        (1, 3, t0 + dt.timedelta(hours=1), "purchase", 4.0),
    ]
    assert _attr(spark, rows, "last") == {3: "view"}


# --- triangle_stats -------------------------------------------------------


def test_triangles_square_with_diagonal(spark):
    # A-B-C-D square + diagonal A-C: triangles ABC and ACD
    edges = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"), ("A", "C")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.vertex: r for r in triangle_stats(df).collect()}
    assert {v: r.n_triangles for v, r in out.items()} == {
        "A": 2, "B": 1, "C": 2, "D": 1
    }
    assert out["A"].degree == 3 and out["B"].degree == 2
    # clustering: A has 3 neighbors, 2 closed pairs of 3 possible
    assert out["A"].clustering == (2.0 * 2.0) / (3.0 * 2.0)
    assert out["B"].clustering == 1.0


def test_triangles_ignore_duplicates_loops_orientation(spark):
    edges = [
        ("A", "B"), ("B", "A"), ("A", "B"),  # duplicate + reversed
        ("A", "A"),  # loop
        ("B", "C"), ("C", "A"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.vertex: r for r in triangle_stats(df).collect()}
    assert all(r.n_triangles == 1 for r in out.values())
    assert all(r.degree == 2 for r in out.values())


def test_star_graph_has_no_triangles_and_null_leaf_clustering(spark):
    edges = [("HUB", x) for x in ("A", "B", "C", "D")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.vertex: r for r in triangle_stats(df).collect()}
    assert all(r.n_triangles == 0 for r in out.values())
    assert out["HUB"].clustering == 0.0  # degree 4, no closed wedges
    assert out["A"].clustering is None  # degree 1: undefined, not 0.0


# --- mann_whitney_u -------------------------------------------------------


def test_mwu_separated_groups(spark):
    # scipy convention (r07 review): U_a = R_a - n_a(n_a+1)/2, so the
    # stochastically SMALLER group a has U_a = 0 and negative z
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [("b", v) for v in (4.0, 5.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (out.n_a, out.n_b) == (3, 3)
    assert out.u_a == 0.0 and out.u_b == 9.0
    assert out.z_stat < 0


def test_mwu_with_ties_hand_computed(spark):
    # a=[1,2,2], b=[2,3]: midrank of the 2-tie block is 3 -> R_a = 7,
    # U_a = 7 - 3*4/2 = 1 (scipy.stats.mannwhitneyu agrees)
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert out.u_a == 1.0 and out.u_b == 5.0
    # z replayed with the operator's exact IEEE op order
    na, nb, n, ties = 3.0, 2.0, 5.0, 24.0
    mu = (na * nb) / 2.0
    sigma2 = (na * nb) / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    assert out.z_stat == (1.0 - mu) / math.sqrt(sigma2)


def test_mwu_degenerate_all_tied_and_empty_side(spark):
    allsame = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 2.0)], "g string, v double"
    )
    out = mann_whitney_u(allsame, "g", "v", "a", "b").collect()[0]
    assert out.z_stat is None  # zero variance
    assert out.u_a == out.u_b == (2 * 1) / 2.0
    onesided = spark.createDataFrame([("a", 1.0)], "g string, v double")
    out2 = mann_whitney_u(onesided, "g", "v", "a", "b").collect()[0]
    assert (out2.n_a, out2.n_b) == (1, 0)
    assert out2.u_a is None and out2.z_stat is None


def test_mwu_giant_tie_bin_no_bigint_overflow(spark):
    # ADVICE r06: t³-t and ca·rank2 were computed in BIGINT before the
    # DECIMAL(38,0) cast — one value bin with >~2.09M tied rows overflowed
    # long (t³ > 2⁶³-1), contradicting the "no n² overflow at any scale"
    # contract. Decimal-first arithmetic must return finite, correct stats.
    from pyspark.sql import functions as F

    n_a = 2_200_000  # t = n_a + 1 → t³ ≈ 1.06e19 > Long.MAX
    a = spark.range(n_a).select(F.lit("a").alias("g"), F.lit(2.0).alias("v"))
    b = spark.createDataFrame([("b", 2.0), ("b", 9.0)], "g string, v double")
    out = mann_whitney_u(a.unionByName(b), "g", "v", "a", "b").collect()[0]
    assert (out.n_a, out.n_b) == (n_a, 2)
    # hand-computed: the 2.0-bin ties n_a + 1 rows; 9.0 ranks last.
    # R_a = n_a * midrank(2.0-bin); midrank = (n_a + 2) / 2 exactly;
    # U_a = R_a - n_a(n_a+1)/2 (scipy convention).
    r_a = n_a * (n_a + 2) / 2.0
    u_a = r_a - n_a * (n_a + 1) / 2.0
    assert out.u_a == u_a and out.u_b == n_a * 2 - u_a
    assert out.z_stat is not None and math.isfinite(out.z_stat)


# --- benford_digit_audit --------------------------------------------------


def test_benford_digits_and_out_of_range(spark):
    vals = [1.5, 19.0, 2.0, 250.0, 950000.0, 0.5, 2.0e7, float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_digit_audit(df, "v").collect()}
    counts = {d: r.n_obs for d, r in out.items()}
    # NaN dropped entirely; 0.5 and 2e7 fall in the out-of-range row
    assert counts == {0: 2, 1: 2, 2: 2, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    assert out[1].share_obs == 2.0 / 5.0
    assert out[0].share_obs is None and out[0].chisq_term is None
    # expected share literals are the Benford probabilities
    assert out[1].benford_share == 0.30102999566398114
    exp = 0.30102999566398114 * 5.0
    assert out[1].chisq_term == (2.0 - exp) * (2.0 - exp) / exp


def test_benford_large_digit_reads_leading_not_trailing(spark):
    # the CASE ladder must test big powers first: 9.5e6 -> digit 9
    df = spark.createDataFrame([(9.5e6,), (1.0e6,), (12.0,)], "v double")
    out = {r.digit: r.n_obs for r in benford_digit_audit(df, "v").collect()}
    assert out[9] == 1 and out[1] == 2


# --- item_cosine_topk -----------------------------------------------------


def test_item_cosine_neighbors(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = item_cosine_topk(df, "b", "i", k=5, min_pair_count=2).collect()
    got = {(r.item, r.neighbor): r for r in out}
    assert set(got) == {("x", "y"), ("y", "x")}  # (x,z) pruned at min count
    assert got[("x", "y")].cos_sim == 2.0 / math.sqrt(6.0)
    assert got[("x", "y")].rank == 1


# --- collocation_lift -----------------------------------------------------


def test_collocation_lift_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = collocation_lift(docs, min_count=2).collect()
    assert len(out) == 1 and out[0].bigram == "a b"
    # n_xy=3, NB=4, n_a=n_b=3, N=6 -> lift = (3*6*6)/(4*3*3) = 3.0
    assert out[0].n_xy == 3 and out[0].n_x == 3 and out[0].n_y == 3
    assert out[0].lift == 3.0


# --- bm25_topk ------------------------------------------------------------


def test_bm25_ranks_heavier_term_use_and_excludes_nonmatching(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark join"),
            (2, "spark data data"),
            (3, "data data data"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ("spark", "join"), k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 has no query term
    assert out[0].n_terms_hit == 2 and out[1].n_terms_hit == 1
    assert out[0].score > out[1].score


def test_bm25_log_idf_variant_runs_and_preserves_order(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "spark data data")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ("spark", "join"), k=10, idf="log").collect()
    assert [r.doc_id for r in out] == [1, 2]


# --- prefix_jaccard_pairs (losslessness) ----------------------------------


def test_prefix_jaccard_matches_bruteforce(spark):
    from bbt_etl_dw_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "the quick brown fox jumps over a lazy dog"),
        (4, "completely different content with no overlap at all"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (6, "short"),
        (7, "short"),
        (8, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = prefix_jaccard_pairs(
        df, "doc_id", "text", shingle_k=2, threshold_num=2, threshold_den=5
    )
    brute = ngram_jaccard_pairs(df, "doc_id", "text", shingle_k=2, threshold=2 / 5)
    f = {(r.id_a, r.id_b): r.jaccard for r in fast.collect()}
    b = {(r.id_a, r.id_b): r.jaccard for r in brute.collect()}
    assert f == b and len(f) > 0
    assert (1, 5) in f and f[(1, 5)] == 1.0  # exact dup pair survives
    assert (6, 7) in f  # short-text fallback shingle pair


def test_prefix_candidates_size_filter_prunes(spark):
    from bbt_etl_dw_spark.operators.dedup import prefix_jaccard_candidates

    # doc 2 shares a rare token with doc 1 but is 10x the size: the
    # integral size-compatibility residual must prune the pair at t=1/2
    docs = [
        (1, "alpha beta"),
        (2, "alpha " + " ".join(f"w{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cands = prefix_jaccard_candidates(
        df, "doc_id", "text", shingle_k=1, threshold_num=1, threshold_den=2
    ).collect()
    assert cands == []


# --- gap sessionization / seasonality / independence invariants ----------


def test_sessionization_splits_on_gap_only(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "click", 1.0),
        (1, 2, t0 + dt.timedelta(minutes=10), "view", 2.0),
        (1, 3, t0 + dt.timedelta(minutes=50), "click", 3.0),  # 40min gap
        (2, 4, t0, "view", 4.0),
    ]
    ev = _events(spark, rows)
    from bbt_etl_dw_spark.suite.behavior import events_gap_sessionization
    import bbt_etl_dw_spark.catalog as catalog

    # drive the suite logic directly on a local frame via the operator
    # shape: reuse the registered builder against a temp parquet dir
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        out = events_gap_sessionization(spark, td).collect()
    sessions = {(r.user_id, r.session_seq): r for r in out}
    assert set(sessions) == {(1, 1), (1, 2), (2, 1)}
    assert sessions[(1, 1)].n_events == 2
    assert sessions[(1, 1)].duration_us == 10 * 60 * 1_000_000
    assert sessions[(1, 2)].n_events == 1
    assert sessions[(1, 1)].session_value == 3.0


# --- PCA (covariance + projection properties) -----------------------------


def test_pca_components_properties(spark, sf_dir):
    import math

    from bbt_etl_dw_spark.catalog import table as _table
    from bbt_etl_dw_spark.operators.pca import pca_components, pca_project

    emb = _table(spark, sf_dir, "embeddings")
    means, comps, eigs = pca_components(emb, "embedding", k=3)
    d = len(means)
    assert len(comps) == 3 and all(len(c) == d for c in comps)
    # descending explained variance
    assert eigs[0] >= eigs[1] >= eigs[2] > 0
    # orthonormal components
    for a in range(3):
        for b in range(3):
            dot = sum(comps[a][i] * comps[b][i] for i in range(d))
            assert abs(dot - (1.0 if a == b else 0.0)) < 1e-9
    # sign convention: the largest-|entry| coordinate is positive
    for c in comps:
        j = max(range(d), key=lambda i: abs(c[i]))
        assert c[j] > 0
    # projected sample variance along pc0 equals the top eigenvalue
    rows = pca_project(emb, "embedding", k=1).collect()
    n = len(rows)
    mean0 = sum(r.pc0 for r in rows) / n
    var0 = sum((r.pc0 - mean0) ** 2 for r in rows) / (n - 1)
    assert math.isclose(var0, eigs[0], rel_tol=1e-6)


def test_pca_covariance_diagonal_is_variance(spark):
    from bbt_etl_dw_spark.operators.pca import covariance_matrix

    rows = [(1, [1.0, 10.0]), (2, [2.0, 10.0]), (3, [3.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r.dim_i, r.dim_j): r.cov for r in covariance_matrix(df, "embedding").collect()}
    assert out[(0, 0)] == 1.0  # var of 1,2,3
    assert out[(1, 1)] == 0.0  # constant dim
    assert out[(0, 1)] == 0.0  # no covariance with a constant


# --- time-boxed funnel ----------------------------------------------------


def test_funnel_max_gap_constraint(spark):
    import datetime as dt

    from bbt_etl_dw_spark.operators.behavior import funnel_stage_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 converts within the window at every step
        (1, 1, t0, "signup", None),
        (1, 2, t0 + dt.timedelta(hours=2), "click", None),
        (1, 3, t0 + dt.timedelta(hours=4), "purchase", 1.0),
        # user 2's click comes 3 days after signup: stage 2 fails
        (2, 4, t0, "signup", None),
        (2, 5, t0 + dt.timedelta(days=3), "click", None),
        (2, 6, t0 + dt.timedelta(days=3, hours=1), "purchase", 1.0),
    ]
    ev = _events(spark, rows)
    day_us = 86_400_000_000
    out = {
        r.stage: r.n_users
        for r in funnel_stage_counts(
            ev, ("signup", "click", "purchase"), max_gap_us=day_us
        ).collect()
    }
    assert out == {"signup": 2, "click": 1, "purchase": 1}
    # without the gap both users convert fully
    out2 = {
        r.stage: r.n_users
        for r in funnel_stage_counts(ev, ("signup", "click", "purchase")).collect()
    }
    assert out2 == {"signup": 2, "click": 2, "purchase": 2}


# --- sequence mining --------------------------------------------------------


def test_user_event_sequences_order_and_alphabet(spark):
    import datetime as dt

    from bbt_etl_dw_spark.operators.behavior import user_event_sequences

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # same-microsecond tie broken by event_id (2 before 3)
        (1, 3, t0, "click", None),
        (1, 2, t0, "signup", None),
        (1, 4, t0 + dt.timedelta(minutes=1), "purchase", 1.0),
        # unmapped type drops, not blanks
        (2, 5, t0, "view", None),
        (2, 6, t0 + dt.timedelta(seconds=1), "bot_ping", None),
        (2, 7, t0 + dt.timedelta(seconds=2), "view", None),
    ]
    ev = _events(spark, rows)
    out = {r.user_id: r.seq for r in user_event_sequences(
        ev, {"signup": "s", "click": "c", "purchase": "p", "view": "v"}
    ).collect()}
    assert out == {1: "scp", 2: "vv"}


def test_sequence_pattern_counts_nonoverlapping(spark):
    """regexp_count must count leftmost non-overlapping matches: the
    'eeee' streak is ONE e{2,} match, not three."""
    import datetime as dt

    from bbt_etl_dw_spark.operators.behavior import user_event_sequences
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(seconds=i), "error", None)
            for i in range(4)]
    ev = _events(spark, rows)
    seqs = user_event_sequences(ev, {"error": "e"})
    n = seqs.select(F.expr("regexp_count(seq, 'e{2,}')").alias("c")).head().c
    assert n == 1


# --- BFS traversal ----------------------------------------------------------


def test_bfs_hops_chain_cap_and_unreachable(spark):
    from bbt_etl_dw_spark.operators.traversal import bfs_hops

    # directed chain a->b->c->d plus an isolated edge x->y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    src = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.hops for r in bfs_hops(edges, src, 2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}  # d beyond cap, x/y unreachable
    # directedness: nothing reaches a
    back = {r.node: r.hops for r in bfs_hops(edges, spark.createDataFrame(
        [("d",)], "node string"), 3).collect()}
    assert back == {"d": 0}


def test_bfs_hops_multi_source_takes_nearest(spark):
    from bbt_etl_dw_spark.operators.traversal import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("z", "c")], "src string, dst string"
    )
    src = spark.createDataFrame([("a",), ("z",)], "node string")
    out = {r.node: r.hops for r in bfs_hops(edges, src, 5).collect()}
    # c is 2 from a but 1 from z — nearest source wins
    assert out == {"a": 0, "z": 0, "b": 1, "c": 1}


# --- linear multi-touch attribution ------------------------------------------


def test_linear_attribution_splits_and_conserves(spark):
    import datetime as dt

    from bbt_etl_dw_spark.operators.attribution import linear_attribution
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        # user 1: click + view in window -> purchase 10 splits 5/5
        (1, 1, t0 - dt.timedelta(days=2), "click", None),
        (1, 2, t0 - dt.timedelta(days=1), "view", None),
        (1, 3, t0, "purchase", 10.0),
        # user 2: one click OUTSIDE the 7d window -> direct
        (2, 4, t0 - dt.timedelta(days=8), "click", None),
        (2, 5, t0, "purchase", 4.0),
        # user 3: two clicks in window -> both credits to click
        (3, 6, t0 - dt.timedelta(hours=2), "click", None),
        (3, 7, t0 - dt.timedelta(hours=1), "click", None),
        (3, 8, t0, "purchase", 6.0),
    ]
    ev = _events(spark, rows)
    out = {r.channel: r for r in linear_attribution(
        ev,
        touch_pred=F.col("event_type").isin("click", "view"),
        conv_pred=F.col("event_type") == "purchase",
        touch_label=F.col("event_type"),
        lookback_days=7,
    ).collect()}
    assert out["click"].attributed_value == 5.0 + 6.0
    assert out["view"].attributed_value == 5.0
    assert out["direct"].attributed_value == 4.0
    assert out["click"].fractional_conversions == 0.5 + 1.0
    assert out["view"].fractional_conversions == 0.5
    # conservation: every conversion's value is fully distributed
    assert sum(r.attributed_value for r in out.values()) == 20.0


def test_attribution_cte_replays_first_touch_bitexact(spark):
    """The DuckDB CTE replay (sql_attribution_cte) must match the Spark
    operator row-for-row for position='first', including the same-ts
    eligibility edges — the suite oracle only exercises 'last', so this
    pins the 'first' branch of the CTE."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from bbt_etl_dw_spark.operators.attribution import (
        attribute_conversions,
        sql_attribution_cte,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "click", None),
        (1, 2, t0 + dt.timedelta(hours=1), "view", None),
        (1, 3, t0 + dt.timedelta(hours=2), "purchase", 4.0),
        # same-ts edges: later-id touch ineligible, earlier-id eligible
        (2, 9, t0, "click", None),
        (2, 5, t0, "purchase", 1.0),
        (3, 2, t0, "view", None),
        (3, 7, t0, "purchase", 2.0),
        # outside the lookback
        (4, 1, t0 - dt.timedelta(days=9), "click", None),
        (4, 2, t0, "purchase", 3.0),
        # self-touching conversion is NOT a touch here (purchase isn't a
        # touch type) -> direct
        (5, 1, t0, "purchase", 5.0),
    ]
    ev = _events(spark, rows)
    got = {
        (r.user_id, r.event_id): r.channel
        for r in attribute_conversions(
            ev,
            touch_pred=F.col("event_type").isin("click", "view"),
            conv_pred=F.col("event_type") == "purchase",
            touch_label=F.col("event_type"),
            lookback_days=7,
            position="first",
        ).collect()
    }

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "event_type", "value"]
        ),
    )
    cte = sql_attribution_cte(
        touch_sql="event_type IN ('click', 'view')",
        conv_sql="event_type = 'purchase'",
        label_sql="event_type",
        lookback_days=7,
        position="first",
    )
    oracle = {
        (u, e): c
        for u, e, c in con.execute(
            f"WITH {cte} SELECT user_id, event_id, channel FROM attributed"
        ).fetchall()
    }
    assert got == oracle
    assert got[(2, 5)] == "direct" and got[(3, 7)] == "view"
    assert got[(1, 3)] == "click" and got[(4, 2)] == "direct"
    assert got[(5, 1)] == "direct"
