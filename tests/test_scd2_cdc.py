"""scd2_apply_changes (CDC feed) must be semantically equivalent to
scd2_merge (full snapshot) on the same evolution — including the
untracked-only-change case, pre-existing closed history, deletes, and
brand-new keys — while touching only churned keys."""

import datetime

from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.diff import snapshot_diff
from bbt_etl_dw_spark.operators.scd2 import (
    scd2_apply_changes,
    scd2_init,
    scd2_merge,
)

D0 = datetime.date(2024, 1, 1)
D1 = datetime.date(2024, 6, 1)
D2 = datetime.date(2024, 9, 1)

SCHEMA = "k long, tracked string, untracked string"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_cdc_scd2_equals_full_snapshot_merge(spark):
    v0 = _snap(
        spark,
        [
            (1, "a", "x"),
            (2, "b", "x"),
            (3, "c", "x"),
            (4, "d", "x"),
            (5, "e", "x"),
        ],
    )
    # an intermediate era so real CLOSED history exists before the test step
    v1 = _snap(
        spark,
        [
            (1, "a2", "x"),  # tracked change at D1 -> closed row for k=1
            (2, "b", "x"),
            (3, "c", "x"),
            (4, "d", "x"),
            (5, "e", "x"),
        ],
    )
    history = scd2_merge(
        scd2_init(v0, D0), v1, ["k"], tracked_cols=["tracked"], asof=D1
    ).localCheckpoint()

    v2 = _snap(
        spark,
        [
            (1, "a3", "x"),   # tracked update -> new version
            (2, "b", "y"),    # untracked-only update -> NO new version
            (3, "c", "x"),    # unchanged
            # 4 deleted -> expire without successor
            (5, "e", "x"),    # unchanged
            (6, "f", "x"),    # insert -> first version
        ],
    )

    want = scd2_merge(history, v2, ["k"], tracked_cols=["tracked"], asof=D2)
    changes = snapshot_diff(v1, v2, keys=["k"])
    got = scd2_apply_changes(
        history, changes, ["k"], tracked_cols=["tracked"], asof=D2
    )

    def norm(df):
        return sorted(tuple(r) for r in df.collect())

    assert norm(got) == norm(want)

    # spot-check the semantics directly
    out = {
        (r["k"], r["tracked"], r["is_current"]): r for r in got.collect()
    }
    assert out[(1, "a3", True)]["effective_start_date"] == D2
    assert out[(1, "a2", False)]["effective_end_date"] == D2
    assert out[(1, "a", False)]["effective_end_date"] == D1
    assert (2, "b", True) in out          # untracked drift: still v0 row
    assert out[(2, "b", True)]["untracked"] == "x"  # old untracked value kept
    assert out[(4, "d", False)]["effective_end_date"] == D2
    assert (4, "d", True) not in out      # no successor after delete
    assert out[(6, "f", True)]["effective_start_date"] == D2


def test_cdc_scd2_touches_only_churned_keys(spark):
    """Untouched keys' rows pass through by identity — the pass-through
    side carries no per-row version logic, only the broadcast anti-mark."""
    v0 = _snap(spark, [(i, f"t{i}", "u") for i in range(1, 8)])
    history = scd2_init(v0, D0)
    v1 = _snap(
        spark,
        [(i, f"t{i}" if i != 3 else "CHANGED", "u") for i in range(1, 8)],
    )
    changes = snapshot_diff(v0, v1, keys=["k"])
    assert changes.count() == 1  # only k=3 churned
    got = scd2_apply_changes(history, changes, ["k"], ["tracked"], asof=D1)
    assert got.count() == 8  # 7 originals + 1 new version
    assert got.filter(~F.col("is_current")).count() == 1


def test_cdc_scd2_equals_merge_on_random_evolutions(spark):
    """Randomized two-step evolutions (hypothesis): maintaining the
    dimension from CDC feeds must land bit-identical to full-snapshot
    merges at every step — whatever mix of inserts, deletes, tracked and
    untracked updates the generator produces."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    snap = st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.tuples(
            st.sampled_from(["a", "b", "c"]),      # tracked
            st.sampled_from(["u", "v"]),           # untracked
        ),
        min_size=1,
        max_size=5,
    )

    @given(v0=snap, v1=snap, v2=snap)
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(v0, v1, v2):
        def df_of(d):
            return spark.createDataFrame(
                [(k, t, u) for k, (t, u) in sorted(d.items())], SCHEMA_R
            )

        hist_merge = scd2_init(df_of(v0), D0)
        hist_cdc = hist_merge
        prev = v0
        for asof, v in ((D1, v1), (D2, v2)):
            hist_merge = scd2_merge(
                hist_merge, df_of(v), ["k"], ["tracked"], asof
            ).localCheckpoint()
            changes = snapshot_diff(df_of(prev), df_of(v), keys=["k"])
            hist_cdc = scd2_apply_changes(
                hist_cdc, changes, ["k"], ["tracked"], asof
            ).localCheckpoint()
            prev = v
        got = sorted(tuple(r) for r in hist_cdc.collect())
        want = sorted(tuple(r) for r in hist_merge.collect())
        assert got == want

    run()


SCHEMA_R = "k long, tracked string, untracked string"


def test_scd2_merge_null_natural_key_is_stable(spark):
    """Review finding: a live row with a NULL natural key never equi-
    joined its incoming twin, so every merge expired AND re-inserted it —
    one spurious closed version per run, forever. With null-safe key
    equality an unchanged null-key row is simply unchanged."""
    import datetime

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.scd2 import scd2_init, scd2_merge

    base = spark.createDataFrame(
        [(None, "nullkey", 1.0), (1, "one", 2.0)],
        "k int, name string, v double",
    )
    dim = scd2_init(base, asof=datetime.date(2024, 1, 1))
    out = scd2_merge(
        dim, base, natural_key=["k"], tracked_cols=["name", "v"],
        asof=datetime.date(2024, 2, 1),
    )
    # identical snapshot: nothing expires, nothing inserts, ever
    assert out.count() == 2
    assert out.filter(~F.col("is_current")).count() == 0
    # a real change to the null-key row versions it exactly once
    changed = spark.createDataFrame(
        [(None, "nullkey", 9.0), (1, "one", 2.0)],
        "k int, name string, v double",
    )
    out2 = scd2_merge(
        out, changed, natural_key=["k"], tracked_cols=["name", "v"],
        asof=datetime.date(2024, 3, 1),
    )
    nullrows = out2.filter(F.col("k").isNull())
    assert nullrows.count() == 2  # one closed version + one current
    assert nullrows.filter(F.col("is_current")).collect()[0]["v"] == 9.0


def test_cdc_scd2_null_natural_key_closes_on_delete(spark):
    """r08 review: the change-feed path closed live rows via a name-based
    (null-UNSAFE) key join, so a delete for a NULL-key row never expired
    it — scd2_merge had already fixed this class with eqNullSafe; the CDC
    path must agree."""
    import datetime as dt

    from bbt_etl_dw_spark.operators.scd2 import (
        END,
        IS_CURRENT,
        scd2_apply_changes,
        scd2_init,
    )

    d0, d1 = dt.date(2024, 1, 1), dt.date(2024, 2, 1)
    dim = scd2_init(
        spark.createDataFrame([(None, "x"), (1, "y")], "k int, v string"), d0
    )
    changes = spark.createDataFrame(
        [("delete", None, None, None)],
        "op string, k int, new_v string, changed_cols array<string>",
    ).select("op", "k", "new_v", F.col("changed_cols"))
    out = scd2_apply_changes(dim, changes, ["k"], ["v"], d1).collect()
    by_key = {(r.k, r[IS_CURRENT]): r for r in out}
    assert (None, False) in by_key, "NULL-key row must expire on delete"
    assert by_key[(None, False)][END] == d1
    assert (1, True) in by_key  # untouched key passes through live
    assert len(out) == 2
