"""Property-based tests (hypothesis): the custom operators the engine adds
over stock Spark — as-of join, interval join, forward-fill — checked
against brute-force Python semantics on adversarial small inputs
(duplicate keys, equal timestamps, empty sides, all-null runs).

Example counts are kept small: each example is a full Spark job."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.asof import asof_join
from bbt_etl_dw_spark.operators.ffill import forward_fill
from bbt_etl_dw_spark.operators.rangejoin import interval_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=20)
vals = st.integers(min_value=-5, max_value=5)


@given(
    left=st.lists(st.tuples(keys, times), max_size=12),
    right=st.lists(st.tuples(keys, times, vals), max_size=12, unique_by=lambda r: (r[0], r[1])),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    got = {
        (r["lid"]): r["v"]
        for r in asof_join(ldf, rdf, on="t", by=["k"], value_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"lid={i} k={k} t={t}: {got[i]} != {want}"


@given(
    left=st.lists(st.tuples(keys, times), max_size=10),
    right=st.lists(st.tuples(keys, times), max_size=10),
    bounds=st.tuples(st.integers(-5, 5), st.integers(-5, 5)).map(sorted),
)
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, left, right, bounds):
    lo, hi = bounds
    base = datetime.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, base + datetime.timedelta(seconds=t), i) for i, (k, t) in enumerate(left)],
        "k long, lt timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, base + datetime.timedelta(seconds=t), i) for i, (k, t) in enumerate(right)],
        "k long, rt timestamp, rid long",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(ldf, rdf, ["k"], "lt", "rt", lo, hi).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lo <= rt - lt <= hi
    }
    assert got == want

    got_left = {
        (r["lid"], r["rid"])
        for r in interval_join(
            ldf, rdf, ["k"], "lt", "rt", lo, hi, how="left", left_id="lid"
        ).collect()
    }
    matched_lids = {i for i, _ in want}
    want_left = want | {
        (i, None) for i in range(len(left)) if i not in matched_lids
    }
    assert got_left == want_left


@given(
    rows=st.lists(
        st.tuples(keys, st.one_of(st.none(), vals)), max_size=15
    ),
)
@settings(**SETTINGS)
def test_forward_fill_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k long, seq long, v long"
    )
    filled = forward_fill(df, ["v"], partition_by=["k"], order_by=["seq"])
    got = {r["seq"]: r["v"] for r in filled.collect()}
    last: dict[int, int | None] = {}
    for i, (k, v) in enumerate(rows):
        if v is not None:
            last[k] = v
        assert got[i] == last.get(k), f"seq={i}"


@given(
    snapshots=st.lists(
        st.lists(st.tuples(keys, vals), max_size=4, unique_by=lambda r: r[0]),
        min_size=1,
        max_size=4,
    ),
)
@settings(**SETTINGS)
def test_scd2_invariants(spark, snapshots):
    """Replay arbitrary snapshot sequences through scd2_merge and check the
    structural invariants: exactly one current row per live key, current
    rows match the latest snapshot, expired rows are closed with an end
    date, and history length equals the number of value changes."""
    import datetime as dt

    from bbt_etl_dw_spark.operators.scd2 import END, IS_CURRENT, scd2_init, scd2_merge

    base = dt.date(2024, 1, 1)
    dim = scd2_init(
        spark.createDataFrame(snapshots[0] or [(99, 0)], "k long, v long"), base
    )
    seen = {k: v for k, v in (snapshots[0] or [(99, 0)])}
    changes = dict(seen)
    n_versions = len(seen)
    for i, snap in enumerate(snapshots[1:], start=1):
        incoming = spark.createDataFrame(snap or [(99, 0)], "k long, v long")
        dim = scd2_merge(dim, incoming, ["k"], ["v"], base + dt.timedelta(days=i))
        snap_d = dict(snap or [(99, 0)])
        for k, v in snap_d.items():
            if k not in changes or changes[k] != v:
                n_versions += 1
            changes[k] = v
        # keys absent from the snapshot are expired (deleted)
        changes = {k: v for k, v in changes.items() if k in snap_d}
        rows = dim.collect()
        cur = [r for r in rows if r[IS_CURRENT]]
        # one current row per live key, values = latest snapshot
        assert {r["k"]: r["v"] for r in cur} == snap_d
        assert len(cur) == len(snap_d)
        # every non-current row is properly closed
        assert all(r[END] is not None for r in rows if not r[IS_CURRENT])
        # full history: one row per (key, version-change)
        assert len(rows) == n_versions


words_st = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=6
)


@given(
    train=st.lists(words_st, max_size=6),
    eval_=st.lists(words_st, max_size=3),
)
@settings(**SETTINGS)
def test_decontaminate_matches_bruteforce(spark, train, eval_):
    """Surviving train docs share NO 2-gram with the eval set; dropped docs
    share at least one — checked against plain-Python n-gram sets."""
    from bbt_etl_dw_spark.operators.decontam import decontaminate

    tdf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(train)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(eval_)], "doc_id long, text string"
    )

    def grams(ws):
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    eval_grams = set().union(*[grams(ws) for ws in eval_]) if eval_ else set()
    want = sorted(i for i, ws in enumerate(train) if not (grams(ws) & eval_grams))

    got = sorted(
        r["doc_id"] for r in decontaminate(tdf, edf, n=2).select("doc_id").collect()
    )
    assert got == want


wordpool = st.sampled_from(["aa", "bb", "cc", "dd"])
docstexts = st.lists(
    st.lists(wordpool, max_size=10).map(" ".join), min_size=1, max_size=5
)


@given(texts=docstexts)
@settings(**SETTINGS)
def test_duplicated_spans_matches_bruteforce(spark, texts):
    """duplicated_spans vs a pure-Python reference on tiny random corpora
    over a 4-word alphabet (dense window collisions by construction):
    same spans, same merges, same cross-doc-only semantics."""
    from bbt_etl_dw_spark.operators.spans import duplicated_spans

    n = 3
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=n).collect()
    )

    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    wins: dict[str, set[int]] = {}
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            wins.setdefault(" ".join(ws[p : p + n]), set()).add(i)
    dup = {g for g, ds in wins.items() if len(ds) >= 2}
    want = []
    for i, ws in toks.items():
        pos = [p for p in range(len(ws) - n + 1) if " ".join(ws[p : p + n]) in dup]
        start = None
        prev = None
        for p in pos:
            if start is None:
                start, prev = p, p
            elif p > prev + n:
                want.append((i, start, prev + n - 1))
                start, prev = p, p
            else:
                prev = p
        if start is not None:
            want.append((i, start, prev + n - 1))
    assert got == sorted(want), (texts, got, sorted(want))


ev_users = st.integers(min_value=1, max_value=3)
ev_types = st.sampled_from(["signup", "click", "purchase", "view"])
ev_times = st.integers(min_value=0, max_value=30)


@given(events=st.lists(st.tuples(ev_users, ev_types, ev_times), max_size=16))
@settings(**SETTINGS)
def test_funnel_matches_bruteforce(spark, events):
    """funnel_stage_counts vs brute-force Python on random event soups:
    per user, t1 = min signup ts, t2 = min click ts strictly after t1,
    t3 = min purchase ts strictly after t2."""
    import datetime as dt

    from bbt_etl_dw_spark.operators.behavior import funnel_stage_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=t), u, typ, 1.0, "{}")
        for i, (u, typ, t) in enumerate(events)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    steps = ("signup", "click", "purchase")
    got = {r["stage"]: r["n_users"] for r in funnel_stage_counts(df, steps).collect()}

    want = {s: 0 for s in steps}
    for u in {u for (u, _, _) in events}:
        mine = sorted((t, typ) for (uu, typ, t) in events if uu == u)
        prev = None
        for k, step in enumerate(steps):
            cands = [t for (t, typ) in mine if typ == step and (prev is None or t > prev)]
            if not cands:
                break
            prev = min(cands)
            want[step] += 1
    # empty stage rows: stack always emits all 3 stages (counts 0)
    assert got == want or (not events and set(got.values()) == {0})


# --- CDC round-trip law ---------------------------------------------------
# For any two snapshots: applying snapshot_diff(old, new) onto a target
# holding old must reconstruct new EXACTLY — inserts, deletes, in-place
# updates, cross-partition moves, value->null and null->value transitions
# all compose through the partition-scoped writer.

snap_names = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
snap_parts = st.sampled_from(["p1", "p2"])
snapshots = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.tuples(snap_names, snap_parts),
    max_size=6,
)


@given(old=snapshots, new=snapshots)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_cdc_roundtrip_reconstructs_new_snapshot(spark, old, new):
    import shutil
    import tempfile

    from hypothesis import assume

    from bbt_etl_dw_spark.operators.diff import apply_changes, snapshot_diff

    # empty-side bootstrap is outside the operator contract (a schema-less
    # parquet dir cannot be read back)
    assume(old and new)

    def df_of(d):
        return spark.createDataFrame(
            [(k, n, p) for k, (n, p) in sorted(d.items())],
            "k long, name string, part string",
        )

    target = tempfile.mkdtemp(prefix="cdc_prop_")
    try:
        old_df, new_df = df_of(old), df_of(new)
        old_df.write.mode("overwrite").partitionBy("part").parquet(target)
        changes = snapshot_diff(old_df, new_df, keys=["k"])
        apply_changes(spark, target, changes, keys=["k"], part_col="part")
        got = sorted(
            (r["k"], r["name"], r["part"])
            for r in spark.read.parquet(target)
            .selectExpr("k", "name", "CAST(part AS STRING) part")
            .collect()
        )
        want = sorted((k, n, p) for k, (n, p) in new.items())
        assert got == want
    finally:
        shutil.rmtree(target, ignore_errors=True)
