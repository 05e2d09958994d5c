"""Cost-based-optimizer evidence: join-order sanity on a fact + 3-dim
chain under REAL table/column statistics (the static complement of
test_plans.py::test_aqe_replans_dim_joins_to_broadcast_under_blind_stats,
which covers the stale/absent-stats regime via AQE runtime re-planning).

The contract demonstrated here: when tables are ANALYZEd, Spark's
CostBasedJoinReorder rewrites a deliberately pessimal written order —
fact⋈fact first, the selective dim LAST — into the plan a warehouse
engineer would write by hand: the filtered nation dim joins customer
first, that reduced chain gates orders, and the 100TB-scale fact enters
LAST. At cluster scale this is the difference between shuffling the
full fact three times and shuffling it once pre-reduced.

Catalog note: CBO statistics live in the metastore, so this test
round-trips the sf0.001 tables through ``saveAsTable`` + ``ANALYZE``
into a throwaway database (the parquet-path reads the rest of the suite
uses carry size-only estimates, which is exactly the regime the AQE
test covers)."""

import pytest


@pytest.fixture(scope="module")
def cbo_db(spark, sf_dir):
    db = "cbo_evidence_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db}")
    for t in ("lineitem", "orders", "customer", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(f"{db}.{t}")
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _chain(spark, db):
    # written order is deliberately pessimal: the two fact-proportional
    # tables join first and the 25-row filtered dim joins last
    return spark.sql(
        f"""
        SELECT n.n_name, COUNT(*) AS n_rows
        FROM {db}.lineitem l
        JOIN {db}.orders o   ON l.l_orderkey = o.o_orderkey
        JOIN {db}.customer c ON o.o_custkey = c.c_custkey
        JOIN {db}.nation n   ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY n.n_name
        """
    )


def _with_cbo(spark, enabled: str):
    import contextlib

    @contextlib.contextmanager
    def ctx():
        keys = ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
        prev = {k: spark.conf.get(k) for k in keys}
        for k in keys:
            spark.conf.set(k, enabled)
        try:
            yield
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)

    return ctx()


def _join_condition_order(plan: str) -> list[str]:
    """Join keys in top-down (outermost-first) plan order."""
    out = []
    for line in plan.splitlines():
        if "Join Inner" in line:
            for key in ("l_orderkey", "o_custkey", "c_nationkey"):
                if key in line:
                    out.append(key)
    return out


def test_analyze_populates_row_counts(spark, cbo_db):
    with _with_cbo(spark, "true"):
        stats = (
            spark.table(f"{cbo_db}.lineitem")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        s = stats.toString()
        assert "rowCount=6" in s.replace(".00E+3", "000"), s


def test_filter_selectivity_uses_column_stats(spark, cbo_db):
    """With column NDVs, the optimizer estimates the n_name equality at
    ~1/25 of the dim, not the whole table — the input join reordering
    costs from."""
    with _with_cbo(spark, "true"):
        df = spark.table(f"{cbo_db}.nation").filter("n_name = 'NATION_7'")
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        assert rc.isDefined()
        assert int(str(rc.get())) <= 3, stats.toString()


def test_cbo_reorders_pessimal_join_order(spark, cbo_db):
    """The headline property: stats flip the join tree. Without CBO the
    written (pessimal) order survives — the fact⋈orders join is the
    INNERMOST node and the selective nation dim joins last (outermost).
    With CBO + stats the tree inverts: nation⋈customer innermost,
    the fact entering at the outermost join."""
    with _with_cbo(spark, "false"):
        blind = _chain(spark, cbo_db)._jdf.queryExecution().optimizedPlan().toString()
    with _with_cbo(spark, "true"):
        costed = _chain(spark, cbo_db)._jdf.queryExecution().optimizedPlan().toString()

    # top-down order: outermost join first. Written/pessimal plan keeps
    # nation outermost and the fact join innermost.
    assert _join_condition_order(blind) == [
        "c_nationkey",
        "o_custkey",
        "l_orderkey",
    ], blind
    # costed plan inverts the chain: the fact join is outermost (executed
    # last, over the already-gated dim chain)
    assert _join_condition_order(costed) == [
        "l_orderkey",
        "o_custkey",
        "c_nationkey",
    ], costed
    # and both produce the same answer
    with _with_cbo(spark, "true"):
        a = {tuple(r) for r in _chain(spark, cbo_db).collect()}
    with _with_cbo(spark, "false"):
        b = {tuple(r) for r in _chain(spark, cbo_db).collect()}
    assert a == b and len(a) == 1
