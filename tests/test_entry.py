"""Driver-contract smoke tests for __spark_entry__.py."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "region" in df.columns


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_size_matches_decorator_count():
    """Every @register decorator in the suite sources must land in the
    registry: a silent-overwrite duplicate shadowed a live query+oracle in
    round 7 (VERDICT r07 #1). register() now raises on duplicates; this
    test pins the decorator-count == registry-size invariant so a future
    refactor cannot reintroduce the gap through another path."""
    import glob
    import os
    import re

    from bbt_etl_dw_spark.suite import load_all

    reg = load_all()
    suite_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bbt_etl_dw_spark",
        "suite",
    )
    decorators = 0
    for path in glob.glob(os.path.join(suite_dir, "*.py")):
        decorators += len(re.findall(r"^@register\(", open(path).read(), re.M))
    assert decorators == len(reg), (
        f"{decorators} @register decorators but {len(reg)} registry entries "
        "— a duplicate name or an unregistered decorator"
    )


def test_duplicate_registration_raises():
    import pytest

    from bbt_etl_dw_spark.suite import QUERIES, register

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        register(existing)(lambda spark, sf_dir: None)
