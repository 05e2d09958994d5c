"""Every oracle-paired suite query must match DuckDB exactly at sf0.001.
This is a local mirror of the driver's CORRECTNESS gate."""

import pytest

from bbt_etl_dw_spark.suite import load_all

QUERIES = load_all()
ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    from tests.oracle import compare_query

    n_rows, _ = compare_query(spark, QUERIES[name], sf_dir)
    assert n_rows >= 0


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
