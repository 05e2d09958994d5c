"""Oracle type lint — kills the two-time SUM->HUGEINT bug class.

DuckDB widens SUM(INTEGER)/SUM(BIGINT) to HUGEINT (int128). Spark has no
int128, so the driver's type-aware value hash mismatches even when every
value is identical (VERDICT r01 props_numeric_extract, VERDICT r02
media_payload_stats). The local pytest oracle compares Python ints and
cannot see it — so lint the DuckDB result schema itself: no registered
oracle may produce a HUGEINT/UHUGEINT column. Fix sites wrap the
aggregate: CAST(SUM(...) AS BIGINT).
"""

import duckdb
import pytest

from bbt_etl_dw_spark.catalog import TABLES
from bbt_etl_dw_spark.suite import load_all

QUERIES = load_all()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle)

_BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_no_hugeint(con, name):
    rel = con.sql(QUERIES[name].oracle)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) in _BANNED
    ]
    assert not bad, (
        f"{name}: oracle produces {bad} — Spark has no int128, the driver "
        f"hash will mismatch; wrap the aggregate in CAST(... AS BIGINT)"
    )
