"""DuckDB oracle comparison harness — mirrors the verification driver:
run the Spark builder and the oracle SQL on the same parquet tables,
sort columns by name, sort rows, compare values exactly (floats must be
bit-identical thanks to the exact-decimal aggregation discipline)."""

from __future__ import annotations

import datetime
import math

import duckdb

from bbt_etl_dw_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.sql(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def _norm(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-exactness required
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare_query(spark, qdef, sf_dir: str, approx: bool = False):
    """Assert Spark result == DuckDB oracle. Returns (n_rows, cols)."""
    sdf = qdef.builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(qdef.oracle, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{qdef.name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    sc, sn = _normalize(s_cols, s_rows)
    oc, on = _normalize(o_cols, o_rows)
    assert len(sn) == len(on), f"{qdef.name}: rowcount spark={len(sn)} oracle={len(on)}"
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    if mismatches and approx:
        mismatches = [(a, b) for a, b in mismatches if not _approx_eq(a, b)]
    assert not mismatches, (
        f"{qdef.name}: {len(mismatches)} row mismatches; first: "
        f"spark={mismatches[0][0]} oracle={mismatches[0][1]}"
    )
    return len(sn), sc


def _approx_eq(a, b, rel=1e-9):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, str) and isinstance(y, str):
            try:
                fx, fy = float(x), float(y)
                if math.isclose(fx, fy, rel_tol=rel, abs_tol=1e-9):
                    continue
            except ValueError:
                pass
        if x != y:
            return False
    return True
