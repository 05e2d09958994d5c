"""Local mirror of the verification driver's CORRECTNESS gate.

Runs registered queries through ``__spark_entry__`` exactly the way the
driver does — a plain SparkSession (no test fixtures), the first-50
registry window, sf0.01 tables, DuckDB oracles compared column-sorted /
row-sorted / value-exact — and prints one JSON report.

Run with ``--hostile-tz`` to start the session on a non-UTC timezone and
prove the engine's scan-level normalization (session.tune pins the
SESSION timezone to UTC on any session it is handed)::

    python driver_sim.py --hostile-tz                     # full 50-window
    python driver_sim.py --sf /root/testdata/sf0.01 q1 q2 # named subset

Do NOT run with a non-UTC OS timezone (``TZ=... python driver_sim.py``):
PySpark's ``collect()`` converts TIMESTAMP values to naive datetimes via
the PYTHON process's OS zone — a layer outside any query plan, applied
after the engine's work is done — so every timestamp-emitting query would
"fail" by exactly the OS offset while the plans and stored values are
correct. The verification driver runs with a UTC OS zone (every
timestamp-emitting query is hash-green in the recorded CORRECTNESS
artifacts); the session timezone is the layer an engine can and must
defend, and ``--hostile-tz`` tests exactly that.

Exit code 1 if any checked query mismatches.
"""

from __future__ import annotations

import argparse
import json
import sys

WINDOW = 50


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: 50-window)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="every registered query")
    ap.add_argument(
        "--hostile-tz",
        action="store_true",
        help="start the session on a non-UTC session timezone "
        "(session.tune must neutralize it at the scan)",
    )
    ap.add_argument(
        "--hostile-confs",
        action="store_true",
        help="adversarial session confs BEYOND timezone: case-sensitive "
        "analysis, a prime shuffle-partition count (flushes out any "
        "partitioning-dependent result), and a tiny broadcast threshold "
        "(every auto-broadcast join degrades to a shuffle join — results "
        "must not depend on join strategy). The real driver builds its "
        "own session; this fuzzes the confs it might legitimately hold.",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle import _normalize, run_oracle

    builder = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
    )
    if args.hostile_tz:
        builder = builder.config("spark.sql.session.timeZone", "America/Anchorage")
    if args.hostile_confs:
        builder = (
            builder.config("spark.sql.caseSensitive", "true")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.autoBroadcastJoinThreshold", "1KB")
        )
    spark = builder.getOrCreate()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.names:
        names = list(args.names)
    else:
        names = list(qs)[: (len(qs) if args.all else WINDOW)]

    report: dict[str, dict] = {}
    fails = 0
    for name in names:
        row: dict = {}
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                row = {"err": "no_oracle", "spark_rows": len(s_rows)}
            else:
                o_cols, o_rows = run_oracle(oracles[name], args.sf)
                sc, sn = _normalize(s_cols, s_rows)
                oc, on = _normalize(o_cols, o_rows)
                row = {
                    "rows_match": len(sn) == len(on),
                    "schema_match": sc == oc,
                    "hash_match": sn == on,
                    "spark_rows": len(sn),
                    "oracle_rows": len(on),
                }
                if not (row["rows_match"] and row["schema_match"] and row["hash_match"]):
                    fails += 1
                    bad = next(
                        ((a, b) for a, b in zip(sn, on) if a != b), None
                    )
                    if bad:
                        row["first_diff"] = [repr(bad[0])[:200], repr(bad[1])[:200]]
        except Exception as e:  # driver records errors per-row, keeps going
            fails += 1
            row = {"err": f"{type(e).__name__}: {e}"[:300]}
        report[name] = row
        good = (
            row.get("hash_match") is True
            and row.get("rows_match") is True
            and row.get("schema_match") is True
        )
        status = "ok" if good else row.get("err", "FAIL")
        print(f"{name}: {status}", file=sys.stderr)

    print(json.dumps(report, indent=1))
    print(
        f"checked={len(names)} fails={fails}",
        file=sys.stderr,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
