#!/usr/bin/env python3
"""Measured shuffle/input bytes per headline query — the evidence behind
the "one shuffle per logical aggregation, facts never re-shuffle per
join" design claims (README Scale design). Timings say a plan is fast on
THIS box; shuffle bytes say whether it would still be fast when the
shuffle is a network instead of a page cache.

Per query: run once end-to-end (noop sink), then attribute the Spark UI
REST API's per-stage metrics (completed stages above the pre-run
watermark) to it: shuffle write + read bytes, input records, and stage
counts. Skipped stages (AQE-reused exchanges) are free and counted
separately. `inputBytes` is deliberately NOT reported — the vectorized
parquet reader under-reports it by orders of magnitude (measured: 17KB
for a 600k-row scan), and a wrong number is worse than none; input
RECORDS are accurate and reported instead.

Reading the numbers: a query whose shuffle bytes ≈ its pre-aggregated
group count × row width has map-side partial aggregation working; large
shuffle bytes on a single-table agg usually mean the catalog's
``spread`` repartition (a local-mode compensation that is a no-op on a
real multi-file lake — see catalog.table) rather than a plan defect.

Usage:
    python shuffle_audit.py            # sf0.1 headline set -> one JSON line
    SPARK_GRAFT_SF_DIR=... python shuffle_audit.py
    python shuffle_audit.py q1 q2      # named subset (e.g. the worst 10x
                                       # scalers against the synthetic sf1
                                       # set, VERDICT r08 #4)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stages(ui: str, app_id: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    return json.load(urllib.request.urlopen(url))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bbt_etl_dw_spark.session import get_spark
    from bbt_etl_dw_spark.suite import load_all
    from bench import HEADLINE

    queries = load_all()
    if len(sys.argv) > 1:
        unknown = [n for n in sys.argv[1:] if n not in queries]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        names = list(sys.argv[1:])
    else:
        names = [n for n in HEADLINE if n in queries]
        names += [n for n in sorted(queries) if n not in names and queries[n].bench]

    spark = get_spark(app_name="bbt-etl-dw-spark-shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print(json.dumps({"error": "spark UI disabled; no metrics source"}))
        return
    app_id = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
        "id"
    ]

    out: dict[str, dict] = {}
    for name in names:
        before = {s["stageId"] for s in _stages(ui, app_id)}
        queries[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        rows = {}
        for s in _stages(ui, app_id):
            if s["stageId"] in before:
                continue
            rows.setdefault(s["status"], []).append(s)
        done = rows.get("COMPLETE", [])
        out[name] = {
            "stages": len(done),
            "stages_skipped": len(rows.get("SKIPPED", [])),
            "input_records": sum(s.get("inputRecords", 0) for s in done),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in done) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in done) / 1e6, 2
            ),
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_shuffle_bytes",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
