#!/usr/bin/env python3
"""Per-JOB wall-clock profile of one query execution (VERDICT r14 #4:
"profile what the 38 stages still spend"). Runs the query to the
adaptive plateau, then once more timed, and attributes that execution's
driver jobs via the UI REST API: job id, duration, stage count, first
stage name. Eager checkpoints/counts inside operators appear as their
own jobs — exactly the fixed costs the bench wall carries.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/profile_jobs.py <query> [warm_cap]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    warm_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bbt_etl_dw_spark.session import get_spark
    from bbt_etl_dw_spark.suite import load_all

    queries = load_all()
    spark = get_spark(app_name="bbt-job-profile")
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def run_once() -> float:
        t0 = time.perf_counter()
        queries[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    prev = run_once()
    best = prev
    for _ in range(2, warm_cap + 1):
        cur = run_once()
        best = min(best, cur)
        if abs(cur - prev) <= 0.05 * min(cur, prev) and cur <= 1.05 * best:
            break
        prev = cur

    jobs_before = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    mark = max((j["jobId"] for j in jobs_before), default=-1)
    wall = run_once()
    jobs = [
        j
        for j in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
        )
        if j["jobId"] > mark
    ]
    jobs.sort(key=lambda j: j["jobId"])
    out = []
    total = 0.0
    for j in jobs:
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")
        dur = None
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = (
                datetime.strptime(t1.replace("GMT", ""), fmt.replace("%Z", ""))
                - datetime.strptime(t0.replace("GMT", ""), fmt.replace("%Z", ""))
            ).total_seconds()
            total += dur
        except Exception:
            pass
        out.append(
            {
                "job": j["jobId"],
                "sec": round(dur, 3) if dur is not None else None,
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numTasks"),
                "name": (j.get("name") or "")[:90],
                "desc": (j.get("description") or "")[:60],
            }
        )
    print(json.dumps({"query": name, "wall": round(wall, 3),
                      "job_sum": round(total, 3), "n_jobs": len(out)}))
    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
