#!/usr/bin/env python3
"""Isolated per-query timing probe: bench.py methodology (noop sink,
adaptive warmup, min of N) for an explicit subset of queries. Usage:
    python tools/probe_queries.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_BENCH_WARMUPS (default 6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bbt_etl_dw_spark.session import get_spark
    from bbt_etl_dw_spark.suite import load_all

    queries = load_all()
    spark = get_spark(app_name="bbt-probe")
    spark.sparkContext.setLogLevel("WARN")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warm_cap = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "6"))

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        prev = run_once(name)
        best = prev
        warm = warm_cap
        for i in range(2, warm_cap + 1):
            cur = run_once(name)
            best = min(best, cur)
            if abs(cur - prev) <= 0.05 * min(cur, prev) and cur <= 1.05 * best:
                warm = i
                break
            prev = cur
        runs = [run_once(name) for _ in range(n_runs)]
        out[name] = {
            "min": round(min(runs), 4),
            "spread": round(max(runs) - min(runs), 4),
            "warmups": warm,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
