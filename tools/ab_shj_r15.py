#!/usr/bin/env python3
"""SMJ vs SHJ A/B at the scale tier (VERDICT r14 #5, guide §9): the three
fact-join-fact queries whose single SortMergeJoin is the lineitem-orders
orderkey join. r14 measured this at sf0.1 (inside noise, not shipped);
this probe re-runs it at synthetic sf1 where the shuffle has bytes.

Same JVM, both modes warmed to plateau, N alternating timed pairs.
SHJ mode: spark.sql.join.preferSortMergeJoin=false +
spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m (both
runtime-settable; restored after each run block).

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python tools/ab_shj_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "star_fact_assembly",
    "sales_by_region",
    "returned_item_top_customers",
]
N_PAIRS = int(os.environ.get("AB_PAIRS", "8"))
WARM_CAP = int(os.environ.get("AB_WARM_CAP", "10"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")
    from bbt_etl_dw_spark.session import get_spark
    from bbt_etl_dw_spark.suite import load_all

    queries = load_all()
    spark = get_spark(app_name="bbt-ab-shj-r15")
    spark.sparkContext.setLogLevel("WARN")

    def set_mode(shj: bool) -> None:
        spark.conf.set("spark.sql.join.preferSortMergeJoin", str(not shj).lower())
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m" if shj else "0",
        )

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def warm(name: str) -> list[float]:
        walls = [run_once(name)]
        best = walls[0]
        for _ in range(2, WARM_CAP + 1):
            cur = run_once(name)
            walls.append(cur)
            best = min(best, cur)
            if abs(cur - walls[-2]) <= 0.05 * min(cur, walls[-2]) and cur <= 1.05 * best:
                break
        return walls

    out = {"sf_dir": sf_dir, "n_pairs": N_PAIRS,
           "shj_confs": {"spark.sql.join.preferSortMergeJoin": "false",
                          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"}}
    for name in QUERIES:
        print(f"== {name} ==", flush=True)
        set_mode(False)
        w_smj = warm(name)
        set_mode(True)
        w_shj = warm(name)
        smj, shj = [], []
        for i in range(N_PAIRS):
            set_mode(False)
            spark.sparkContext.setJobDescription(f"ab-shj:{name}:smj:{i}")
            smj.append(run_once(name))
            set_mode(True)
            spark.sparkContext.setJobDescription(f"ab-shj:{name}:shj:{i}")
            shj.append(run_once(name))
        spark.sparkContext.setJobDescription(None)
        set_mode(False)
        so, sh = sorted(smj), sorted(shj)
        out[name] = {
            "smj": {"min": round(so[0], 3), "median": round(so[len(so) // 2], 3),
                    "runs": [round(x, 3) for x in smj], "warm": [round(x, 2) for x in w_smj]},
            "shj": {"min": round(sh[0], 3), "median": round(sh[len(sh) // 2], 3),
                    "runs": [round(x, 3) for x in shj], "warm": [round(x, 2) for x in w_shj]},
            "shj_over_smj_min": round(sh[0] / so[0], 3),
            "shj_over_smj_median": round(sh[len(sh) // 2] / so[len(so) // 2], 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AB_SHJ_r15.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
