#!/usr/bin/env python3
"""sf1 A/B for the top two deliberate-recompute sites (VERDICT r14 #8):
convert the written "recompute beats materialize" rationales into
numbers.

1. doc_span_dedup / operators/spans.duplicated_spans: the tokens-sized
   ``windows`` relation feeds two consumers (digest aggregate +
   join-back) and is deliberately RECOMPUTED. Shape B materializes it.
2. events_value_outliers_mad / operators/stats.mad_outlier_summary: the
   fact-sized ``dev`` deviation frame feeds the second percentile pass
   and the scoring pass. Shape B materializes it.

Protocol as tools/ab_trades_r15.py: one JVM, both shapes warmed to
plateau, N alternating timed pairs. Writes AB_RECOMPUTE_r15.json.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python tools/ab_recompute_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_PAIRS = int(os.environ.get("AB_PAIRS", "8"))
WARM_CAP = int(os.environ.get("AB_WARM_CAP", "10"))


def spans_current(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.spans import duplicated_spans

    docs = table(spark, sf_dir, "documents", spread=True)
    return duplicated_spans(docs, n=8).orderBy("doc_id", "span_start")


def spans_materialized(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.ckpt import materialize
    from bbt_etl_dw_spark.operators.spans import (
        _merge_windows_to_spans,
        window_digests,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    n = 8
    windows = docs.select(
        F.col("doc_id"),
        F.posexplode(window_digests("text", n)).alias("pos", "h"),
    )
    windows = materialize(windows)  # tokens-sized checkpoint (shape B)
    dup = (
        windows.groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("h")
    )
    dup_windows = windows.join(dup, "h", "left_semi").select("doc_id", "pos")
    return _merge_windows_to_spans(dup_windows, n).orderBy("doc_id", "span_start")


def mad_current(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.stats import mad_outlier_summary

    e = table(spark, sf_dir, "events")
    return mad_outlier_summary(e, ["event_type"], "value", k=3.0).orderBy(
        "event_type"
    )


def mad_materialized(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.ckpt import materialize
    from bbt_etl_dw_spark.operators.stats import exact_group_percentiles

    e = table(spark, sf_dir, "events")
    group_cols, value_col, k = ["event_type"], "value", 3.0
    v = F.col(value_col).cast("double")
    med = exact_group_percentiles(e, group_cols, value_col, {"median": 0.5})
    dev = e.join(F.broadcast(med), group_cols).withColumn(
        "_absdev", F.abs(v - F.col("median"))
    )
    dev = materialize(dev)  # fact-sized checkpoint (shape B)
    mad = exact_group_percentiles(dev, group_cols, "_absdev", {"mad": 0.5})
    scored = dev.join(F.broadcast(mad), group_cols)
    return (
        scored.groupBy(*group_cols)
        .agg(
            F.count(v).alias("n_rows"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("_absdev") > F.lit(float(k)) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")
    from bbt_etl_dw_spark.session import get_spark

    spark = get_spark(app_name="bbt-ab-recompute-r15")
    spark.sparkContext.setLogLevel("WARN")

    cases = {
        "doc_span_dedup": (spans_current, spans_materialized),
        "events_value_outliers_mad": (mad_current, mad_materialized),
    }

    def run_once(build) -> float:
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def warm(build) -> list[float]:
        walls = [run_once(build)]
        best = walls[0]
        for _ in range(2, WARM_CAP + 1):
            cur = run_once(build)
            walls.append(cur)
            best = min(best, cur)
            if abs(cur - walls[-2]) <= 0.05 * min(cur, walls[-2]) and cur <= 1.05 * best:
                break
        return walls

    out = {"sf_dir": sf_dir, "n_pairs": N_PAIRS}
    for name, (cur_b, mat_b) in cases.items():
        print(f"== {name} ==", flush=True)
        w_cur, w_mat = warm(cur_b), warm(mat_b)
        curs, mats = [], []
        for i in range(N_PAIRS):
            spark.sparkContext.setJobDescription(f"ab-rc:{name}:recompute:{i}")
            curs.append(run_once(cur_b))
            spark.sparkContext.setJobDescription(f"ab-rc:{name}:materialize:{i}")
            mats.append(run_once(mat_b))
        spark.sparkContext.setJobDescription(None)
        sc, sm = sorted(curs), sorted(mats)
        out[name] = {
            "recompute": {"min": round(sc[0], 3), "median": round(sc[len(sc) // 2], 3),
                          "runs": [round(x, 3) for x in curs], "warm": [round(x, 2) for x in w_cur]},
            "materialize": {"min": round(sm[0], 3), "median": round(sm[len(sm) // 2], 3),
                            "runs": [round(x, 3) for x in mats], "warm": [round(x, 2) for x in w_mat]},
            "materialize_over_recompute_min": round(sm[0] / sc[0], 3),
            "materialize_over_recompute_median": round(
                sm[len(sm) // 2] / sc[len(sc) // 2], 3
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AB_RECOMPUTE_r15.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
