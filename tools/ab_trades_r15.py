#!/usr/bin/env python3
"""Isolated, ramp-aware sf1 A/B for the three r14 at-scale trades
(VERDICT r14 next-round item #1): minhash_near_dup_pairs,
doc_lm_oov_rate, scd2_merge_rows.

The r14 round shipped these three restructures on sf0.1 + shuffle-audit
evidence arguing "local fixed cost buys scale"; this probe measures the
claim AT the scale tier. Protocol (addresses the r13/r14 ramp findings):
one JVM, per query: warm BOTH shapes to the adaptive plateau (cap 12 —
PROBE_PBN_SF1_r14 showed the 6-cap under-warms sf1 codegen ramps), then
N alternating timed pairs (old, new interleaved so ambient drift hits
both equally). Old shapes are the r13 (commit 7fd1342) operator bodies
reproduced verbatim as local functions; new shapes call the shipped
operators. Writes AB_TRADES_r15.json.

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python tools/ab_trades_r15.py [query ...]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

N_PAIRS = int(os.environ.get("AB_PAIRS", "10"))
WARM_CAP = int(os.environ.get("AB_WARM_CAP", "12"))


# ---------------------------------------------------------------- old shapes
# r13 operator bodies (git show 7fd1342), minimally adapted to import the
# current helper functions they composed.


def old_jaccard_verify(df, candidates, id_col, text_col, shingle_k=3, threshold=0.5):
    from bbt_etl_dw_spark.operators.dedup import _ckpt, shingles

    candidates = _ckpt(candidates, None)
    cand_ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    sh = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles(text_col, shingle_k).alias("sh"))
    )
    return (
        candidates.join(sh.withColumnsRenamed({"doc_id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"doc_id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def old_minhash_near_dup_pairs(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.dedup import minhash_candidates

    docs = table(spark, sf_dir, "documents", spread=True)
    cands = minhash_candidates(docs, "doc_id", "text", 64, 16, 3)
    return old_jaccard_verify(docs, cands, "doc_id", "text", 3, 0.5).orderBy(
        "id_a", "id_b"
    )


def old_oov_rate_vs_reference(docs, reference, id_col="doc_id", text_col="text", n=3):
    from bbt_etl_dw_spark.operators.ckpt import materialize
    from bbt_etl_dw_spark.operators.guards import assert_broadcastable
    from bbt_etl_dw_spark.operators.lm import _char_ngrams

    model = (
        reference.select(F.explode(_char_ngrams(text_col, n)).alias("ngram"))
        .select(F.xxhash64("ngram").alias("ngram_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    model = assert_broadcastable(
        materialize(model), "OOV reference n-gram set", "shrink the reference"
    )
    grams = docs.select(
        F.col(id_col), F.explode(_char_ngrams(text_col, n)).alias("ngram")
    ).select(F.col(id_col), F.xxhash64("ngram").alias("ngram_h"))
    scored = (
        grams.join(F.broadcast(model), "ngram_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            (F.col("n_oov").cast("double") / F.col("n_grams").cast("double")).alias(
                "oov_rate"
            ),
        )
    )


def old_doc_lm_oov_rate(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table

    docs = table(spark, sf_dir, "documents", spread=True)
    ref = docs.filter(F.col("source").isin("src1", "src2", "src3"))
    return old_oov_rate_vs_reference(docs, ref).orderBy("doc_id")


def old_scd2_merge(current, incoming, natural_key, tracked_cols, asof):
    from bbt_etl_dw_spark.operators.scd2 import END, IS_CURRENT, START

    key = list(natural_key)
    chash = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
            for c in tracked_cols
        ]
    )
    cur = current.withColumn("__h", chash)
    inc = incoming.withColumn("__h", chash)
    live = cur.filter(F.col(IS_CURRENT))
    closed = cur.filter(~F.col(IS_CURRENT)).drop("__h")

    inc_keyed = inc.select(
        *[F.col(c).alias(f"__k_{c}") for c in key], F.col("__h").alias("__h_inc")
    )
    cond = [live[c].eqNullSafe(inc_keyed[f"__k_{c}"]) for c in key]
    live_vs_inc = live.join(inc_keyed, cond, "left")
    unchanged = (
        live_vs_inc.filter(
            F.col("__h_inc").isNotNull() & (F.col("__h") == F.col("__h_inc"))
        )
        .select(live.columns)
        .drop("__h")
    )
    expired = (
        live_vs_inc.filter(
            F.col("__h_inc").isNull() | (F.col("__h") != F.col("__h_inc"))
        )
        .select(live.columns)
        .drop("__h")
        .withColumns({IS_CURRENT: F.lit(False), END: F.lit(asof)})
    )
    live_keyed = live.select(
        *[F.col(c).alias(f"__k_{c}") for c in key], F.col("__h").alias("__h_cur")
    )
    cond2 = [inc[c].eqNullSafe(live_keyed[f"__k_{c}"]) for c in key]
    inserts = (
        inc.join(live_keyed, cond2, "left")
        .filter(F.col("__h_cur").isNull() | (F.col("__h") != F.col("__h_cur")))
        .select(incoming.columns)
        .withColumns(
            {
                IS_CURRENT: F.lit(True),
                START: F.lit(asof),
                END: F.lit(None).cast("date"),
            }
        )
    )
    out_cols = closed.columns
    return (
        closed.select(out_cols)
        .unionByName(unchanged.select(out_cols))
        .unionByName(expired.select(out_cols))
        .unionByName(inserts.select(out_cols))
    )


def old_scd2_merge_rows(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.scd2 import scd2_init

    c = table(spark, sf_dir, "customer")
    current = scd2_init(c, datetime.date(2024, 1, 1))
    incoming = c.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("PROMO")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    merged = old_scd2_merge(
        current,
        incoming,
        natural_key=["c_custkey"],
        tracked_cols=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        asof=datetime.date(2024, 6, 1),
    )
    return merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        "is_current",
        "effective_start_date",
        "effective_end_date",
    ).orderBy("c_custkey", "effective_start_date")


# ---------------------------------------------------------------- harness


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")
    from bbt_etl_dw_spark.session import get_spark
    from bbt_etl_dw_spark.suite import load_all

    queries = load_all()
    spark = get_spark(app_name="bbt-ab-trades-r15")
    spark.sparkContext.setLogLevel("WARN")

    cases = {
        "minhash_near_dup_pairs": (
            old_minhash_near_dup_pairs,
            queries["minhash_near_dup_pairs"].builder,
        ),
        "doc_lm_oov_rate": (old_doc_lm_oov_rate, queries["doc_lm_oov_rate"].builder),
        "scd2_merge_rows": (old_scd2_merge_rows, queries["scd2_merge_rows"].builder),
    }
    wanted = sys.argv[1:] or list(cases)

    def run_once(build) -> float:
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def warm(build, label: str) -> list[float]:
        walls = [run_once(build)]
        best = walls[0]
        for _ in range(2, WARM_CAP + 1):
            cur = run_once(build)
            walls.append(cur)
            best = min(best, cur)
            if abs(cur - walls[-2]) <= 0.05 * min(cur, walls[-2]) and cur <= 1.05 * best:
                break
        print(f"  warm {label}: {[round(w, 2) for w in walls]}", flush=True)
        return walls

    out = {
        "sf_dir": sf_dir,
        "n_pairs": N_PAIRS,
        "warm_cap": WARM_CAP,
        "protocol": "one JVM; both shapes warmed to adaptive plateau; "
        "N alternating (old,new) timed pairs",
    }
    for name in wanted:
        old_b, new_b = cases[name]
        print(f"== {name} ==", flush=True)
        spark.sparkContext.setJobDescription(f"ab:{name}:warm")
        w_old = warm(old_b, "old")
        w_new = warm(new_b, "new")
        olds, news = [], []
        for i in range(N_PAIRS):
            spark.sparkContext.setJobDescription(f"ab:{name}:old:{i}")
            olds.append(run_once(old_b))
            spark.sparkContext.setJobDescription(f"ab:{name}:new:{i}")
            news.append(run_once(new_b))
        srt_o, srt_n = sorted(olds), sorted(news)
        out[name] = {
            "old": {
                "min": round(srt_o[0], 3),
                "median": round(srt_o[len(srt_o) // 2], 3),
                "runs": [round(x, 3) for x in olds],
                "warm_ramp": [round(x, 2) for x in w_old],
            },
            "new": {
                "min": round(srt_n[0], 3),
                "median": round(srt_n[len(srt_n) // 2], 3),
                "runs": [round(x, 3) for x in news],
                "warm_ramp": [round(x, 2) for x in w_new],
            },
            "new_over_old_min": round(srt_n[0] / srt_o[0], 3),
            "new_over_old_median": round(
                srt_n[len(srt_n) // 2] / srt_o[len(srt_o) // 2], 3
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AB_TRADES_r15.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
