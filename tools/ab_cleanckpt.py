"""Same-session A/B for spark.cleaner.referenceTracking.cleanCheckpoints.

VERDICT r09 "What's wrong #1": doc_dedup_clusters regressed outside its
noise band at BOTH scales (sf0.1 3.37s -> 4.39s vs band 0.02; sf1
5.11 -> 5.86 vs band 0.10) in a round that did not touch dedup.py; the
only change on its execution path is the static session conf
spark.cleaner.referenceTracking.cleanCheckpoints=true (session.py). The
r09 PROGRESS A/B claimed the opposite sign but was not run under the
bench protocol — this probe is.

Protocol (matches bench.py exactly): per (conf value, query, sf): ONE
discarded warmup run, then two passes of 3 timed noop-writes; report the
min of each pass and |pass1 - pass2| as the noise band. Each conf value
gets its own JVM (the conf is static), spawned as a subprocess of this
script so both run back-to-back on the same machine state.

Usage:
    python tools/ab_cleanckpt.py            # orchestrate both values
    python tools/ab_cleanckpt.py --worker true|false   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (query, sf_dir) pairs: the regressed query at both scales plus the
# sf1 watch item from VERDICT r09 (part_basket_neighbors: wall +1.64s vs
# band 1.22 while its shuffle dropped 35% — likely noise, re-measure).
CASES = [
    ("doc_dedup_clusters", "/root/testdata/sf0.1"),
    ("doc_dedup_clusters", "/root/repo/.scale/sf1"),
    ("part_basket_neighbors", "/root/repo/.scale/sf1"),
]
N_RUNS = 3


def _build_session(clean_checkpoints: str):
    """Replicate bbt_etl_dw_spark.session.get_spark's builder with ONLY
    spark.cleaner.referenceTracking.cleanCheckpoints parameterized. Kept
    in sync by eye with session.py (a probe, not product code)."""
    from pyspark.sql import SparkSession

    from bbt_etl_dw_spark.session import RUNTIME_CONF, _scratch_warehouse_dir, tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("ab-cleanckpt")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", _scratch_warehouse_dir())
        .config(
            "spark.cleaner.referenceTracking.cleanCheckpoints", clean_checkpoints
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())


def _worker(value: str) -> None:
    from bbt_etl_dw_spark.suite import load_all

    queries = load_all()
    spark = _build_session(value)
    spark.sparkContext.setLogLevel("WARN")
    got = spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints")
    out: dict[str, dict] = {"conf_value": got}

    for name, sf_dir in CASES:
        if not os.path.isdir(sf_dir):
            out[f"{name}@{sf_dir}"] = {"err": "sf dir missing"}
            continue
        builder = queries[name].builder

        def run_once() -> float:
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run_once()  # discarded warmup (codegen + page cache)
        p1 = min(run_once() for _ in range(N_RUNS))
        p2 = min(run_once() for _ in range(N_RUNS))
        out[f"{name}@{sf_dir}"] = {
            "min_pass1": round(p1, 4),
            "min_pass2": round(p2, 4),
            "noise_band": round(abs(p1 - p2), 4),
            "best": round(min(p1, p2), 4),
        }
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--worker":
        _worker(sys.argv[2])
        return
    results = {}
    for value in ("true", "false"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", value],
            cwd=REPO,
            text=True,
            capture_output=True,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[value] = json.loads(line)
        except Exception:
            results[value] = {
                "err": f"worker rc={proc.returncode}",
                "stderr": proc.stderr[-500:],
            }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
