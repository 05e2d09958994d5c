"""Training-data pipeline suite: driver evidence for the pytest-only
operators (VERDICT r10 "What's missing" #2).

chunk_documents (retrieval/embedding chunking), token_mix_rates /
apply_token_mix (corpus mixing), weighted_sample (PPS sampling),
merge_intervals / interval_coverage (gaps-and-islands), and the
partial-summary latest-state view (operators/summary.py) were
pytest-proven but had no registry entry. All are md5/hash-deterministic
or pure window arithmetic, so each gets a full DuckDB value oracle.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import sql_dsum
from bbt_etl_dw_spark.suite import register

# --------------------------------------------------------------------------
# chunk_documents: overlapping token windows with provenance
# --------------------------------------------------------------------------

_CHUNK_ORACLE = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
  WHERE text IS NOT NULL AND len(trim(text)) > 0
),
c AS (
  SELECT doc_id, ws, len(ws) AS n,
         greatest(1, CAST(ceil((len(ws) - 128) / 96.0) AS INT) + 1) AS n_chunks
  FROM w
)
SELECT doc_id,
       CAST(t.i AS INT) AS chunk_idx,
       CAST(t.i * 96 AS BIGINT) AS start_token,
       CAST(least(128, n - t.i * 96) AS INT) AS n_tokens,
       md5(array_to_string(ws[t.i*96+1 : t.i*96+128], ' ')) AS chunk_fp
FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS t(i)
ORDER BY doc_id, chunk_idx
"""


@register("doc_chunked_windows", oracle=_CHUNK_ORACLE)
def doc_chunked_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking with provenance
    (operators/textstats.chunk_documents, 128-token windows / 32
    overlap): chunk boundaries, per-chunk token counts, and an md5 of
    each CASE-PRESERVING chunk text — the oracle replays the stride
    arithmetic and slices in DuckDB, so an off-by-one boundary, a
    dropped tail chunk, or a lower-cased chunk is a hash mismatch.
    Scale: one Generate per document, narrow map, no shuffle."""
    from bbt_etl_dw_spark.operators.textstats import chunk_documents

    docs = table(spark, sf_dir, "documents", spread=True)
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=128, overlap=32)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_token",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# token_mix_rates: per-source keep-rates toward a target token mixture
# --------------------------------------------------------------------------

_MIX_SHARES = {"src1": 0.4, "src2": 0.3, "src3": 0.2, "src4": 0.1}

_MIX_ORACLE = r"""
WITH counts AS (
  SELECT source,
         CAST(SUM(CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(lower(text)), '\s+'))
                  END) AS BIGINT) AS available_tokens
  FROM documents GROUP BY source
),
withs AS (
  SELECT source, available_tokens,
         CAST(CASE source WHEN 'src1' THEN 0.4 WHEN 'src2' THEN 0.3
                          WHEN 'src3' THEN 0.2 WHEN 'src4' THEN 0.1
              END AS DOUBLE) AS share
  FROM counts WHERE source IN ('src1', 'src2', 'src3', 'src4')
),
t AS (SELECT MIN(available_tokens / share) AS t FROM withs)
SELECT w.source, w.available_tokens, w.share,
       least(CAST(1.0 AS DOUBLE), (w.share * t.t) / w.available_tokens) AS keep_rate
FROM withs w CROSS JOIN t
ORDER BY w.source
"""


@register("corpus_token_mix", oracle=_MIX_ORACLE)
def corpus_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing keep-rates (operators/textstats.token_mix_rates): the
    achievable corpus is limited by the scarcest source relative to its
    target share; the scarcest source keeps everything,
    over-represented sources downsample. The oracle replays the token
    counting and the min/ratio arithmetic in IEEE double. Scale: one
    corpus aggregation; the rates frame is dim-sized."""
    from bbt_etl_dw_spark.operators.textstats import token_mix_rates

    docs = table(spark, sf_dir, "documents", spread=True)
    return token_mix_rates(docs, _MIX_SHARES).orderBy("source")


# --------------------------------------------------------------------------
# weighted_sample: deterministic probability-proportional-to-weight
# --------------------------------------------------------------------------

_WSAMPLE_ORACLE = r"""
SELECT doc_id,
       least(CAST(1.0 AS DOUBLE),
             CAST(n_chars AS DOUBLE) / CAST(1200.0 AS DOUBLE)) AS weight
FROM documents
WHERE CAST(('0x' || substring(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
      / 281474976710656.0
      < CAST(0.8 AS DOUBLE)
        * least(CAST(1.0 AS DOUBLE),
                CAST(n_chars AS DOUBLE) / CAST(1200.0 AS DOUBLE))
ORDER BY doc_id
"""


@register("doc_weighted_sample", oracle=_WSAMPLE_ORACLE)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS sampling with a quality-style weight
    (operators/textstats.weighted_sample): keep iff
    md5-uniform(doc_id) < rate * weight — repartition/rerun/append-stable
    where rand() is not, and the oracle re-derives every keep decision
    from the same md5 fraction. One narrow filter, no shuffle."""
    from bbt_etl_dw_spark.operators.textstats import weighted_sample

    docs = table(spark, sf_dir, "documents")
    weight = F.least(F.lit(1.0), F.col("n_chars") / F.lit(1200.0))
    kept = weighted_sample(
        docs.withColumn("weight", weight), F.col("weight"), "doc_id", rate=0.8
    )
    return kept.select("doc_id", "weight").orderBy("doc_id")


# --------------------------------------------------------------------------
# merge_intervals / interval_coverage: gaps-and-islands over event spans
# --------------------------------------------------------------------------

_COVERAGE_ORACLE = r"""
WITH iv AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           + CAST(FLOOR(value * 1000) AS BIGINT) AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS frontier
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN frontier IS NULL OR s > frontier THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
),
merged AS (
  SELECT user_id, island, MIN(s) AS island_start, MAX(e) AS island_end
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(island_end - island_start) AS BIGINT) AS covered,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM merged GROUP BY user_id ORDER BY user_id
"""


@register("events_interval_coverage", oracle=_COVERAGE_ORACLE)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union-of-intervals coverage (operators/intervals) over
    event spans [epoch(ts), epoch(ts) + floor(value*1000)]: islands via
    the running-max frontier (nested-interval-safe — lag(end) would
    split islands under nesting), coverage as the sum of island lengths,
    never the naive double-counting SUM. The oracle replays the same
    frontier windows in DuckDB. Scale: ONE shuffle (the per-key window
    sort); no self-join, no explode."""
    from bbt_etl_dw_spark.operators.intervals import interval_coverage

    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + F.floor(F.col("value") * 1000).cast("long"))
        .alias("e"),
    )
    return interval_coverage(iv, ["user_id"], "s", "e").orderBy("user_id")


# --------------------------------------------------------------------------
# partial-summary latest-state view: epoch-staged, replayed, folded
# --------------------------------------------------------------------------

_SUMMARY_CACHE: dict[str, str] = {}

_STATE_KEYS = ["user_id"]
_STATE_SPECS = {
    "n_events": ("count", None),
    "total_value": ("sum", "value"),
    "last_ts": ("max", "ts"),
    "last_type": ("argmax", ("ts", "event_type")),
}


def _summary_log_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per process+sf_dir) the per-user summary log from
    three serial epochs split by ``event_id % 3``, with epoch 1 REPLAYED
    — the dynamic-overwrite epoch partition must absorb the retry
    (count/sum are not duplicate-tolerant), same exactly-once mechanism
    as the epoch sink."""
    from bbt_etl_dw_spark.operators.summary import append_summary_batch

    if sf_dir in _SUMMARY_CACHE:
        return _SUMMARY_CACHE[sf_dir]
    path = tempfile.mkdtemp(prefix="bbt_summary_log_")
    ev = table(spark, sf_dir, "events")
    for epoch in (0, 1, 1, 2):  # 1 twice: replayed batch
        batch = ev.filter(F.col("event_id") % 3 == epoch)
        append_summary_batch(batch, path, _STATE_KEYS, _STATE_SPECS, epoch_id=epoch)
    _SUMMARY_CACHE[sf_dir] = path
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


_STATE_ORACLE = f"""
WITH agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {sql_dsum('value', 'total_value')},
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
)
SELECT a.user_id, a.n_events, a.total_value, a.last_ts,
       (SELECT MAX(e.event_type) FROM events e
        WHERE e.user_id = a.user_id AND e.ts = a.last_ts) AS last_type
FROM agg a ORDER BY a.user_id
"""


@register("events_latest_state", oracle=_STATE_ORACLE)
def events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental latest-state view (operators/summary): each epoch
    reduces to one partial row per touched user (decimal sums, packed
    argmax structs), the replayed epoch is absorbed exactly-once, and
    the fold over partials must equal the oracle's direct aggregate over
    raw events — count, exact-decimal value sum, max timestamp, and the
    argmax payload (latest event_type, ties broken by max payload, the
    struct-max rule). This is the O(touched keys) alternative to
    recomputing a 100 TB fact rollup per batch."""
    from bbt_etl_dw_spark.operators.summary import read_summary

    path = _summary_log_path(spark, sf_dir)
    out = read_summary(spark, path, _STATE_KEYS, _STATE_SPECS)
    return out.select(
        "user_id", "n_events", "total_value", "last_ts", "last_type"
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# winsorize: percentile-capped outliers, exact at full sketch accuracy
# --------------------------------------------------------------------------

# The bounds contract is ANSI percentile_disc — smallest element with
# cume_dist >= q, i.e. rank ceil(q*n) — which is exactly DuckDB's
# quantile_disc, so the clip is pure least/greatest arithmetic on an
# identical bound element at ANY row count. (percentile_approx at
# accuracy >= n is NOT that: partition-summary merges leave +-1 rank
# slack — green at sf0.001/0.01 by luck, red at sf0.1; see winsorize.)
_WINSOR_ORACLE = f"""
WITH b AS (
  SELECT quantile_disc(l_extendedprice, 0.01) AS plo,
         quantile_disc(l_extendedprice, 0.99) AS phi,
         quantile_disc(l_discount, 0.01) AS dlo,
         quantile_disc(l_discount, 0.99) AS dhi
  FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum('least(greatest(l_extendedprice, b.plo), b.phi)', 'price_sum')},
       {sql_dsum('least(greatest(l_discount, b.dlo), b.dhi)', 'disc_sum')},
       MAX(least(greatest(l_extendedprice, b.plo), b.phi)) AS price_max,
       MIN(least(greatest(l_extendedprice, b.plo), b.phi)) AS price_min
FROM lineitem CROSS JOIN b
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("lineitem_winsorized_stats", oracle=_WINSOR_ORACLE)
def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregates (operators/clean.winsorize): price and
    discount capped at their 1st/99th percentiles in ONE mergeable-sketch
    pass (no sort, no per-column rescan), then rolled up by return flag —
    the capped extrema and exact-decimal sums must equal the oracle's
    quantile_disc clip. Rows are never dropped, so counts and join keys
    survive (unlike filter-based outlier removal). Scale: two narrow
    passes at any size; the bounds row is a driver-side constant.

    EXACT MODE (r13, supersedes the r11/r12 accuracy override): the
    r13 full-registry sweep at sf0.1 proved percentile_approx with
    accuracy >= row count is still NOT rank-exact — merging partition
    summaries leaves +-1 rank slack (n=600000: rank 5999 chosen where
    ceil(q*n)=6000), so the sketch can never pin a quantile_disc
    oracle across scale tiers. winsorize(exact=True) computes bounds
    with ANSI percentile_disc instead — the same ceil(q*n) element as
    the oracle at any n, memory O(distinct values) per column rather
    than the override's O(row count) sketch (which also closes the
    ADVICE r12 unbounded-retention concern and drops the extra count()
    job). The approx sketch remains winsorize's default 100 TB path
    for callers without an exact-bound contract."""
    from bbt_etl_dw_spark.functions.numeric import dsum
    from bbt_etl_dw_spark.operators.clean import winsorize

    li = table(spark, sf_dir, "lineitem")
    capped = winsorize(
        li,
        ["l_extendedprice", "l_discount"],
        0.01,
        0.99,
        exact=True,
    )
    return (
        capped.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice", "price_sum"),
            dsum("l_discount", "disc_sum"),
            F.max("l_extendedprice").alias("price_max"),
            F.min("l_extendedprice").alias("price_min"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# hashed_tf_vector: vocabulary-free feature hashing, sparse projection
# --------------------------------------------------------------------------

_HASHED_TF_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
  WHERE text IS NOT NULL AND len(trim(text)) > 0
),
h AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(word), 1, 8)) AS BIGINT) % 256 AS INT)
           AS bucket,
         CASE WHEN CAST(('0x' || substring(md5(word), 9, 1)) AS BIGINT) % 2 = 0
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
  FROM h_src
)
SELECT doc_id, bucket, SUM(s) AS weight
FROM h GROUP BY doc_id, bucket
HAVING SUM(s) <> 0
ORDER BY doc_id, bucket
"""
_HASHED_TF_ORACLE = _HASHED_TF_ORACLE.replace("FROM h_src", "FROM w")


@register("doc_hashed_tf_sparse", oracle=_HASHED_TF_ORACLE)
def doc_hashed_tf_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed TF vectors (operators/textstats.hashed_tf_vector,
    Weinberger signed hashing into 256 md5 buckets) projected to sparse
    (doc_id, bucket, weight) rows — the oracle re-derives every bucket,
    sign, and signed count from the same md5 digests, so a hashing or
    densify bug anywhere in the expression tree is a value mismatch.
    The engine keeps the vector entirely expression-level (no UDF, no
    vocabulary state); blank docs produce all-zero vectors and vanish
    from the sparse view on both sides."""
    from bbt_etl_dw_spark.operators.textstats import hashed_tf_vector

    docs = table(spark, sf_dir, "documents", spread=True)
    vec = docs.select("doc_id", hashed_tf_vector("text", dim=256).alias("v"))
    sparse = vec.select(
        "doc_id", F.posexplode("v").alias("bucket", "weight")
    ).filter(F.col("weight") != 0.0)
    return sparse.orderBy("doc_id", "bucket")
