"""Source/sink suite: driver-facing evidence for the ingestion layer.

VERDICT r10 "What's missing" #1: the dirty-CSV parser (sources/csv.py,
reference etl_extract.py:48 semantics), the JDBC warehouse round trip
(sources/jdbc.py, reference etl_load.py:38-61), the schema-evolution
union reader (sources/evolve.py), and the streaming dedup-ingest loop
(streaming/ops.py) were pytest-proven but had zero hash-green driver
rows. These queries close that gap with the suite/lake.py staging
pattern: setup runs once per (process, sf_dir) into a mkdtemp root
(atexit cleanup), the registered builders then only READ the staged
state, so repeated driver calls see identical data.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.functions.numeric import dsum, sql_dsum
from bbt_etl_dw_spark.suite import register


def _scratch_dir(prefix: str) -> str:
    """mkdtemp with the rmtree cleanup registered IMMEDIATELY, before any
    staging work runs (ADVICE r12: registering atexit only after staging
    fully succeeds leaks the dir — and for the Derby star, an open
    embedded-database instance — for the process lifetime whenever one
    of the staging steps fails mid-way). Callers still cache the path
    only on success, so a failed stage is retried from scratch."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

# --------------------------------------------------------------------------
# S1: dirty CSV — duplicate headers, ragged rows, quoted commas/quotes
# --------------------------------------------------------------------------

#: The reference's raw sales.csv pathologies in miniature (SURVEY §1.2:
#: ``OrderID`` at two positions -> position-suffixed names; one ragged
#: long row; quoted commas; PERMISSIVE null-padding of short rows).
#: Static content so the oracle can pin the expected parse EXACTLY.
_DIRTY_CSV = """OrderID,CustomerName,Status,TotalAmount,OrderID,Comment
1,Alice,shipped,100.50,1,plain
2,"Brown, Bob",pending,20.00,2,"note, with comma"
3,Cara,shipped,30.25,3,extra1,extra2,extra3
4,Dan,returned,40.00
5,"Ed ""Eddie"" E",shipped,55.5,5,ok
6,,pending,,6,
"""

_DIRTY_CSV_CACHE: dict[str, str] = {}


def _dirty_csv_path(sf_dir: str) -> str:
    # The dirty-CSV fixture is STATIC (sf-independent), so it stages once
    # per process under a sentinel key — keying on sf_dir made multi-sf
    # runs stage duplicate temp dirs for identical bytes (ADVICE r11).
    # The sf-DEPENDENT caches below keep their per-(process, sf_dir) key.
    key = "__static__"
    if key not in _DIRTY_CSV_CACHE:
        d = tempfile.mkdtemp(prefix="bbt_dirty_csv_")
        path = os.path.join(d, "sales.csv")
        with open(path, "w") as f:
            f.write(_DIRTY_CSV)
        _DIRTY_CSV_CACHE[key] = path
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _DIRTY_CSV_CACHE[key]


# Every expected cell, pinned: dup headers dedup to OrderID0/OrderID4
# (Spark's own rule, sources/csv.dedup_headers), quoted commas and ""
# escapes parse, the 8-field row keeps its first 6 fields, the 4-field
# row null-pads, empty unquoted fields read as NULL.
_DIRTY_PARSE_ORACLE = """
SELECT * FROM (VALUES
  ('1', 'Alice',        'shipped',  '100.50', '1',  'plain'),
  ('2', 'Brown, Bob',   'pending',  '20.00',  '2',  'note, with comma'),
  ('3', 'Cara',         'shipped',  '30.25',  '3',  'extra1'),
  ('4', 'Dan',          'returned', '40.00',  NULL, NULL),
  ('5', 'Ed "Eddie" E', 'shipped',  '55.5',   '5',  'ok'),
  ('6', NULL,           'pending',  NULL,     '6',  NULL)
) AS t(OrderID0, CustomerName, Status, TotalAmount, OrderID4, Comment)
ORDER BY OrderID0
"""


@register("csv_dirty_parse", oracle=_DIRTY_PARSE_ORACLE)
def csv_dirty_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dirty-CSV extract semantics end to end
    (sources/csv.py:44 vs reference etl_extract.py:48): duplicate
    ``OrderID`` headers surface as position-suffixed columns, one ragged
    8-field row truncates, one short row null-pads (PERMISSIVE), quoted
    commas and doubled-quote escapes parse — every resulting cell pinned
    by a VALUES oracle. One scan, no schema-inference double read."""
    from bbt_etl_dw_spark.sources.csv import read_csv

    df = read_csv(spark, _dirty_csv_path(sf_dir))
    return df.orderBy("OrderID0")


# --------------------------------------------------------------------------
# S1 at table scale: typed one-scan CSV round trip of the orders table
# --------------------------------------------------------------------------

_TYPED_CSV_CACHE: dict[str, str] = {}


def _orders_csv_path(spark: SparkSession, sf_dir: str) -> str:
    """Write the orders table to CSV ONCE per (process, sf_dir) — the
    staged file set is what the typed reader is graded on."""
    if sf_dir not in _TYPED_CSV_CACHE:
        d = tempfile.mkdtemp(prefix="bbt_orders_csv_")
        path = os.path.join(d, "orders")
        (
            table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .csv(path)
        )
        _TYPED_CSV_CACHE[sf_dir] = path
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _TYPED_CSV_CACHE[sf_dir]


_TYPED_ROUNDTRIP_ORACLE = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       MAX(o_orderdate) AS max_date,
       {sql_dsum('o_totalprice', 'revenue')}
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("csv_typed_roundtrip", oracle=_TYPED_ROUNDTRIP_ORACLE)
def csv_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed one-scan CSV read at table scale: orders written to CSV
    (quoted commas in o_comment survive), read back through
    sources/csv.read_csv with an EXPLICIT schema (no inference double
    scan — SURVEY §4's reference inefficiency), then aggregated. The
    oracle aggregates the original parquet, so any value damage through
    the text round trip (double shortest-repr, date formatting, quote
    escaping) is a hash mismatch."""
    from bbt_etl_dw_spark.sources.csv import read_csv

    orders = table(spark, sf_dir, "orders")
    back = read_csv(spark, _orders_csv_path(spark, sf_dir), schema=orders.schema)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderkey").alias("max_key"),
            F.max("o_orderdate").alias("max_date"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# S4: JDBC warehouse round trip (embedded Derby — same DataFrameWriter
# path as the reference's SQL Server, different dialect)
# --------------------------------------------------------------------------

_JDBC_CACHE: dict[str, str] = {}


def _jdbc_url(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per process+sf_dir) an embedded Derby warehouse and
    load the nation-region dim the reference way: overwrite, then APPEND
    the remaining slice (etl_load.py appends gold tables)."""
    from bbt_etl_dw_spark.sources.jdbc import DERBY_DRIVER, jdbc_options, write_jdbc

    if sf_dir in _JDBC_CACHE:
        return _JDBC_CACHE[sf_dir]
    d = tempfile.mkdtemp(prefix="bbt_jdbc_")
    url = f"jdbc:derby:{d}/dw;create=true"
    dim = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "r_name")
    )
    opts = jdbc_options(url, "DimNation", driver=DERBY_DRIVER, batchsize=1000)
    write_jdbc(dim.filter(F.col("n_nationkey") % 2 == 0), mode="overwrite", **opts)
    write_jdbc(dim.filter(F.col("n_nationkey") % 2 == 1), mode="append", **opts)
    _JDBC_CACHE[sf_dir] = url
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return url


_JDBC_ORACLE = """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY n.n_nationkey
"""


@register("jdbc_star_roundtrip", oracle=_JDBC_ORACLE)
def jdbc_star_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end to end with driver evidence (reference etl_load.py:38-61):
    the nation-region dim lands in an embedded Derby warehouse in two
    writes (overwrite + append, the reference's accumulation mode), then
    reads back through a PARTITIONED parallel JDBC scan; the oracle
    recomputes the dim from the raw parquet. Same
    DataFrameWriter/DataFrameReader code path a SQL Server URL takes —
    only the dialect differs."""
    from bbt_etl_dw_spark.sources.jdbc import DERBY_DRIVER, jdbc_options, read_jdbc

    url = _jdbc_url(spark, sf_dir)
    opts = jdbc_options(url, "DimNation", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark,
        **opts,
        partitionColumn="n_nationkey",
        lowerBound="0",
        upperBound="25",
        numPartitions="4",
    )
    return back.orderBy("n_nationkey")


# --------------------------------------------------------------------------
# Schema-evolution union: two staged parquet generations, widened + unioned
# --------------------------------------------------------------------------

_EVOLVE_CACHE: dict[str, str] = {}


def _generations_root(spark: SparkSession, sf_dir: str) -> str:
    """Stage two order generations with real drift: gen1 (even keys) is
    the early dump — ``o_orderkey`` int, ``o_totalprice`` float, no
    priority column; gen2 (odd keys) widens both and ADDS
    ``o_orderpriority``."""
    if sf_dir in _EVOLVE_CACHE:
        return _EVOLVE_CACHE[sf_dir]
    root = tempfile.mkdtemp(prefix="bbt_evolve_")
    o = table(spark, sf_dir, "orders")
    gen1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        F.col("o_totalprice").cast("float").alias("o_totalprice"),
    )
    gen1.write.mode("overwrite").parquet(f"{root}/gen1")
    gen2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice").alias("o_totalprice"),
        F.col("o_orderpriority"),
    )
    gen2.write.mode("overwrite").parquet(f"{root}/gen2")
    _EVOLVE_CACHE[sf_dir] = root
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


# The oracle REPLAYS the widening: gen1's float round trip
# (double->REAL->DOUBLE) and its typed-NULL priority, gen2 as-is —
# exactly what read_evolved's by-name union with casts produces.
_EVOLVE_ORACLE = f"""
WITH unioned AS (
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT),
           CAST(o_totalprice AS DOUBLE),
           o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
)
SELECT COALESCE(o_orderpriority, 'gen1-legacy') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       {sql_dsum('o_totalprice', 'revenue')}
FROM unioned
GROUP BY 1 ORDER BY 1
"""


@register("schema_evolution_union", oracle=_EVOLVE_ORACLE)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drifted parquet generations read as ONE frame
    (sources/evolve.read_evolved): int->long and float->double widen by
    the lossless ladder, the late-added priority column back-fills as
    typed NULL, and the union is by NAME. The oracle replays the exact
    widening (including gen1's float round trip) over the raw table.
    Scale: footer-only schema discovery, zero-shuffle narrow union —
    filters/projections push into every member scan."""
    from bbt_etl_dw_spark.sources.evolve import read_evolved

    root = _generations_root(spark, sf_dir)
    df = read_evolved(spark, [f"{root}/gen1", f"{root}/gen2"])
    return (
        df.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("gen1-legacy")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderkey").alias("max_key"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Streaming dedup-ingest loop: three epochs, one replayed, exactly once
# --------------------------------------------------------------------------

_INGEST_CACHE: dict[str, str] = {}


def _dedup_ingest_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Run the MinHash dedup-ingest loop (streaming/ops.dedup_ingest_batch
    — the exact function streaming_dedup_ingest's foreachBatch calls) over
    three serial epochs split by ``doc_id % 3``, with epoch 1 REPLAYED
    (the stream-restart case: idempotent dynamic-partition overwrite must
    dedupe the retry, and the index probe must exclude the epoch's own
    earlier attempt so the batch never self-collides)."""
    from bbt_etl_dw_spark.streaming.ops import dedup_ingest_batch

    if sf_dir in _INGEST_CACHE:
        return _INGEST_CACHE[sf_dir]
    root = tempfile.mkdtemp(prefix="bbt_dedup_ingest_")
    corpus, index = f"{root}/corpus", f"{root}/index"
    docs = table(spark, sf_dir, "documents", spread=True)
    for epoch in (0, 1, 1, 2):  # 1 twice: replayed batch
        batch = docs.filter(F.col("doc_id") % 3 == epoch)
        dedup_ingest_batch(
            batch, epoch, corpus, index, "doc_id", "text", idempotent=True
        )
    _INGEST_CACHE[sf_dir] = root
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


# Serial replay of the ingest loop's survival rule. Signature machinery
# (shingles, md5-KM minhash, 16x4 bands, bucket cap, hashed-shingle-set
# jaccard >= 0.5) is byte-identical to suite/text's incremental near-dup
# oracle; on top of the verified pair set, survival is the ONE-HOP victim
# rule of operators/dedup.incremental_minhash_dedup: a batch doc is
# dropped iff it pairs with any PRIOR-EPOCH SURVIVOR (the index holds
# survivors only) or with a smaller-id doc of its own batch (dropped or
# not — chains resolve over successive appends).
_INGEST_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
sh_list AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3
              THEN list_distinct([array_to_string(ws[i:i+2], ' ')
                                  FOR i IN generate_series(1, len(ws)-2)])
              ELSE [norm] END AS shs
  FROM w
),
sh AS (SELECT doc_id, UNNEST(shs) AS s FROM sh_list),
hv AS (
  SELECT doc_id, t.i,
         (CAST(('0x'||substring(md5(s),1,12)) AS BIGINT)
          + t.i * CAST(('0x'||substring(md5(s),13,12)) AS BIGINT)) % 2147483647 AS h
  FROM sh CROSS JOIN range(0, 64) AS t(i)
),
sig AS (SELECT doc_id, i, MIN(h) AS mh FROM hv GROUP BY doc_id, i),
band AS (
  SELECT doc_id, i // 4 AS band,
         substring(md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 16) AS bucket
  FROM sig GROUP BY doc_id, i // 4
),
capped AS (
  SELECT doc_id, band, bucket FROM band
  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 2000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a
  JOIN capped b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
hs AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(shs,
                s -> CAST(('0x'||substring(md5(s),1,12)) AS BIGINT)))) AS h
  FROM sh_list
),
hn AS (SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY doc_id),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM (
    SELECT c.id_a, c.id_b, COUNT(*) AS ni
    FROM cand c
    JOIN hs ha ON ha.doc_id = c.id_a
    JOIN hs hb ON hb.doc_id = c.id_b AND hb.h = ha.h
    GROUP BY c.id_a, c.id_b
  ) i
  JOIN hn na ON na.doc_id = i.id_a
  JOIN hn nb ON nb.doc_id = i.id_b
  WHERE i.ni / (na.n + nb.n - i.ni) >= 0.5
),
nbrs AS (
  SELECT id_a AS x, id_b AS y FROM pairs
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM pairs
),
e0 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
e1 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
e2 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
s0 AS (
  SELECT d.doc_id FROM e0 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN e0 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id AND n.y < d.doc_id)
),
s1 AS (
  SELECT d.doc_id FROM e1 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN s0 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN e1 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id AND n.y < d.doc_id)
),
s2 AS (
  SELECT d.doc_id FROM e2 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN s0 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN s1 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN e2 p ON p.doc_id = n.y
                    WHERE n.x = d.doc_id AND n.y < d.doc_id)
),
surv AS (
  SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1
  UNION ALL SELECT doc_id FROM s2
)
SELECT s.doc_id,
       md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS fp
FROM surv s JOIN documents d USING (doc_id)
ORDER BY s.doc_id
"""


@register("doc_dedup_ingest_corpus", oracle=_INGEST_ORACLE)
def doc_dedup_ingest_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming MinHash dedup-ingest loop end to end with driver
    evidence (streaming/ops.dedup_ingest_batch — the body of
    streaming_dedup_ingest's foreachBatch): documents arrive in three
    serial epochs, epoch 1 is replayed (exactly-once: its partition is
    dynamically overwritten, and the probe excludes the epoch's own
    earlier attempt), each batch probes the persisted band-key index —
    corpus text is NEVER re-read. The oracle replays the signature
    machinery and the serial one-hop survival rule; a duplicated replay,
    a self-colliding retry, or a wrong index probe all change the
    surviving set. Scale: O(batch + collisions) per append, the standing
    state is the compact index only."""
    from bbt_etl_dw_spark.operators.textstats import md5_fingerprint
    from bbt_etl_dw_spark.streaming.ops import read_epoch_sink

    root = _dedup_ingest_corpus(spark, sf_dir)
    corpus = read_epoch_sink(spark, f"{root}/corpus")
    return corpus.select(
        "doc_id", md5_fingerprint("text").alias("fp")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# S5: audit report sink round trip (JSON report written, read back, values
# re-derived from the raw table)
# --------------------------------------------------------------------------

_AUDIT_CACHE: dict[str, list] = {}


def _audit_report_rows(spark: SparkSession, sf_dir: str) -> list:
    """Audit a deterministically-dirtied orders projection (planted NULL
    priorities-as-clerk at key%97, negated totals at key%101, a duplicated key%500=7
    slice), write the report JSON through sources/report.py, read it
    back, and flatten the metrics. Cached per (process, sf_dir)."""
    from bbt_etl_dw_spark.operators.audit import audit, rule_positive_number
    from bbt_etl_dw_spark.sources.report import read_audit_json, write_audit_json

    if sf_dir in _AUDIT_CACHE:
        return _AUDIT_CACHE[sf_dir]
    o = table(spark, sf_dir, "orders")
    dirty_one = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("clerk"),
        F.when(F.col("o_orderkey") % 101 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("total"),
    )
    dirty = dirty_one.unionAll(dirty_one.filter(F.col("o_orderkey") % 500 == 7))
    report = audit(
        dirty, "orders_dirty", rules=[rule_positive_number("total")],
        collect_ids=False,
    )
    d = tempfile.mkdtemp(prefix="bbt_audit_report_")
    path = os.path.join(d, "audit.json")
    write_audit_json([report], path)
    back = read_audit_json(path)[0]
    rows = [
        ("duplicate_rows", int(back["duplicate_rows"])),
        ("missing_clerk", int(back["missing_values"].get("clerk", 0))),
        ("row_count", int(back["row_count"])),
        ("violations_total", int(back["inconsistencies"]["total"]["count"])),
    ]
    _AUDIT_CACHE[sf_dir] = rows
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return rows


# The oracle rebuilds the dirty relation and re-derives every report
# metric: total rows (base + duplicated slice), exact-duplicate rows
# (the slice — keys are otherwise unique), per-column missing counts
# (planted NULL clerks, counted PER ROW so slice overlap doubles), and
# the positive-number rule violations (planted negations; o_totalprice
# is strictly positive in the raw table).
_AUDIT_ORACLE = """
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderpriority END AS clerk,
         CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS total
  FROM orders
  UNION ALL
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderpriority END AS clerk,
         CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS total
  FROM orders WHERE o_orderkey % 500 = 7
)
SELECT metric, value FROM (
  SELECT 'row_count' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM dirty
  UNION ALL
  SELECT 'duplicate_rows',
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM dirty
  UNION ALL
  SELECT 'missing_clerk',
         CAST(COUNT(*) FILTER (WHERE clerk IS NULL) AS BIGINT) FROM dirty
  UNION ALL
  SELECT 'violations_total',
         CAST(COUNT(*) FILTER (WHERE total IS NOT NULL AND total <= 0)
              AS BIGINT) FROM dirty
) ORDER BY metric
"""


@register("audit_report_roundtrip", oracle=_AUDIT_ORACLE)
def audit_report_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 end to end (reference audit_report.py:152-181): the audit rule
    engine runs over a deterministically-dirtied orders projection, the
    bounded report is written as JSON through sources/report.py and read
    BACK — the returned metrics come from the file, not the in-memory
    report — and the oracle re-derives each one from the raw table. A
    wrong missing/dup/violation count, or any damage through the JSON
    round trip, is a value mismatch. Scale: the audit is two full-table
    jobs with capped outputs; the report is driver-side by design."""
    rows = _audit_report_rows(spark, sf_dir)
    return spark.createDataFrame(
        rows, schema="metric string, value long"
    ).orderBy("metric")


# --------------------------------------------------------------------------
# JSONL corpus source/sink round trip with quarantine (sources/jsonl.py)
# --------------------------------------------------------------------------

#: Static corpus with every ingestion pathology pinned (the JSONL analog
#: of _DIRTY_CSV): an extra field (ignored), a missing field (typed
#: NULL), a non-JSON line (quarantined verbatim), a type-mismatched field
#: (PERMISSIVE marks the whole line corrupt -> quarantined), escaped
#: quotes, and an empty string (preserved, not nulled).
_DIRTY_JSONL = "\n".join(
    [
        '{"doc_id": 1, "text": "alpha beta"}',
        '{"doc_id": 2, "text": "gamma", "extra": true}',
        '{"doc_id": 3}',
        "not json at all",
        '{"doc_id": "x4", "text": "typed wrong"}',
        '{"doc_id": 5, "text": "quoted \\"q\\" comma, ok"}',
        '{"doc_id": 6, "text": ""}',
    ]
)

_JSONL_CACHE: dict[str, str] = {}


def _jsonl_paths() -> tuple[str, str]:
    """Stage the static dirty JSONL once per process (sentinel key — the
    content is sf-independent); returns (corpus_path, resink_dir)."""
    key = "__static__"
    if key not in _JSONL_CACHE:
        d = tempfile.mkdtemp(prefix="bbt_dirty_jsonl_")
        path = os.path.join(d, "corpus.jsonl")
        with open(path, "w") as f:
            f.write(_DIRTY_JSONL + "\n")
        _JSONL_CACHE[key] = path
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    path = _JSONL_CACHE[key]
    return path, os.path.join(os.path.dirname(path), "resunk")


# Every cell pinned: the kept rows have survived a full read -> write ->
# re-read cycle (write_jsonl omits NULL fields; the empty string must
# come back as '' not NULL), the quarantined rows carry the offending
# line VERBATIM.
_JSONL_ORACLE = """
SELECT * FROM (VALUES
  ('kept',        CAST(1 AS BIGINT),    'alpha beta'),
  ('kept',        CAST(2 AS BIGINT),    'gamma'),
  ('kept',        CAST(3 AS BIGINT),    CAST(NULL AS VARCHAR)),
  ('kept',        CAST(5 AS BIGINT),    'quoted "q" comma, ok'),
  ('kept',        CAST(6 AS BIGINT),    ''),
  ('quarantined', CAST(NULL AS BIGINT), 'not json at all'),
  ('quarantined', CAST(NULL AS BIGINT),
   '{"doc_id": "x4", "text": "typed wrong"}')
) AS t(kind, doc_id, text)
ORDER BY kind, doc_id
"""


@register("jsonl_corpus_roundtrip", oracle=_JSONL_ORACLE)
def jsonl_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus interchange path end to end (sources/jsonl.py
    — the corpus-ingest analog of csv_dirty_parse): a JSONL landing file
    with a non-JSON line and a type-mismatched line reads PERMISSIVE
    with a quarantine output (bad lines kept VERBATIM for audit, never
    silently dropped), the clean rows round-trip through write_jsonl ->
    read_jsonl (NULL-field omission and empty-string preservation both
    exercised), and every resulting cell is pinned by a VALUES oracle.
    Scale: one streamed text scan per read — the from_json formulation
    never caches the scan to split good/bad (the 100TB non-starter the
    module exists to avoid)."""
    from bbt_etl_dw_spark.sources.jsonl import read_jsonl, write_jsonl

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src, resink = _jsonl_paths()
    good, bad = read_jsonl(spark, src, schema)
    write_jsonl(good, resink, partitions=1)
    kept, requarantined = read_jsonl(spark, resink, schema)
    # a lossy write would surface as rows moving to the re-read's
    # quarantine — fold that output in so it cannot silently stay empty
    out = (
        kept.select(F.lit("kept").alias("kind"), "doc_id", "text")
        .unionByName(
            bad.select(
                F.lit("quarantined").alias("kind"),
                F.lit(None).cast("long").alias("doc_id"),
                F.col("raw_line").alias("text"),
            )
        )
        .unionByName(
            requarantined.select(
                F.lit("requarantined").alias("kind"),
                F.lit(None).cast("long").alias("doc_id"),
                F.col("raw_line").alias("text"),
            )
        )
    )
    return out.orderBy("kind", "doc_id")


# --------------------------------------------------------------------------
# S4 at the reference's full shape: 6 dims + FactSales through Derby
# --------------------------------------------------------------------------

_FULL_STAR_CACHE: dict[str, str] = {}


def _full_star_url(spark: SparkSession, sf_dir: str) -> str:
    """Load (once per process+sf_dir) the reference's actual 7-table
    warehouse shape (etl_load.py:38-61: DimCustomer, DimProduct,
    DimStore, DimTaxRate, DimExchange, DimCalendar, FactSales) into an
    embedded Derby star. The fact lands in TWO writes (overwrite +
    append — the reference's accumulation mode); dims load once each."""
    from bbt_etl_dw_spark.sources.jdbc import DERBY_DRIVER, jdbc_options, write_jdbc

    if sf_dir in _FULL_STAR_CACHE:
        return _FULL_STAR_CACHE[sf_dir]
    d = _scratch_dir("bbt_jdbc_star_")
    url = f"jdbc:derby:{d}/star;create=true"

    def load(name: str, df: DataFrame, mode: str = "overwrite") -> None:
        write_jdbc(
            df, mode=mode, **jdbc_options(url, name, driver=DERBY_DRIVER)
        )

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    prod = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    store = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    tax = table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_regionkey",
        ((F.col("n_nationkey") % 5).cast("double") / F.lit(100.0)).alias(
            "tax_rate"
        ),
    )
    exch = table(spark, sf_dir, "region").select(
        "r_regionkey",
        (F.lit(1.0) + F.col("r_regionkey").cast("double") / F.lit(10.0)).alias(
            "exch_rate"
        ),
    )
    from pyspark.sql import Window

    cal = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("cal_date"))
        .distinct()
        .select(
            "cal_date",
            F.row_number()
            .over(Window.orderBy("cal_date"))
            .cast("long")
            .alias("day_index"),
        )
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 5 == 0)
    o = table(spark, sf_dir, "orders")
    fact = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.col("o_custkey").alias("f_custkey"),
        F.col("o_orderdate").alias("cal_date"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "amount"
        ),
    )
    load("DimCustomer", cust)
    load("DimProduct", prod)
    load("DimStore", store)
    load("DimTaxRate", tax)
    load("DimExchange", exch)
    load("DimCalendar", cal)
    load("FactSales", fact.filter(F.col("l_orderkey") % 2 == 0))
    load("FactSales", fact.filter(F.col("l_orderkey") % 2 == 1), mode="append")
    _FULL_STAR_CACHE[sf_dir] = url
    return url


# The oracle rebuilds the whole star from the raw tables with the exact
# double expressions the staging computed BEFORE the JDBC write (Derby
# DOUBLE round-trips bit-exactly), so any loss through the 8 writes or
# the partitioned read-back — a dropped append slice, a duplicated
# overwrite, timestamp/row damage — is a value mismatch.
_FULL_STAR_ORACLE = f"""
WITH cal AS (
  SELECT cal_date, CAST(row_number() OVER (ORDER BY cal_date) AS BIGINT) AS day_index
  FROM (SELECT DISTINCT o_orderdate AS cal_date FROM orders)
)
SELECT CAST(c.c_nationkey AS INT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_sales,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       {sql_dsum('(l.l_extendedprice * (1 - l.l_discount)) * (1.0 + (n.n_nationkey % 5) / 100.0)', 'taxed')},
       {sql_dsum('(l.l_extendedprice * (1 - l.l_discount)) * (1.0 + r.r_regionkey / 10.0)', 'converted')},
       CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
       CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_stores,
       CAST(MAX(cal.day_index) AS BIGINT) AS max_day
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN cal        ON o.o_orderdate = cal.cal_date
WHERE l.l_orderkey % 5 = 0
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


@register("jdbc_full_star_load", oracle=_FULL_STAR_ORACLE)
def jdbc_full_star_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 at the reference's FULL star shape (etl_load.py:38-61): six
    dimensions plus FactSales land in an embedded Derby warehouse (the
    fact via overwrite + append, the reference's accumulation mode), all
    seven read back — the fact through a partitioned parallel JDBC scan —
    and the star joined and rolled up per customer nation. The oracle
    rebuilds every dim and the fact from the raw parquet, so the taxed /
    converted / calendar-index columns certify that each dimension's
    values survived the warehouse round trip, not just the fact's.
    Scale: dims broadcast; the fact read parallelizes on the key bounds;
    the rollup is one hash aggregate."""
    from bbt_etl_dw_spark.sources.jdbc import DERBY_DRIVER, jdbc_options, read_jdbc

    url = _full_star_url(spark, sf_dir)

    def dim(name: str) -> DataFrame:
        return F.broadcast(
            read_jdbc(spark, **jdbc_options(url, name, driver=DERBY_DRIVER))
        )

    fact = read_jdbc(
        spark,
        **jdbc_options(url, "FactSales", driver=DERBY_DRIVER),
        partitionColumn="l_orderkey",
        lowerBound="0",
        upperBound="10000000",
        numPartitions="4",
    )
    cust, prod, store = dim("DimCustomer"), dim("DimProduct"), dim("DimStore")
    tax, exch, cal = dim("DimTaxRate"), dim("DimExchange"), dim("DimCalendar")
    j = (
        fact.join(cust, fact.f_custkey == cust.c_custkey)
        .join(tax, cust.c_nationkey == tax.n_nationkey)
        .join(exch, tax.n_regionkey == exch.r_regionkey)
        .join(prod, fact.l_partkey == prod.p_partkey)
        .join(store, fact.l_suppkey == store.s_suppkey)
        .join(cal, "cal_date")
    )
    return (
        j.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            dsum("amount", "revenue"),
            dsum(F.col("amount") * (F.lit(1.0) + F.col("tax_rate")), "taxed"),
            dsum(F.col("amount") * F.col("exch_rate"), "converted"),
            F.countDistinct("p_brand").alias("n_brands"),
            F.countDistinct("s_suppkey").alias("n_stores"),
            F.max("day_index").alias("max_day"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Streaming span-dedup ingest loop: three epochs, one replayed
# --------------------------------------------------------------------------

_SPAN_INGEST_CACHE: dict[str, str] = {}


def _span_ingest_root(spark: SparkSession, sf_dir: str) -> str:
    """Run the span-dedup ingest loop (streaming/ops.span_ingest_batch —
    the exact function streaming_span_ingest's foreachBatch calls) over
    three serial epochs split by ``doc_id % 3``, epoch 1 REPLAYED (the
    stream-restart case: the spans and index partitions for the epoch are
    dynamically overwritten, and the probe excludes the epoch's own
    earlier digests so the replay detects the same spans)."""
    from bbt_etl_dw_spark.streaming.ops import span_ingest_batch

    if sf_dir in _SPAN_INGEST_CACHE:
        return _SPAN_INGEST_CACHE[sf_dir]
    root = _scratch_dir("bbt_span_ingest_")
    spans, index = f"{root}/spans", f"{root}/index"
    docs = table(spark, sf_dir, "documents", spread=True)
    for epoch in (0, 1, 1, 2):  # 1 twice: replayed batch
        batch = docs.filter(F.col("doc_id") % 3 == epoch)
        span_ingest_batch(
            batch, epoch, spans, index, n=8, idempotent=True
        )
    _SPAN_INGEST_CACHE[sf_dir] = root
    return root


# Serial replay of the span ingest loop: a batch window (8 lower-cased
# whitespace tokens, 16-hex md5 digest — byte-identical machinery to the
# oracled doc_incremental_span_dedup) is duplicated iff its digest exists
# in ANY earlier epoch's windows (the standing index holds every prior
# batch's distinct digests) or in >=2 distinct docs of its own epoch;
# duplicated windows then merge gaps-and-islands (break at pos >
# prev + 8) into maximal spans.
_SPAN_INGEST_ORACLE = r"""
WITH w AS (
  SELECT doc_id, doc_id % 3 AS epoch,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws
  FROM documents
),
win AS (
  SELECT doc_id, epoch, CAST(i - 1 AS BIGINT) AS pos,
         substring(md5(array_to_string(ws[i:i+7], ' ')), 1, 16) AS h
  FROM (SELECT doc_id, epoch, ws, UNNEST(range(1, len(ws) - 6)) AS i FROM w)
),
dw AS (
  SELECT b.doc_id, b.pos
  FROM win b
  WHERE EXISTS (SELECT 1 FROM win p WHERE p.h = b.h AND p.epoch < b.epoch)
     OR EXISTS (SELECT 1 FROM win q WHERE q.h = b.h AND q.epoch = b.epoch
                AND q.doc_id <> b.doc_id)
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER win IS NULL OR pos > lag(pos) OVER win + 8
              THEN 1 ELSE 0 END AS brk
  FROM dw WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
       MAX(pos) + 7 - MIN(pos) + 1 AS span_tokens
FROM grp GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


@register("doc_span_ingest_corpus", oracle=_SPAN_INGEST_ORACLE)
def doc_span_ingest_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming span-dedup ingest loop end to end with driver
    evidence (streaming/ops.span_ingest_batch — the body of
    streaming_span_ingest's foreachBatch): documents arrive in three
    serial epochs, epoch 1 is replayed (exactly-once: its spans and
    index partitions are dynamically overwritten, and the probe excludes
    the epoch's own earlier attempt), each batch probes only the
    digest-only standing index — corpus text is never re-read. The
    oracle replays the window digests and the epoch-serial duplication
    rule; a duplicated replay, a self-colliding retry, or a wrong index
    probe all change the detected span set. Scale: O(batch) per append,
    the standing state is the compact digest index only."""
    from bbt_etl_dw_spark.streaming.ops import read_epoch_sink

    root = _span_ingest_root(spark, sf_dir)
    spans = read_epoch_sink(spark, f"{root}/spans")
    return spans.select(
        "doc_id", "span_start", "span_end", "span_tokens"
    ).orderBy("doc_id", "span_start")


# --------------------------------------------------------------------------
# Streaming semantic-dedup ingest loop: three epochs, one replayed
# --------------------------------------------------------------------------

#: Frozen literal centroids for the ingest loop (8 stride-one-hot 64-d
#: vectors): centroid j is 1.0 at dims i ≡ j (mod 8), 0.0 elsewhere —
#: deterministic, engine-independent, and replayable as a SQL CTE. The
#: production regime is the same: centroids are plan literals frozen
#: across appends (retraining is a scheduled compaction).
_SEM_CENTROIDS = [
    [1.0 if i % 8 == j else 0.0 for i in range(64)] for j in range(8)
]
_SEM_THRESHOLD = 0.25

_SEM_INGEST_CACHE: dict[str, str] = {}


def _semantic_ingest_root(spark: SparkSession, sf_dir: str) -> str:
    """Run the semantic-dedup ingest loop (streaming/ops.
    semantic_ingest_batch — the body of streaming_semantic_ingest's
    foreachBatch) over three serial epochs split by ``vec_id % 3``,
    epoch 1 REPLAYED (exactly-once: per-epoch dynamic partition
    overwrite + the probe excluding the epoch's own earlier attempt)."""
    from bbt_etl_dw_spark.streaming.ops import semantic_ingest_batch

    if sf_dir in _SEM_INGEST_CACHE:
        return _SEM_INGEST_CACHE[sf_dir]
    root = _scratch_dir("bbt_sem_ingest_")
    corpus, index = f"{root}/corpus", f"{root}/index"
    emb = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", "embedding"
    )
    for epoch in (0, 1, 1, 2):  # 1 twice: replayed batch
        batch = emb.filter(F.col("vec_id") % 3 == epoch)
        semantic_ingest_batch(
            batch,
            epoch,
            corpus,
            index,
            centroids=_SEM_CENTROIDS,
            threshold=_SEM_THRESHOLD,
            idempotent=True,
        )
    _SEM_INGEST_CACHE[sf_dir] = root
    return root


# Serial replay of the SemDeDup ingest survival rule: near-dup pairs are
# same-assigned-cluster pairs at exact-decimal cosine >= threshold
# (native-double sequential-fold prescreen at threshold - 1e-6 — a
# prescreen may only ADMIT extra pairs; the exact finish decides), and a
# batch vector is dropped iff it near-dups a PRIOR-EPOCH SURVIVOR (the
# index holds survivors only) or a smaller-id vector of its own epoch.
_SEM_INGEST_ORACLE = f"""
WITH cents AS (
  SELECT CAST(c AS INT) AS cid,
         list_transform(range(0, 64), i -> CASE WHEN i % 8 = CAST(c AS INT)
                        THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS ce
  FROM range(0, 8) t(c)
),
v AS (
  SELECT vec_id, vec_id % 3 AS epoch,
         list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
d AS (
  SELECT v.vec_id, v.epoch, c.cid,
         list_reduce(list_transform(range(1, len(v.e)+1),
           i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i])), (a,b) -> a + b) AS dist
  FROM v CROSS JOIN cents c
),
a AS (
  SELECT vec_id, epoch, cid FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
prods AS (
  SELECT vec_id, UNNEST(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS p
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         sqrt(CAST(CAST(SUM(TRY_CAST(CAST(p AS VARCHAR) AS DECIMAL(35,18))) AS VARCHAR) AS DOUBLE)) AS nrm
  FROM prods GROUP BY vec_id
),
screened AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM v x JOIN a ax ON ax.vec_id = x.vec_id
  JOIN v y ON x.vec_id < y.vec_id
  JOIN a ay ON ay.vec_id = y.vec_id AND ay.cid = ax.cid
  JOIN norms nx ON nx.vec_id = x.vec_id
  JOIN norms ny ON ny.vec_id = y.vec_id
  WHERE list_reduce(list_transform(range(1, len(x.e)+1), i -> x.e[i] * y.e[i]),
                    (p, q) -> p + q)
        / (nx.nrm * ny.nrm) >= {_SEM_THRESHOLD} - 1e-6
),
pairprods AS (
  SELECT s.id_a, s.id_b,
         UNNEST(list_transform(range(1, 65), i -> ea.e[i] * eb.e[i])) AS p
  FROM screened s
  JOIN v ea ON ea.vec_id = s.id_a
  JOIN v eb ON eb.vec_id = s.id_b
),
dots AS (
  SELECT id_a, id_b,
         CAST(CAST(SUM(TRY_CAST(CAST(p AS VARCHAR) AS DECIMAL(35,18))) AS VARCHAR) AS DOUBLE) AS dot
  FROM pairprods GROUP BY id_a, id_b
),
pairs AS (
  SELECT d.id_a, d.id_b FROM dots d
  JOIN norms na ON na.vec_id = d.id_a
  JOIN norms nb ON nb.vec_id = d.id_b
  WHERE d.dot / (na.nrm * nb.nrm) >= {_SEM_THRESHOLD}
),
nbrs AS (
  SELECT id_a AS x, id_b AS y FROM pairs
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM pairs
),
e0 AS (SELECT vec_id FROM v WHERE epoch = 0),
e1 AS (SELECT vec_id FROM v WHERE epoch = 1),
e2 AS (SELECT vec_id FROM v WHERE epoch = 2),
s0 AS (
  SELECT d.vec_id FROM e0 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN e0 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id AND n.y < d.vec_id)
),
s1 AS (
  SELECT d.vec_id FROM e1 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN s0 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN e1 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id AND n.y < d.vec_id)
),
s2 AS (
  SELECT d.vec_id FROM e2 d
  WHERE NOT EXISTS (SELECT 1 FROM nbrs n JOIN s0 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN s1 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id)
    AND NOT EXISTS (SELECT 1 FROM nbrs n JOIN e2 p ON p.vec_id = n.y
                    WHERE n.x = d.vec_id AND n.y < d.vec_id)
),
surv AS (
  SELECT vec_id FROM s0 UNION ALL SELECT vec_id FROM s1
  UNION ALL SELECT vec_id FROM s2
)
SELECT s.vec_id, a.cid AS cluster_id, n.nrm AS l2_norm
FROM surv s
JOIN a ON a.vec_id = s.vec_id
JOIN norms n ON n.vec_id = s.vec_id
ORDER BY s.vec_id
"""


@register("embedding_semantic_ingest_corpus", oracle=_SEM_INGEST_ORACLE)
def embedding_semantic_ingest_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streaming semantic-dedup (SemDeDup) ingest loop end to end
    with driver evidence (streaming/ops.semantic_ingest_batch — the body
    of streaming_semantic_ingest's foreachBatch): embedding batches
    arrive in three serial epochs under FROZEN literal centroids, epoch
    1 is replayed (exactly-once via per-epoch dynamic partition
    overwrite + the probe excluding the epoch's own earlier attempt),
    each batch probes only the persisted assigned index in the clusters
    it lands in. The oracle replays centroid assignment, the prescreen +
    exact-decimal cosine, and the serial survival rule; the read-back
    cluster ids and norms certify the surviving vectors' CONTENT made it
    through the corpus sink intact. Scale: O(batch x touched clusters)
    per append; centroids are plan literals, never per-batch state."""
    from bbt_etl_dw_spark.operators.similarity import assign_centroid, norm_expr
    from bbt_etl_dw_spark.streaming.ops import read_epoch_sink

    root = _semantic_ingest_root(spark, sf_dir)
    corpus = read_epoch_sink(spark, f"{root}/corpus")
    v = F.col("embedding").cast("array<double>")
    return corpus.select(
        "vec_id",
        assign_centroid(v, _SEM_CENTROIDS).alias("cluster_id"),
        norm_expr(v).alias("l2_norm"),
    ).orderBy("vec_id")
