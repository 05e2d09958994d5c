"""Multimodal-column suite: image/audio/video as opaque binary + metadata.

The synthetic testdata has no real media files, so a media table is
synthesized deterministically from documents (payload = UTF-8 bytes of the
text, kind = doc_id mod 3) — the POINT is the Spark-side plumbing: binary
columns, metadata-only passes that never decode, Arrow-batched mapInPandas
decode (deterministic fake codec in this environment, see
operators/multimodal.py), and pure-expression frame sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.multimodal import decode_media, media_stats, sample_frames
from bbt_etl_dw_spark.suite import register

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def synth_media(docs: DataFrame) -> DataFrame:
    """documents -> MEDIA_SCHEMA-shaped table (payload = text bytes)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        F.concat(F.lit("synthetic://documents/"), F.col("doc_id")).alias("source_uri"),
    )


# DuckDB SUM(INTEGER) returns HUGEINT (hash-mismatches Spark's long) —
# cast both aggregates explicitly, like the sibling _DECODE_ORACLE does.
_STATS_ORACLE = f"""
WITH media AS (
    SELECT doc_id AS media_id, {_KIND_SQL} AS kind,
           encode(text) AS payload
    FROM documents
)
SELECT kind, COUNT(*) AS n_items,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(payload)) AS INT) AS max_bytes
FROM media GROUP BY kind ORDER BY kind
"""


@register("media_payload_stats", oracle=_STATS_ORACLE)
def media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media profiling: byte sizes per kind WITHOUT decoding
    (payloads are projected to lengths before the shuffle — at 100TB the
    agg moves a few longs per row, never the media bytes)."""
    docs = table(spark, sf_dir, "documents")
    return media_stats(synth_media(docs))


# The fake codec is sha256(payload): width/height from digest bytes 0-1,
# 8-dim feature from bytes 2-9 (operators/multimodal._make_fake_decode).
# DuckDB's sha256(VARCHAR) hashes the UTF-8 bytes — exactly the payload
# (= encode(text)) — so the digest math IS SQL-expressible: hex-pair ->
# int via the 0x cast. Features are float32 on both sides (Python double
# /255.0 rounded to FloatType by Arrow == DuckDB (x/255.0)::FLOAT).
def _digest_byte(i: int) -> str:
    return f"CAST(('0x' || substr(h, {2 * i + 1}, 2)) AS INT)"


_DECODE_ORACLE = f"""
WITH media AS (
    SELECT doc_id AS media_id, {_KIND_SQL} AS kind,
           sha256(text) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
)
SELECT media_id, kind,
       64 + {_digest_byte(0)} % 192 AS width,
       64 + {_digest_byte(1)} % 192 AS height,
       n_bytes,
       {", ".join(f"({_digest_byte(2 + j)} / 255.0)::FLOAT AS f{j}" for j in range(8))}
FROM media ORDER BY media_id
"""


@register("media_decode_features", oracle=_DECODE_ORACLE)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode -> (dims, n_bytes, 8-dim feature).
    Deterministic fake codec (sha256 of payload) in this environment; the
    batch plumbing (schema contract, maxRecordsPerBatch sizing) is the real
    path a Pillow/ffmpeg decoder would run in. The feature vector is
    projected to scalar columns f0..f7 so the driver's value-hash sees
    plain floats."""
    docs = table(spark, sf_dir, "documents", spread=True)
    decoded = decode_media(synth_media(docs), fake=True, batch_size=256)
    return decoded.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_bytes",
        *[F.col("feature")[j].alias(f"f{j}") for j in range(8)],
    ).orderBy("media_id")


_FRAMES_ORACLE = """
SELECT doc_id AS media_id,
       CAST(1 + doc_id % 50 AS INT) AS n_frames,
       UNNEST(range(0, 1 + doc_id % 50, 10)) AS frame_index
FROM documents
WHERE doc_id % 3 = 2
ORDER BY media_id, frame_index
"""


@register("video_frame_sample", oracle=_FRAMES_ORACLE)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic every-Nth frame-index sampling for the video subset —
    a pure sequence/explode expression; the per-frame decode then happens
    payload-local in the UDF stage (no payload shuffle)."""
    docs = table(spark, sf_dir, "documents")
    videos = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        (1 + F.col("doc_id") % 50).cast("int").alias("n_frames"),
    )
    return sample_frames(videos, every_n=10).orderBy("media_id", "frame_index")
