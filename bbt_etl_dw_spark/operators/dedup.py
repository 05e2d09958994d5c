"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

Scale design (the whole point at 100TB):
- Exact dedup is one hash-aggregate on a 32-char digest, not on the text.
- MinHash/SimHash signatures are computed as PURE ARRAY EXPRESSIONS per row
  (no explode, no shuffle, no Python) — a narrow map stage.
- Candidate generation is banded LSH: explode only B small band keys per
  doc and self-join on them — the only shuffle, on short keys, AQE-skew
  friendly. Never all-pairs.
- Verification (exact Jaccard / cosine / Hamming) runs only on candidate
  pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.textstats import md5_fingerprint, shingles


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint ->
    (keep_id = min id, n_dups). One hash-agg shuffle on the digest."""
    return (
        df.select(F.col(id_col).alias("doc_id"), md5_fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    keep = exact_dup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def _min_slot_hash(sh: Column, seed: int) -> Column:
    # NB: the lambda must stay single-parameter — a two-parameter lambda
    # makes Spark bind the second as the array index, not a closure value.
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed))))


def minhash_signature(text_col: str, num_hashes: int = 64, shingle_k: int = 3) -> Column:
    """MinHash signature as an array<long>, one xxhash64 family member per
    slot (seed mixed in as an extra hashed column). Pure expression."""
    sh = shingles(text_col, shingle_k)
    return F.array(*[_min_slot_hash(sh, i) for i in range(num_hashes)])


def _band_keys(sig_col: str, bands: int, rows: int) -> Column:
    """B band-bucket keys: hash of each R-slot slice of the signature."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", *[F.element_at(F.col(sig_col), b * rows + r + 1) for r in range(rows)])
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash-LSH.
    With H=64, B=16 (R=4), the match-probability curve crosses ~0.5 at
    Jaccard ≈ (1/16)^(1/4) ≈ 0.5 — tune B/R for the target threshold."""
    rows = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col, num_hashes, shingle_k).alias("sig"),
    )
    buckets = sigs.select(
        "doc_id", F.explode(_band_keys("sig", bands, rows)).alias("bk")
    ).select("doc_id", "bk.band", "bk.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only: join shingle sets back
    twice (broadcast-eligible candidate side), array_intersect/union."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, shingle_k).alias("sh")
    )
    out = (
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
    return out


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify."""
    cands = minhash_candidates(df, id_col, text_col, num_hashes, bands, shingle_k)
    return jaccard_verify(df, cands, id_col, text_col, shingle_k, threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(text_col: str, shingle_k: int = 1) -> Column:
    """64-bit SimHash as a pure expression: per bit, sum ±1 over token
    hashes (aggregate over the token array — no explode/groupBy), then
    assemble the sign bits into one long."""
    sh = shingles(text_col, shingle_k)

    def bit_vote(b: int) -> Column:
        vote = F.aggregate(
            sh,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(
                F.shiftright(F.xxhash64(s), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )
        return F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )

    out = bit_vote(0)
    for b in range(1, 64):
        out = out.bitwiseOR(bit_vote(b))
    return out


def simhash_candidates(
    df: DataFrame, id_col: str, text_col: str, chunks: int = 4, shingle_k: int = 1
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit chunk of the SimHash
    (covers all pairs within Hamming distance < chunks)."""
    width = 64 // chunks
    mask = (1 << width) - 1
    sigs = df.select(
        F.col(id_col).alias("doc_id"), simhash(text_col, shingle_k).alias("sig")
    )
    chunked = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sig", c * width).bitwiseAND(F.lit(mask)).alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "sig", "ck.chunk", "ck.val")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, shingle_k: int = 1
) -> DataFrame:
    return simhash_candidates(df, id_col, text_col, shingle_k=shingle_k).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup (shares LSH machinery with similarity search)
# --------------------------------------------------------------------------


def cosine_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 16,
) -> DataFrame:
    """Random-hyperplane LSH buckets -> exact cosine verify on candidates.
    Hyperplane signs are derived from xxhash64(plane, dim) — deterministic,
    no stored model. One bucket-join shuffle."""
    from bbt_etl_dw_spark.operators.similarity import cosine_expr, hyperplane_signature

    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
