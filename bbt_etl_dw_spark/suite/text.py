"""Training-data text-pipeline suite over the documents table: dedup
(exact / MinHash-LSH / SimHash / incremental), language ID, quality
scoring, token counting, fingerprinting. EVERY query here is
oracle-paired: the md5-derived hash families make even the approximate
pipelines (signatures, banding, bucket caps, verify) replayable in
DuckDB value-for-value."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bbt_etl_dw_spark.catalog import table
from bbt_etl_dw_spark.operators.ckpt import materialize
from bbt_etl_dw_spark.operators.dedup import (
    exact_dup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from bbt_etl_dw_spark.operators.textstats import (
    LANG_MARKERS,
    lang_id,
    lang_scores,
    md5_fingerprint,
    quality_features,
    quality_score,
    regex_token_count,
    rolling_fingerprint,
    whitespace_token_count,
    words,
)
from bbt_etl_dw_spark.suite import register
from bbt_etl_dw_spark.suite import zsum as _zsum

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


_EXACT_DEDUP_ORACLE = f"""
WITH fps AS (
    SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
)
SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM fps GROUP BY fp ORDER BY fp
"""


@register("doc_exact_dedup_groups", oracle=_EXACT_DEDUP_ORACLE)
def doc_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the md5 of normalized text, keeping the
    min-id representative. The shuffle key is a 32-char digest, never the
    document body — at 100TB the shuffle moves ~50 bytes/doc."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return exact_dup_groups(docs, "doc_id", "text").orderBy("fp")


_TOKEN_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens
FROM documents ORDER BY doc_id
"""


@register("doc_token_counts", oracle=_TOKEN_ORACLE)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish pre-tokenizer regex
    (letter runs / digit runs / single punctuation). Narrow map stage."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        regex_token_count("text").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


_STOP_LIST = "['" + "','".join(LANG_MARKERS["en"]) + "']"

_QUALITY_ORACLE = f"""
WITH feats AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                AS BIGINT) AS n_norm,
           CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(len(list_filter({_WORDS_SQL}, w -> list_contains({_STOP_LIST}, w))) AS BIGINT) AS n_stop
    FROM documents
), ratios AS (
    SELECT doc_id, n_chars, n_words,
           (n_norm - (n_words - 1)) / greatest(n_words, 1) AS avg_word_len,
           n_punct / greatest(n_chars, 1) AS punct_ratio,
           n_stop / greatest(n_words, 1) AS stopword_ratio
    FROM feats
)
SELECT doc_id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
       0.4::DOUBLE * (CASE WHEN n_words >= 20 THEN 1.0 WHEN n_words >= 5 THEN 0.5 ELSE 0.0 END)::DOUBLE
     + 0.2::DOUBLE * (CASE WHEN avg_word_len >= 3 AND avg_word_len <= 12 THEN 1.0 ELSE 0.0 END)::DOUBLE
     + 0.2::DOUBLE * (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)::DOUBLE
     + 0.2::DOUBLE * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)::DOUBLE AS quality_score
FROM ratios ORDER BY doc_id
"""


@register("doc_quality_scores", oracle=_QUALITY_ORACLE)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword-ratio features and
    a composite score — the standard pre-training quality filter shape."""
    docs = table(spark, sf_dir, "documents", spread=True)
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_words"].alias("n_words"),
        feats["avg_word_len"].alias("avg_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score("text"),
    ).orderBy("doc_id")


def _lang_count_sql(lang: str) -> str:
    markers = "['" + "','".join(LANG_MARKERS[lang]) + "']"
    return (
        f"CAST(len(list_filter({_WORDS_SQL}, w -> list_contains({markers}, w))) AS INT)"
    )


_LANG_ORACLE = f"""
WITH scores AS (
    SELECT doc_id, lang AS labeled_lang,
           {_lang_count_sql("de")} AS score_de,
           {_lang_count_sql("en")} AS score_en,
           {_lang_count_sql("es")} AS score_es,
           {_lang_count_sql("fr")} AS score_fr
    FROM documents
)
SELECT doc_id, labeled_lang, score_de, score_en, score_es, score_fr,
       CASE WHEN greatest(score_de, score_en, score_es, score_fr) < 1 THEN 'und'
            WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
            WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
            WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
            ELSE 'fr' END AS predicted_lang
FROM scores ORDER BY doc_id
"""


@register("doc_lang_id", oracle=_LANG_ORACLE)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: per-language marker-word evidence counts, argmax with
    deterministic alphabetical tie-break, 'und' when no evidence."""
    docs = table(spark, sf_dir, "documents", spread=True)
    scores = lang_scores("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lg].cast("int").alias(f"score_{lg}") for lg in sorted(scores)],
        lang_id("text").alias("predicted_lang"),
    ).orderBy("doc_id")


_FP_ORACLE = f"""
WITH words AS (
    SELECT doc_id, text, {_WORDS_SQL} AS ws FROM documents
), sh AS (
    SELECT doc_id, text,
           CASE WHEN len(ws) >= 3 THEN
               list_transform(range(1, len(ws) - 1), j -> array_to_string(list_slice(ws, j, j + 2), ' '))
           ELSE [{_NORM_SQL}] END AS shingles
    FROM words
)
SELECT doc_id,
       md5({_NORM_SQL}) AS exact_fp,
       list_aggregate(list_transform(shingles, s -> substring(md5(s), 1, 16)), 'min') AS rolling_fp
FROM sh ORDER BY doc_id
"""


@register("doc_fingerprints", oracle=_FP_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 (exact dedup key) + minimum
    shingle-hash 'rolling' fingerprint (stable under small local edits)."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        md5_fingerprint("text").alias("exact_fp"),
        rolling_fingerprint("text", 3).alias("rolling_fp"),
    ).orderBy("doc_id")


# FULL-PIPELINE oracle: DuckDB replays the exact production path —
# md5-derived universal hash family ((h1 + i*h2) mod 2^31-1 from md5 hex
# substrings), per-slot mins, 16 md5-prefix band buckets, the 2000-row
# degenerate-bucket cap, the banded self-join, and the exact-Jaccard
# verify — so the emitted pair set AND values are checked bit-for-bit,
# recall included (an LSH bucketing bug that loses candidates now reds
# this row, which the precision companion alone could not see).
_MINHASH_PIPELINE_ORACLE = r"""
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
sizes AS (SELECT doc_id, len(shs) AS n FROM sh_list),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, i.ni / (na.n + nb.n - i.ni) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE i.ni / (na.n + nb.n - i.ni) >= 0.5
ORDER BY id_a, id_b
"""


@register("minhash_near_dup_pairs", oracle=_MINHASH_PIPELINE_ORACLE, bench=True)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) candidates -> exact n-gram-Jaccard
    verification >= 0.5. The md5-derived KM hash family makes the WHOLE
    approximate pipeline reproducible in SQL, so the oracle replays it
    end-to-end (signatures, band buckets, bucket cap, verify) instead of
    only bounding precision."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return minhash_dedup_pairs(docs, "doc_id", "text").orderBy("id_a", "id_b")


_NGRAM_JACCARD_ORACLE = r"""
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
sh AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM sh_list),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS inter, any_value(a.n) AS n_a, any_value(b.n) AS n_b
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
FROM pairs
WHERE inter / (n_a + n_b - inter) >= 0.5
ORDER BY id_a, id_b
"""


@register("doc_ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_ORACLE)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard >= 0.5 via a shingle inverted
    index (one self-join shuffle on the shingle, exchange reused). The
    value-checked ground truth for the MinHash-LSH approximate path."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return ngram_jaccard_pairs(docs, "doc_id", "text").orderBy("id_a", "id_b")


# FULL-PIPELINE oracle: DuckDB recomputes the md5-derived token hashes
# (two 32-bit words per token), the 64-slot ±1 vote fold, the signed
# signature assembly (sign bit via the explicit -2^63 mask — no negative
# shifts anywhere), the 4 chunk bucket keys, the 2000-cap, the bucket
# self-join, and the Hamming<=3 verify. Candidate generation, signature
# values, and distances are all value-checked — not just consistency.
_SIMHASH_PIPELINE_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
sh_list AS (
  SELECT doc_id, CASE WHEN len(ws) >= 1 THEN list_distinct(ws) ELSE [norm] END AS shs
  FROM w
),
tok AS (SELECT doc_id, UNNEST(shs) AS s FROM sh_list),
h AS (
  SELECT doc_id,
         CAST(('0x'||substring(md5(s),1,8)) AS BIGINT) AS hi,
         CAST(('0x'||substring(md5(s),9,8)) AS BIGINT) AS lo
  FROM tok
),
votes AS (
  SELECT doc_id, t.b,
         CAST(SUM(CASE WHEN t.b < 32
                       THEN CASE WHEN ((lo >> t.b) & 1) = 1 THEN 1 ELSE -1 END
                       ELSE CASE WHEN ((hi >> (t.b - 32)) & 1) = 1 THEN 1 ELSE -1 END
                  END) AS BIGINT) AS v
  FROM h CROSS JOIN range(0, 64) AS t(b)
  GROUP BY doc_id, t.b
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN
                    CASE WHEN b = 63 THEN -9223372036854775807 - 1
                         ELSE (CAST(1 AS BIGINT) << b) END
                  ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, b // 16 AS chunk,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << (b % 16)) ELSE 0 END)
              AS BIGINT) AS val
  FROM votes GROUP BY doc_id, b // 16
),
buck AS (SELECT c.doc_id, c.chunk, c.val, s.sig FROM chunks c JOIN sig s USING (doc_id)),
capped AS (
  SELECT * FROM buck QUALIFY COUNT(*) OVER (PARTITION BY chunk, val) <= 2000
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM capped a
  JOIN capped b ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
ORDER BY id_a, id_b
"""


@register("simhash_near_dup_pairs", oracle=_SIMHASH_PIPELINE_ORACLE)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dups: 16-bit-chunk candidate buckets, Hamming
    distance <= 3 verify. The md5-derived token-hash family makes the
    whole pipeline SQL-reproducible; the oracle replays it end-to-end."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return simhash_near_dups(docs, "doc_id", "text").orderBy("id_a", "id_b")


# Precision is SQL-checkable even though the LSH candidate generation is
# not: every pair the MinHash path emits must exist in the exact
# inverted-index Jaccard set (itself hash-green vs DuckDB) with the exact
# same jaccard value. The oracle derives has_pairs from the exact set, so
# a total recall collapse (emitted empty while true pairs exist) also
# turns the row red — not just false positives.
_MINHASH_PRECISION_ORACLE = f"""
WITH exact AS ({_NGRAM_JACCARD_ORACLE})
SELECT (SELECT COUNT(*) FROM exact) > 0 AS has_pairs,
       CAST(0 AS BIGINT) AS n_false_positives,
       CAST(0 AS BIGINT) AS n_value_mismatches
"""


@register("minhash_pairs_precision", oracle=_MINHASH_PRECISION_ORACLE)
def minhash_pairs_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver verification for the MinHash-LSH production path
    (VERDICT r02 #3): emitted pairs LEFT JOIN the exact all-pairs Jaccard
    ground truth — zero pairs outside the exact set, zero jaccard value
    disagreements, and non-emptiness whenever the exact set is non-empty.
    Recall remains pytest-asserted (LSH recall < 1 by design)."""
    docs = table(spark, sf_dir, "documents", spread=True)
    emitted = minhash_dedup_pairs(docs, "doc_id", "text")
    exact = ngram_jaccard_pairs(docs, "doc_id", "text").withColumnRenamed(
        "jaccard", "exact_jaccard"
    )
    return emitted.join(exact, ["id_a", "id_b"], "left").agg(
        (F.count(F.lit(1)) > 0).alias("has_pairs"),
        _zsum(F.col("exact_jaccard").isNull(), "n_false_positives"),
        _zsum(
            F.col("exact_jaccard").isNotNull()
            & (F.col("jaccard") != F.col("exact_jaccard")),
            "n_value_mismatches",
        ),
    )


# SimHash signatures are xxhash64-derived (not SQL-expressible), so the
# driver check verifies internal consistency through an INDEPENDENT plan:
# recompute each doc's signature via the plain simhash() path (no chunk
# keys, no bucket join, no payload carrying) and re-derive every emitted
# pair's Hamming distance from scratch. Catches chunk-extraction, bucket
# -join, and payload-propagation bugs; the emitted hamming must also
# respect the <=3 threshold, pairs must be ordered and distinct. The
# corpus is known non-degenerate (the exact Jaccard set is non-empty), so
# has_pairs = TRUE is a data-derived expectation, not a blind constant.
_SIMHASH_CHECK_ORACLE = """
SELECT TRUE AS has_pairs,
       CAST(0 AS BIGINT) AS n_hamming_mismatches,
       CAST(0 AS BIGINT) AS n_bad_pairs
"""


@register("simhash_pairs_check", oracle=_SIMHASH_CHECK_ORACLE)
def simhash_pairs_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver verification for the SimHash near-dup path: every emitted
    (id_a, id_b, hamming) must reproduce from independently recomputed
    full signatures, satisfy hamming <= 3, id_a < id_b, and be distinct."""
    from bbt_etl_dw_spark.operators.dedup import simhash

    docs = table(spark, sf_dir, "documents", spread=True)
    # the emitted pair list is tiny: materialize it and prune the
    # recompute side to pair members before the two attaches (the full
    # corpus simhash otherwise recomputes once per attach — r14 audit).
    # Semi-pruning preserves the LEFT-join absent-id semantics: an id
    # missing from the corpus is missing from the pruned side too.
    emitted = materialize(simhash_near_dups(docs, "doc_id", "text"))
    pair_ids = (
        emitted.select(F.col("id_a").alias("doc_id"))
        .unionByName(emitted.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sigs = materialize(
        docs.select(F.col("doc_id"), simhash("text").alias("sig")).join(
            F.broadcast(pair_ids), "doc_id", "left_semi"
        )
    )
    # LEFT joins from the emitted side: an emitted pair referencing an id
    # absent from the corpus must surface as a bad pair (null sig), not
    # silently drop out of an inner join and evade every counter.
    j = (
        emitted.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
            "left",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
            "left",
        )
        .withColumn(
            "recomputed", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
    )
    return j.agg(
        (F.count(F.lit(1)) > 0).alias("has_pairs"),
        _zsum(
            (F.col("recomputed").isNull())
            | (F.col("hamming") != F.col("recomputed"))
            | (F.col("hamming") > 3),
            "n_hamming_mismatches",
        ),
        (
            _zsum(
                F.col("sig_a").isNull()
                | F.col("sig_b").isNull()
                | (F.col("id_a") >= F.col("id_b")),
                "_ord",
            )
            + (F.count(F.lit(1)) - F.countDistinct("id_a", "id_b"))
        )
        .cast("long")
        .alias("n_bad_pairs"),
    )


_SPLIT_ORACLE = """
WITH bucketed AS (
    SELECT doc_id,
           CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_id
FROM bucketed GROUP BY 1 ORDER BY 1
"""


@register("doc_train_test_split", oracle=_SPLIT_ORACLE)
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by md5 hash bucket —
    stable under repartitioning/appends/reruns (never rand() or row
    position), reproducible by any engine (the oracle recomputes the same
    md5 buckets in DuckDB)."""
    from bbt_etl_dw_spark.operators.textstats import assign_split

    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", assign_split("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_id"))
        .orderBy("split")
    )


# DuckDB n-grams: 1-based inclusive list slice + list comprehension over
# generate_series reproduces word_ngrams (ordered, WITH duplicates).
def _ngrams_sql(n: int) -> str:
    return (
        f"CASE WHEN len(ws) >= {n} THEN "
        f"[array_to_string(ws[i:i+{n - 1}], ' ') FOR i IN generate_series(1, len(ws)-{n - 1})] "
        "ELSE [] END"
    )


_REPETITION_ORACLE = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
g AS (SELECT doc_id, {_ngrams_sql(2)} AS grams FROM w)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
       CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
           / greatest(len(grams), 1) AS dup_fraction
FROM g ORDER BY doc_id
"""


@register("doc_repetition_scores", oracle=_REPETITION_ORACLE)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-2-gram fraction
    per document (repetitive boilerplate scores high and is filtered before
    training). Narrow map stage — no shuffle at any scale."""
    from bbt_etl_dw_spark.operators.textstats import repetition_features

    docs = table(spark, sf_dir, "documents")
    f_ = repetition_features("text", n=2)
    return docs.select(
        "doc_id",
        f_["n_grams"].alias("n_grams"),
        f_["n_distinct_grams"].alias("n_distinct_grams"),
        f_["dup_fraction"].alias("dup_fraction"),
    ).orderBy("doc_id")


_BUCKET_SQL = (
    "CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 100 AS INT)"
)

_DECONTAM_ORACLE = f"""
WITH w AS (SELECT doc_id, {_BUCKET_SQL} AS bucket, {_WORDS_SQL} AS ws FROM documents),
g AS (SELECT doc_id, bucket, unnest({_ngrams_sql(4)}) AS gram FROM w)
SELECT a.doc_id, CAST(COUNT(DISTINCT a.gram) AS BIGINT) AS n_eval_grams_hit
FROM (SELECT doc_id, gram FROM g WHERE bucket < 80) a
JOIN (SELECT DISTINCT gram FROM g WHERE bucket >= 90) e USING (gram)
GROUP BY a.doc_id ORDER BY a.doc_id
"""


@register("doc_decontamination", oracle=_DECONTAM_ORACLE)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval 4-gram decontamination over the engine's own md5 split:
    training docs sharing any 4-gram with the held-out test bucket, with
    the distinct-hit count (the GPT-3/Llama overlap check). Eval n-gram
    set is broadcast — the training corpus is never shuffled."""
    from bbt_etl_dw_spark.operators.decontam import contamination_hits
    from bbt_etl_dw_spark.operators.textstats import assign_split

    docs = table(spark, sf_dir, "documents")
    split = docs.withColumn("split", assign_split("doc_id"))
    return contamination_hits(
        split.filter(F.col("split") == "train"),
        split.filter(F.col("split") == "test"),
        n=4,
    ).orderBy("doc_id")


# Connected components ARE SQL-expressible: a recursive CTE computes every
# (node, reachable-label) pair and MIN-aggregates per node — DuckDB's
# WITH RECURSIVE uses UNION (distinct) so the fixpoint terminates.
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_ORACLE}),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lbl) AS (
    SELECT src, src FROM (SELECT DISTINCT src FROM edges) s
    UNION
    SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


@register("doc_dedup_clusters", oracle=_CLUSTERS_ORACLE, bench=True)
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the exact Jaccard
    pair graph (min-label propagation, one shuffle per round) — keeping
    one representative per COMPONENT is what actually shrinks a corpus
    when near-dup relations chain (a~b~c). Edges come from
    collapsed_jaccard_edges: exact-duplicate groups pre-collapse to their
    min-id representative BEFORE the quadratic shingle self-join, which is
    component-equivalent (identical normalized texts have identical
    shingle sets) and turns the superlinear stage's cost from all-docs to
    distinct-texts — the standard crawl-dedup pipeline order. Oracle =
    recursive-CTE reachability with per-node MIN label over the FULL
    uncollapsed pair set, so the equivalence is pinned bit-exactly."""
    from bbt_etl_dw_spark.operators.dedup import (
        collapsed_jaccard_edges,
        dedup_clusters,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    pairs = collapsed_jaccard_edges(docs, "doc_id", "text")
    return dedup_clusters(pairs).orderBy("doc_id")


_INCR_DEDUP_ORACLE = f"""
WITH fps AS (
    SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
), hist AS (
    SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0
), keep AS (
    SELECT fp, MIN(doc_id) AS doc_id
    FROM fps WHERE doc_id % 2 = 1 GROUP BY fp
)
SELECT k.doc_id, k.fp
FROM keep k LEFT JOIN hist h USING (fp)
WHERE h.fp IS NULL
ORDER BY k.doc_id
"""


@register("doc_incremental_dedup", oracle=_INCR_DEDUP_ORACLE)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (append-time) exact dedup: even doc_ids play the
    already-ingested corpus, odd doc_ids the incoming batch; survivors are
    batch docs new to both the corpus and the batch itself. Digest-only
    joins — the text never shuffles (operators/dedup.incremental_exact_dedup)."""
    from bbt_etl_dw_spark.operators.dedup import incremental_exact_dedup

    docs = table(spark, sf_dir, "documents", spread=True)
    survivors = incremental_exact_dedup(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
    )
    return survivors.select(
        "doc_id", md5_fingerprint("text").alias("fp")
    ).orderBy("doc_id")


# Incremental near-dup: even doc_ids play the already-indexed corpus
# (only their band keys + hashed shingle sets exist — never their text),
# odd doc_ids the incoming batch. The oracle replays the identical
# md5-KM signatures, band buckets, cap, and the touching-the-batch
# filter, then verifies with jaccard over the hashed shingle sets.
_INCR_NEAR_DUP_ORACLE = r"""
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
  SELECT doc_id, band, bucket, CAST(doc_id % 2 AS INT) AS is_new FROM band
  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 2000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a
  JOIN capped b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE a.is_new = 1 OR b.is_new = 1
),
hs AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(shs,
                s -> CAST(('0x'||substring(md5(s),1,12)) AS BIGINT)))) AS h
  FROM sh_list
),
hn AS (SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS ni
  FROM cand c
  JOIN hs ha ON ha.doc_id = c.id_a
  JOIN hs hb ON hb.doc_id = c.id_b AND hb.h = ha.h
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, i.ni / (na.n + nb.n - i.ni) AS jaccard
FROM inter i
JOIN hn na ON na.doc_id = i.id_a
JOIN hn nb ON nb.doc_id = i.id_b
WHERE i.ni / (na.n + nb.n - i.ni) >= 0.5
ORDER BY id_a, id_b
"""


@register("doc_incremental_near_dup", oracle=_INCR_NEAR_DUP_ORACLE)
def doc_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (append-time) NEAR-dup detection: the corpus keeps a
    compact MinHash index (band keys + hashed shingle sets); an incoming
    batch probes it and self-checks, emitting every near-dup pair that
    touches the batch. The corpus text is never re-read — O(batch) work
    per append instead of re-running full-corpus dedup
    (operators/dedup.incremental_minhash_pairs)."""
    from bbt_etl_dw_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_corpus_index,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = minhash_corpus_index(hist, "doc_id", "text")
    return incremental_minhash_pairs(idx, batch, "doc_id", "text").orderBy(
        "id_a", "id_b"
    )


_PACKING_ORACLE = """
WITH toks AS (
    SELECT doc_id, lang,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), cums AS (
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum_tokens
    FROM toks
)
SELECT doc_id, lang, n_tokens, cum_tokens,
       CAST(FLOOR(greatest(cum_tokens - 1, 0) / 512.0) AS BIGINT) AS pack_id
FROM cums ORDER BY lang, doc_id
"""


@register("doc_sequence_packing", oracle=_PACKING_ORACLE)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training
    batcher): documents are concatenated in deterministic doc_id order
    within each language shard and cut every 512 tokens; a doc's pack is
    the chunk its last token lands in. One window cumsum PARTITIONED by
    the shard key — never a global single-partition window; at 100TB the
    shard key is (language, shard_bucket) so every partition packs
    independently."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("doc_id")
    toks = docs.select(
        "doc_id", "lang", whitespace_token_count("text").alias("n_tokens")
    )
    cums = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cums.withColumn(
        "pack_id",
        F.floor(F.greatest(F.col("cum_tokens") - 1, F.lit(0)) / F.lit(512.0)).cast(
            "long"
        ),
    ).orderBy("lang", "doc_id")


# Score = tf * (1/df): a monotone tf-idf variant chosen because it is a
# SINGLE IEEE division — bit-identical across engines, unlike ln()-based
# idf whose last ulp may differ between libm implementations.
_TFIDF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), scored AS (
    SELECT t.doc_id, t.term,
           CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df,
           t.tf / CAST(d.df AS DOUBLE) AS score,
           ROW_NUMBER() OVER (PARTITION BY t.doc_id
                              ORDER BY t.tf / CAST(d.df AS DOUBLE) DESC, t.term) AS rk
    FROM tf t JOIN df d USING (term)
)
SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rank
FROM scored WHERE rk <= 3 ORDER BY doc_id, rank
"""


@register("doc_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinguishing terms by tf x (1/df) — the
    keyword-extraction shape under retrieval and topic-dedup curation.
    One explode + two hash aggs + a broadcast-eligible df join + a
    doc-partitioned rank window; at 100TB the df table is the only
    corpus-global state and it is term-keyed (bounded by vocabulary).

    The df aggregate and the tf-df join key on xxhash64(term), not the
    term string (VERDICT r08 #8): the corpus-global shuffle carries
    fixed 8-byte keys and the join compares longs. The OUTPUT term stays
    the string carried through tf's groupBy (its shuffle already carries
    terms as grouping keys for exact per-doc counts), so oracles remain
    hash-exact; a 64-bit term collision (odds ~vocab²/2^64) could only
    nudge df on the collided pair."""
    docs = table(spark, sf_dir, "documents", spread=True)
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.explode(words("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("doc_id", F.xxhash64("term").alias("term_h"))
        .groupBy("term_h")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    scored = (
        tf.withColumn("term_h", F.xxhash64("term"))
        .join(df, "term_h")
        .withColumn("score", F.col("tf") / F.col("df").cast("double"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
        .orderBy("doc_id", "rank")
    )


# per-language keep rates (percent of the md5 bucket space)
_STRATA_RATES = {"de": 25, "en": 50, "es": 25, "fr": 75}

_STRATA_CASE = " ".join(
    f"WHEN '{lg}' THEN {r}" for lg, r in sorted(_STRATA_RATES.items())
)

_STRATIFIED_ORACLE = f"""
WITH b AS (
    SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents
), kept AS (
    SELECT doc_id, lang FROM b
    WHERE bucket < CASE lang {_STRATA_CASE} ELSE 10 END
)
SELECT d.lang, COUNT(*) AS n_total,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_sampled,
       MIN(k.doc_id) AS min_sampled_id
FROM documents d LEFT JOIN kept k USING (doc_id, lang)
GROUP BY d.lang ORDER BY d.lang
"""


@register("doc_stratified_sample", oracle=_STRATIFIED_ORACLE)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (corpus rebalancing): per-language
    keep rates applied via the same md5 bucket as the train/test split —
    append-stable and repartition-stable, never rand(). A narrow map +
    one agg; no sampleBy nondeterminism."""
    from bbt_etl_dw_spark.operators.textstats import split_bucket

    docs = table(spark, sf_dir, "documents")
    rate = F.lit(10)
    for lg, r in sorted(_STRATA_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    kept = F.when(split_bucket("doc_id") < rate, F.col("doc_id"))
    return (
        docs.select("lang", kept.alias("kept_id"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("kept_id").alias("n_sampled"),
            F.min("kept_id").alias("min_sampled_id"),
        )
        .orderBy("lang")
    )


_QUOTA_ORACLE = """
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
    FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rank_in_source
FROM ranked WHERE rk <= 50 ORDER BY source, doc_id
"""


@register("doc_source_quota", oracle=_QUOTA_ORACLE)
def doc_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping (domain rebalancing: no single crawl
    domain may dominate the corpus): keep the first 50 docs per source in
    deterministic doc_id order. Source-partitioned rank window — one
    shuffle on the stratum key, never a global sort."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("rank_in_source")
        )
        .filter(F.col("rank_in_source") <= 50)
        .orderBy("source", "doc_id")
    )


_VOCAB_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents)
SELECT word,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS BIGINT) AS total_count
FROM w GROUP BY word
ORDER BY doc_freq DESC, total_count DESC, word LIMIT 50
"""


@register("corpus_vocabulary", oracle=_VOCAB_ORACLE)
def corpus_vocabulary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: per-word document frequency + total count,
    deterministic top-50. count_distinct aggregates partially map-side;
    the top-k is a TakeOrdered, not a global sort."""
    from bbt_etl_dw_spark.operators.textstats import corpus_vocabulary

    docs = table(spark, sf_dir, "documents")
    return corpus_vocabulary(docs)


# --- span-level exact dedup (duplicated-substring detection) --------------
# Lee-et-al-style substring dedup at 8-token-window granularity: the
# oracle replays the whole pipeline — window digests, the min≠max
# distinct-doc test, the island merge — value-for-value.

_SPAN_CTES = r"""
v AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
  FROM documents
),
w AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         substring(md5(array_to_string(ws[i:i+7], ' ')), 1, 16) AS h
  FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws) - 6)) AS i FROM v)
),
dup AS (SELECT h FROM w GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
dw AS (SELECT doc_id, pos FROM w JOIN dup USING (h)),
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
),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
         MAX(pos) + 7 - MIN(pos) + 1 AS span_tokens
  FROM grp GROUP BY doc_id, island
)"""

_SPAN_DEDUP_ORACLE = f"""
WITH {_SPAN_CTES}
SELECT doc_id, span_start, span_end, span_tokens
FROM spans ORDER BY doc_id, span_start
"""


@register("doc_span_dedup", oracle=_SPAN_DEDUP_ORACLE, bench=True)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans (8-token windows):
    the removal plan substring-level dedup applies before packing. The
    shuffle keys are 16-hex digests and doc ids — the text never moves,
    and there is no pair join anywhere, so (unlike pair-emitting dedup)
    no quadratic blowup exists even for a window shared by millions of
    documents."""
    from bbt_etl_dw_spark.operators.spans import duplicated_spans

    docs = table(spark, sf_dir, "documents", spread=True)
    return duplicated_spans(docs, n=8).orderBy("doc_id", "span_start")


_SPAN_STATS_ORACLE = f"""
WITH {_SPAN_CTES}
SELECT v.doc_id,
       -- blank-doc guard mirrors textstats.whitespace_token_count:
       -- splitting '' yields [''] (len 1), but the token count is 0
       CAST(CASE WHEN len(v.ws) = 1 AND v.ws[1] = '' THEN 0
                 ELSE len(v.ws) END AS BIGINT) AS n_tokens,
       CAST(COALESCE(COUNT(s.doc_id), 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(SUM(s.span_tokens), 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(SUM(s.span_tokens), 0) AS BIGINT)
         / CAST(GREATEST(len(v.ws), 1) AS DOUBLE) AS dup_fraction
FROM v LEFT JOIN spans s ON v.doc_id = s.doc_id
GROUP BY v.doc_id, len(v.ws), v.ws
ORDER BY v.doc_id
"""


@register("doc_span_dedup_stats", oracle=_SPAN_STATS_ORACLE)
def doc_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage (one row per doc, zero-filled
    via left join): the signal a quality-filter stage thresholds on. Same
    span pipeline as doc_span_dedup plus one small doc-keyed join."""
    from bbt_etl_dw_spark.operators.spans import span_dedup_stats

    docs = table(spark, sf_dir, "documents", spread=True)
    return span_dedup_stats(docs, n=8).orderBy("doc_id")


# --- BPE merge training ---------------------------------------------------


def _bpe_fold_sql(arr_sql: str, lft_sql: str, rgt_sql: str) -> str:
    """The greedy left-to-right pair-merge fold, DuckDB form. Mirrors
    operators/bpe._merge_pair exactly (per-row folds run in array order
    on both engines). DuckDB 1.0's list_reduce has no initial-value
    argument, so the empty accumulator is smuggled in as a prepended
    seed element over a list-of-singleton-lists."""
    return f"""list_reduce(
      list_prepend(CAST([] AS VARCHAR[]), list_transform({arr_sql}, s -> [s])),
      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = {lft_sql} AND x[1] = {rgt_sql}
                  THEN list_append(acc[1:len(acc)-1], {lft_sql} || {rgt_sql})
                  ELSE list_append(acc, x[1]) END)"""


def _bpe_oracle(k: int) -> str:
    """Unrolled replay of bpe_train: word freqs, then per merge a pair
    count, a (count desc, lft, rgt) argmax, and the greedy left-to-right
    array-fold merge — the same fold the engine runs (reference BPE run
    semantics: 'a a a a' merges to 'aa aa' in one iteration)."""
    ctes = r"""
wf AS (
  SELECT word, COUNT(*) AS freq
  FROM (SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents WHERE len(trim(text)) > 0)
  GROUP BY word
),
v0 AS (
  SELECT freq,
         list_transform(range(1, len(word)+1), i -> word[i]) || ['</w>'] AS sym
  FROM wf
)"""
    for i in range(1, k + 1):
        prev = f"v{i-1}"
        # DuckDB forbids subqueries INSIDE lambda bodies, so the winning
        # pair joins in as plain columns (1-row cross join) for the fold
        fold = _bpe_fold_sql("sym", f"__l{i}", f"__r{i}")
        ctes += f""",
p{i} AS (
  SELECT sym[i] AS lft, sym[i+1] AS rgt, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq, sym, UNNEST(range(1, len(sym))) AS i FROM {prev})
  GROUP BY 1, 2
),
b{i} AS (SELECT lft, rgt, pair_count FROM p{i}
         ORDER BY pair_count DESC, lft, rgt LIMIT 1),
v{i} AS (
  SELECT freq, {fold} AS sym
  FROM {prev} CROSS JOIN (SELECT lft AS __l{i}, rgt AS __r{i} FROM b{i})
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, lft, rgt, lft || rgt AS merged,"
        f" pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return f"WITH {ctes}\n{union}\nORDER BY merge_rank"


@register("corpus_bpe_merges", oracle=_bpe_oracle(k=3))
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges learned from the corpus (operators/bpe.py):
    one corpus pass for word frequencies, then vocabulary-local merge
    iterations (weighted pair count -> deterministic argmax -> literal
    replace), each collecting exactly ONE row to the driver. The oracle
    replays the whole trainer — pair statistics, tie-breaks, and the
    left-to-right non-overlapping merge semantics — value-for-value."""
    from bbt_etl_dw_spark.operators.bpe import bpe_train

    docs = table(spark, sf_dir, "documents", spread=True)
    return bpe_train(docs, k=3).orderBy("merge_rank")


def _bpe_encode_oracle(k: int) -> str:
    """Replay the trainer (same CTEs), then ENCODE every document word
    with the learned merges and sum token counts per doc — the downstream
    tokenize pass a training pipeline runs after BPE training."""
    trainer = _bpe_oracle(k)
    ctes = trainer[len("WITH ") : trainer.index("\nSELECT CAST(1")]
    rep = "list_transform(range(1, len(word)+1), i -> word[i]) || ['</w>']"
    for i in range(1, k + 1):
        rep = _bpe_fold_sql(rep, f"__l{i}", f"__r{i}")
    joins = " ".join(
        f"CROSS JOIN (SELECT lft AS __l{i}, rgt AS __r{i} FROM b{i})"
        for i in range(1, k + 1)
    )
    return f"""WITH {ctes},
docwords AS (
  -- blank text: Spark's words() yields an empty array (the explode drops
  -- the doc); mirror that rather than DuckDB's [''] split artifact.
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents WHERE len(trim(text)) > 0
)
SELECT doc_id,
       CAST(SUM(len({rep})) AS BIGINT) AS bpe_tokens
FROM docwords {joins} GROUP BY doc_id ORDER BY doc_id"""


@register("doc_bpe_token_counts", oracle=_bpe_encode_oracle(k=3))
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the corpus-trained BPE vocabulary
    (3 merges): train (one corpus pass + vocab-local iterations), then
    encode every document word with apply_merges — pure expressions, a
    narrow map stage over the corpus. The oracle replays training AND
    encoding, so a divergence anywhere in the train->encode chain reds
    this row."""
    from bbt_etl_dw_spark.operators.bpe import apply_merges, bpe_train

    docs = table(spark, sf_dir, "documents", spread=True)
    merges = [
        (r["lft"], r["rgt"])
        for r in bpe_train(docs, k=3).orderBy("merge_rank").collect()
    ]
    w = F.explode(words("text")).alias("word")
    return (
        docs.select("doc_id", w)
        .select(
            "doc_id",
            F.size(apply_merges(F.col("word"), merges)).cast("long").alias("n"),
        )
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("bpe_tokens"))
        .orderBy("doc_id")
    )


# --- incremental span dedup ----------------------------------------------

_INCR_SPAN_ORACLE = r"""
WITH hist AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
batch AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
hv AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM hist
),
hw AS (
  SELECT DISTINCT substring(md5(array_to_string(ws[i:i+7], ' ')), 1, 16) AS h
  FROM (SELECT ws, UNNEST(range(1, len(ws) - 6)) AS i FROM hv)
),
bv AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM batch
),
bw AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         substring(md5(array_to_string(ws[i:i+7], ' ')), 1, 16) AS h
  FROM (SELECT doc_id, ws, UNNEST(range(1, len(ws) - 6)) AS i FROM bv)
),
dupb AS (SELECT h FROM bw GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
dup AS (SELECT h FROM hw UNION SELECT h FROM dupb),
dw AS (SELECT doc_id, pos FROM bw JOIN dup USING (h)),
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


@register("doc_incremental_span_dedup", oracle=_INCR_SPAN_ORACLE)
def doc_incremental_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-time span dedup: the batch (odd doc ids) probes the
    corpus's digest-only span index (even ids) — a batch window is
    duplicated if it exists in the corpus index or in >=2 batch docs.
    Corpus TEXT is never read on the probe path (O(batch) per append;
    inputFiles pytest gate), completing the incremental family:
    exact -> minhash -> span."""
    from bbt_etl_dw_spark.operators.spans import (
        incremental_span_dedup,
        span_corpus_index,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = span_corpus_index(hist, n=8)
    return incremental_span_dedup(idx, batch, n=8).orderBy(
        "doc_id", "span_start"
    )


# --- end-to-end curation pipeline ----------------------------------------
# plans/curation.py composed: exact dedup -> quality filter ->
# decontamination -> split, one disposition row per document with a
# single precedence-ordered drop reason. The oracle rebuilds every stage
# from the already-proven per-stage SQL (fingerprints, the quality
# ladder, the eval-gram join, the md5 split bucket) and the same
# when-ladder precedence.

_CURATION_ORACLE = f"""
WITH w AS (
  SELECT doc_id, text, {_BUCKET_SQL} AS bucket, {_WORDS_SQL} AS ws
  FROM documents
),
train AS (SELECT * FROM w WHERE bucket < 80),
evalg AS (
  SELECT DISTINCT gram
  FROM (SELECT unnest({_ngrams_sql(4)}) AS gram FROM w WHERE bucket >= 90)
),
keepers AS (
  -- sentinel mirrors plans/curation.py: NULL text must not vanish from
  -- the disposition through a NULL-key equi-join
  SELECT COALESCE(md5({_NORM_SQL}), '<null-text>') AS fp, doc_id FROM train
),
keep_min AS (SELECT fp, MIN(doc_id) AS keep_id FROM keepers GROUP BY fp),
hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.gram) AS n_hits
  FROM (SELECT doc_id, unnest({_ngrams_sql(4)}) AS gram FROM train) t
  JOIN evalg USING (gram)
  GROUP BY t.doc_id
),
feats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(len(list_filter(ws, x -> list_contains({_STOP_LIST}, x))) AS BIGINT) AS n_stop
  FROM train
),
q AS (
  SELECT doc_id,
         0.4::DOUBLE * (CASE WHEN n_words >= 20 THEN 1.0 WHEN n_words >= 5 THEN 0.5 ELSE 0.0 END)::DOUBLE
       + 0.2::DOUBLE * (CASE WHEN (n_chars - (n_words - 1)) / greatest(n_words, 1) >= 3
                              AND (n_chars - (n_words - 1)) / greatest(n_words, 1) <= 12 THEN 1.0 ELSE 0.0 END)::DOUBLE
       + 0.2::DOUBLE * (CASE WHEN n_stop / greatest(n_words, 1) >= 0.05 THEN 1.0 ELSE 0.0 END)::DOUBLE
       + 0.2::DOUBLE * (CASE WHEN n_punct / greatest(n_chars, 1) <= 0.2 THEN 1.0 ELSE 0.0 END)::DOUBLE
         AS quality_score
  FROM feats
),
disp AS (
  SELECT t.doc_id, q.quality_score,
         CASE WHEN t.doc_id <> m.keep_id THEN 'exact_dup'
              WHEN q.quality_score < 0.7 THEN 'low_quality'
              WHEN h.n_hits > 0 THEN 'contaminated'
              ELSE NULL END AS drop_reason,
         t.bucket
  FROM train t
  JOIN keepers k ON k.doc_id = t.doc_id
  JOIN keep_min m ON m.fp = k.fp
  JOIN q ON q.doc_id = t.doc_id
  LEFT JOIN hits h ON h.doc_id = t.doc_id
)
SELECT doc_id,
       drop_reason IS NULL AS kept,
       drop_reason,
       quality_score,
       CASE WHEN drop_reason IS NULL THEN
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid' ELSE 'test' END
       END AS split
FROM disp ORDER BY doc_id
"""


@register("doc_curation_pipeline", oracle=_CURATION_ORACLE)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline (plans/curation.py) over the corpus:
    docs in md5 buckets <80 are the training corpus, buckets >=90 the
    eval set; each doc gets one precedence-ordered disposition
    (exact_dup -> low_quality -> contaminated -> kept+split). The oracle
    rebuilds all four stages AND the precedence ladder in SQL, so a bug
    in any stage or in their composition reds this single row set."""
    from bbt_etl_dw_spark.operators.textstats import split_bucket
    from bbt_etl_dw_spark.plans.curation import run_curation_pipeline

    docs = table(spark, sf_dir, "documents", spread=True)
    b = split_bucket("doc_id")
    train = docs.filter(b < 80)
    eval_df = docs.filter(b >= 90)
    return run_curation_pipeline(train, eval_df, min_quality=0.7).disposition.orderBy(
        "doc_id"
    )


# --- train-vs-heldout token-distribution drift ----------------------------
# Distribution-shift monitoring for the split itself: if the hash split is
# healthy, per-token chi-square contributions stay small; a skewed split
# (or a corpus whose content drifted between ingests) surfaces as large
# contributions on specific tokens. Chi-square (not KL/JS) deliberately:
# it is pure +,-,*,/ arithmetic on integer counts, so the statistic is
# bit-reproducible cross-engine — log-based divergences differ in the last
# ulp across libm builds and cannot carry a hash-exact oracle.

_DRIFT_ORACLE = r"""
WITH toks AS (
    SELECT CASE WHEN CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INT) < 80
                THEN 'train' ELSE 'heldout' END AS grp,
           unnest(CASE WHEN length(trim(lower(text))) = 0
                       THEN CAST([] AS VARCHAR[])
                       ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS token
    FROM documents
), counts AS (
    SELECT token,
           CAST(COUNT(*) FILTER (grp = 'train') AS BIGINT) AS n_train,
           CAST(COUNT(*) FILTER (grp <> 'train') AS BIGINT) AS n_heldout
    FROM toks GROUP BY token
), kept AS (
    SELECT * FROM counts WHERE n_train + n_heldout >= 5
), tot AS (
    SELECT CAST(SUM(n_train) AS BIGINT) AS t_tr,
           CAST(SUM(n_heldout) AS BIGINT) AS t_he
    FROM kept
)
SELECT token, n_train, n_heldout,
       ((CAST(n_train AS DOUBLE)
         - (CAST(t_tr AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE))
        * (CAST(n_train AS DOUBLE)
         - (CAST(t_tr AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE))
        / ((CAST(t_tr AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE)))
     + ((CAST(n_heldout AS DOUBLE)
         - (CAST(t_he AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE))
        * (CAST(n_heldout AS DOUBLE)
         - (CAST(t_he AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE))
        / ((CAST(t_he AS DOUBLE) * CAST(n_train + n_heldout AS DOUBLE)) / CAST(t_tr + t_he AS DOUBLE)))
       AS chi2_contrib
FROM kept, tot
ORDER BY chi2_contrib DESC, token
LIMIT 50
"""


@register("doc_token_drift_chisq", oracle=_DRIFT_ORACLE, bench=True)
def doc_token_drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 drifting tokens between the train split and the held-out
    splits, by per-token chi-square contribution. One explode + ONE hash
    agg on the token (both split counters fold into the same pass via
    conditional sums — the fact never shuffles twice), a >=5-total cut
    (the classic expected-count validity rule, which also bounds the
    vocabulary reaching the scalar attach), marginals as a one-row
    broadcast, and a TakeOrdered top-k — never a global sort."""
    from bbt_etl_dw_spark.operators.textstats import split_bucket, words

    docs = table(spark, sf_dir, "documents", spread=True)
    grp = F.when(split_bucket("doc_id") < 80, "train").otherwise("heldout")
    t = docs.select(grp.alias("grp"), F.explode(words("text")).alias("token"))
    counts = t.groupBy("token").agg(
        F.sum(F.when(F.col("grp") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("grp") != "train", 1).otherwise(0))
        .cast("long")
        .alias("n_heldout"),
    )
    kept = counts.filter(F.col("n_train") + F.col("n_heldout") >= 5)
    # `kept` feeds both the marginals aggregate and the scored projection;
    # referenced twice it is EXECUTED twice — the corpus tokenize/explode
    # and the token aggregation ran once per branch (r14 plan audit:
    # documents scanned 2x). Materializing the vocabulary-sized frame
    # makes the corpus contribute one scan + one shuffle.
    kept = materialize(kept)
    tot = kept.agg(
        F.sum("n_train").cast("long").alias("t_tr"),
        F.sum("n_heldout").cast("long").alias("t_he"),
    )
    n_t = (F.col("n_train") + F.col("n_heldout")).cast("double")
    n_all = (F.col("t_tr") + F.col("t_he")).cast("double")
    e_tr = (F.col("t_tr").cast("double") * n_t) / n_all
    e_he = (F.col("t_he").cast("double") * n_t) / n_all
    d_tr = F.col("n_train").cast("double") - e_tr
    d_he = F.col("n_heldout").cast("double") - e_he
    contrib = (d_tr * d_tr / e_tr) + (d_he * d_he / e_he)
    return (
        kept.crossJoin(F.broadcast(tot))
        .select("token", "n_train", "n_heldout", contrib.alias("chi2_contrib"))
        .orderBy(F.desc("chi2_contrib"), "token")
        .limit(50)
    )


# --------------------------------------------------------------------------
# LM-based quality: OOV char-trigram rate vs a reference corpus
# (operators/lm.py — the oracle-able integer-count sibling of the add-k
# cross-entropy scorer, which stays pytest-only because log2 is not
# bit-portable cross-engine)
# --------------------------------------------------------------------------

_OOV_ORACLE = r"""
WITH norm AS (
  SELECT doc_id, source,
         repeat(chr(2), 2) || trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS padded
  FROM documents
), gl AS (
  SELECT doc_id, source,
         CASE WHEN length(padded) >= 3
              THEN [substr(padded, i, 3) FOR i IN generate_series(1, length(padded)-2)]
              ELSE [] END AS gs
  FROM norm
), grams AS (SELECT doc_id, source, unnest(gs) AS ngram FROM gl),
model AS (
  SELECT DISTINCT ngram FROM grams WHERE source IN ('src1', 'src2', 'src3')
), scored AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN m.ngram IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM grams g LEFT JOIN model m ON g.ngram = m.ngram
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       CAST(s.n_oov AS DOUBLE) / CAST(s.n_grams AS DOUBLE) AS oov_rate
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


@register("doc_lm_oov_rate", oracle=_OOV_ORACLE, bench=True)
def doc_lm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-style quality signal, oracle-exact: each document's
    out-of-vocabulary character-trigram rate against a reference corpus
    (sources src1-3 as the trusted set). High OOV = wrong charset /
    gibberish / off-language — the same cut a KenLM perplexity filter
    makes, built from integer counts and ONE IEEE division so DuckDB
    replays it bit-for-bit (operators/lm.py:oov_rate_vs_reference; the
    add-k cross-entropy scorer in the same module is the log-domain
    variant, pytest-evidenced). Scale: the reference's distinct-trigram
    set broadcasts (bounded by charset^3); the scored corpus never
    shuffles raw text — explode, map-side join, partial-agg to one row
    per doc."""
    from bbt_etl_dw_spark.operators.lm import oov_rate_vs_reference

    docs = table(spark, sf_dir, "documents", spread=True)
    ref = docs.filter(F.col("source").isin("src1", "src2", "src3"))
    return oov_rate_vs_reference(docs, ref).orderBy("doc_id")


# --------------------------------------------------------------------------
# PII detection + redaction (functions/redact.py)
# --------------------------------------------------------------------------

from bbt_etl_dw_spark.functions.redact import (  # noqa: E402
    pii_counts,
    redact_pii,
    sql_pii_counts,
    sql_redact_pii,
)

# The synthetic corpus is PII-free word soup, so the query plants
# deterministic PII derived from doc_id in-plan — BOTH engines build the
# identical augmented text, then detect and scrub it. Every category gets
# at least one planted instance across the corpus and the md5 of the
# scrubbed text pins the exact replacement output (not just the counts).
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    "         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

_PII_ORACLE = f"""
WITH aug AS (
    SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
)
SELECT doc_id,
       {', '.join(sql_pii_counts('text'))},
       md5({sql_redact_pii('text')}) AS scrubbed_fp
FROM aug
ORDER BY doc_id
"""


@register("doc_pii_scrub", oracle=_PII_ORACLE)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: per-document counts of
    email/SSN/phone/IPv4 matches plus the md5 fingerprint of the fully
    scrubbed text (functions/redact.py). The whole query is one codegen'd
    projection — regexp_count/regexp_replace chains, no Python, no
    shuffle except the output sort — so redaction cost is pure map work
    at any corpus size. PII is planted deterministically from doc_id
    (the lake's corpus is synthetic word soup; see _PII_AUG_SQL) so the
    regex parity is exercised on real matches in every category, and
    the scrubbed-text fingerprint pins replacement output byte-for-byte
    cross-engine."""
    d = table(spark, sf_dir, "documents")
    phone = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    host = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" host 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ),
    ).otherwise(F.lit(""))
    ssn = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" id 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com"),
        phone,
        host,
        ssn,
    )
    d = d.select("doc_id", aug.alias("text"))
    counts = pii_counts("text")
    return d.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        F.md5(redact_pii("text")).alias("scrubbed_fp"),
    ).orderBy("doc_id")


# --- BM25 ranked retrieval ------------------------------------------------

from bbt_etl_dw_spark.operators.search import bm25_topk, sql_bm25_ctes
from bbt_etl_dw_spark.operators.textstats import collocation_lift

_BM25_TERMS = ("spark", "join", "stream")
_BM25_K = 10

_BM25_ORACLE = f"""
WITH {sql_bm25_ctes(_BM25_TERMS, words_sql=_WORDS_SQL)}
SELECT doc_id, score, n_terms_hit FROM bm25
ORDER BY score DESC, doc_id
LIMIT {_BM25_K}
"""


@register("doc_bm25_search", oracle=_BM25_ORACLE)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a 3-term query (odds-ratio idf — the
    pre-log BM25 quantity, same per-term ranking, chosen so every step
    is a correctly-rounded IEEE op and the oracle is bit-exact; see
    operators/search.py). The corpus explodes once with the term IN-list
    applied BEFORE any shuffle; corpus-global state is two scalars + one
    df row per query term, all broadcast; the top-k is
    TakeOrderedAndProject (per-partition heaps, k rows to the driver),
    not a global sort. The per-term score fold is a fixed-order column
    pivot, not an order-free SUM."""
    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


# --- bigram collocations (PMI ranking, log-free) --------------------------

_PMI_MIN_COUNT = 30
_PMI_K = 20

_PMI_ORACLE = f"""
WITH w AS (SELECT {_WORDS_SQL} AS ws FROM documents),
grams_src AS (SELECT {_ngrams_sql(2)} AS grams FROM w),
grams AS (SELECT g.bigram FROM grams_src, UNNEST(grams) AS g(bigram)),
big AS (
  SELECT bigram, COUNT(*) AS n_xy FROM grams
  GROUP BY bigram HAVING COUNT(*) >= {_PMI_MIN_COUNT}
),
toks AS (SELECT t.word FROM w, UNNEST(ws) AS t(word)),
uni AS (SELECT word, COUNT(*) AS n_w FROM toks GROUP BY word),
tot AS (
  SELECT (SELECT COUNT(*) FROM grams) AS nb,
         (SELECT COUNT(*) FROM toks) AS nt
),
joined AS (
  SELECT b.bigram, b.n_xy, ux.n_w AS n_x, uy.n_w AS n_y, t.nb, t.nt
  FROM big b
  JOIN uni ux ON string_split(b.bigram, ' ')[1] = ux.word
  JOIN uni uy ON string_split(b.bigram, ' ')[2] = uy.word
  CROSS JOIN tot t
)
SELECT bigram, n_xy, n_x, n_y,
       ((CAST(n_xy AS DOUBLE) * CAST(nt AS DOUBLE)) * CAST(nt AS DOUBLE))
       / ((CAST(nb AS DOUBLE) * CAST(n_x AS DOUBLE)) * CAST(n_y AS DOUBLE)) AS lift
FROM joined
ORDER BY lift DESC, bigram
LIMIT {_PMI_K}
"""


@register("doc_pmi_collocations", oracle=_PMI_ORACLE)
def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations ranked by lift — PMI minus its
    monotone log, so the ranking is PMI's while every op stays
    correctly-rounded IEEE (operators/textstats.collocation_lift; the
    doc_token_drift_chisq / BM25-odds discipline). Two explode +
    hash-agg passes; min-count prunes the bigram table before its two
    vocabulary joins; totals attach as a 1-row broadcast; the final
    top-k is TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    return (
        collocation_lift(docs, min_count=_PMI_MIN_COUNT)
        .orderBy(F.col("lift").desc(), "bigram")
        .limit(_PMI_K)
    )


# --- prefix-filtered exact Jaccard join (PPJoin family) -------------------

from bbt_etl_dw_spark.operators.dedup import prefix_jaccard_pairs

# The oracle is the NAIVE all-pairs inverted-index Jaccard: prefix
# filtering is LOSSLESS, so the production-shaped plan must reproduce the
# brute-force answer bit-for-bit — a stronger statement than an oracle
# that replays the optimization. k=2 / t=0.4 differentiates from
# doc_ngram_jaccard_pairs (k=3 / t=0.5) and admits more boundary pairs.
_PREFIX_JACCARD_ORACLE = rf"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
sh_list AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 2
              THEN list_distinct([array_to_string(ws[i:i+1], ' ')
                                  FOR i IN generate_series(1, len(ws)-1)])
              ELSE [norm] END AS shs
  FROM w
),
sh AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM sh_list),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS inter, any_value(a.n) AS n_a, any_value(b.n) AS n_b
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
FROM pairs
WHERE inter / (n_a + n_b - inter) >= CAST({2 / 5!r} AS DOUBLE)
ORDER BY id_a, id_b
"""


@register("doc_prefix_jaccard_pairs", oracle=_PREFIX_JACCARD_ORACLE)
def doc_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-2-gram Jaccard >= 0.4 join via PREFIX FILTERING
    (operators/dedup.prefix_jaccard_pairs): shingles ranked rarest-first
    by global df, only the first n - ceil(t*n) + 1 explode into the
    inverted index (integer-exact prefix length from the rational
    threshold 2/5), size-compatibility residual in the join, exact
    verify on candidates only. The oracle is the NAIVE all-pairs
    Jaccard — prefix filtering is lossless, so the fast plan must match
    brute force exactly; the frequent shingles that ngram_jaccard_pairs
    can only stop-gram away (changing its answer) here never fan out
    while the answer is unchanged."""
    docs = table(spark, sf_dir, "documents", spread=True)
    return prefix_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=2, threshold_num=2, threshold_den=5
    ).orderBy("id_a", "id_b")


# --- per-document keyword extraction (tf-idf top-k) -------------------------

_KEYWORDS_K = 3

_KEYWORDS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE len(trim(text)) > 0
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
  WHERE term <> '' GROUP BY term
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE)
           * ((CAST(nd.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
              / (CAST(dfreq.df AS DOUBLE) + 0.5)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, term, score,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
  FROM scored
)
SELECT doc_id, rank, term, score
FROM ranked WHERE rank <= {_KEYWORDS_K}
ORDER BY doc_id, rank
"""


@register("doc_top_keywords", oracle=_KEYWORDS_ORACLE)
def doc_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf-idf, with the
    same pre-log ODDS idf as doc_bm25_search (identical per-term
    ranking to log idf — log is monotone — without libm in the oracle).
    One corpus explode feeds both the (doc, term) frequencies and the
    document-frequency rollup; the df attach is a term-keyed equi-join,
    the corpus size a 1-row broadcast scalar, and the top-3 cut a
    row_number window partitioned BY DOCUMENT (never global), tie-broken
    on the term so the cut is deterministic."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", F.explode(words("text")).alias("term")).filter(
        F.col("term") != ""
    )
    # tf is materialized and the document frequency DERIVES from it:
    # (doc_id, term) is unique in tf, so counting tf rows per term IS
    # countDistinct(doc_id) over the raw tokens — the corpus tokenize
    # runs once instead of twice (r14 plan audit), and the checkpoint
    # carries the (doc, term) count table, never the raw token stream.
    tf = materialize(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfd = F.col("df").cast("double")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * ((F.col("n_docs").cast("double") - dfd + F.lit(0.5))
                   / (dfd + F.lit(0.5)))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _KEYWORDS_K)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


# --- temperature-weighted source mixing --------------------------------------

# alpha = 0.5 -> sqrt weighting, the classic multilingual/multi-source
# rebalance (Conneau & Lample style): sqrt is a correctly-rounded IEEE
# op, so unlike a general pow(x, alpha) the whole computation stays
# bit-exact cross-engine.

_TEMP_MIX_ORACLE = """
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
              AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM per_source
),
weighted AS (
  SELECT p.source, p.n_docs, p.n_tokens,
         CAST(p.n_tokens AS DOUBLE) / CAST(t.tok_total AS DOUBLE) AS raw_share,
         sqrt(CAST(p.n_tokens AS DOUBLE) / CAST(t.tok_total AS DOUBLE)) AS w
  FROM per_source p CROSS JOIN tot t
),
norm AS (
  SELECT CAST(CAST(SUM(TRY_CAST(CAST(w AS VARCHAR) AS DECIMAL(38,18)))
       AS VARCHAR) AS DOUBLE) AS wsum
  FROM weighted
)
SELECT source, n_docs, n_tokens, raw_share,
       w / wsum AS temp_share,
       (w / wsum) / raw_share AS upsample_factor
FROM weighted CROSS JOIN norm
ORDER BY source
"""


@register("doc_mix_temperature", oracle=_TEMP_MIX_ORACLE)
def doc_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha = 0.5) source mixing shares: the
    classic sqrt rebalance that upsamples rare sources and damps
    dominant ones before pre-training (its exact-target twin is the
    token_mix_rates keep-rate solver). Per-source token totals are one
    map-side-combining aggregate over the corpus; the grand total and
    the weight normalizer attach as 1-row broadcast scalars over the
    SOURCES-sized rollup (the normalizer re-accumulates exact decimals —
    a bare double SUM is partition-order-dependent and flaked by one ulp
    in the full-registry sweep). alpha is fixed at 0.5 because sqrt is a
    correctly-rounded IEEE op — a general pow(x, alpha) is libm and
    would break the bit-exact oracle; the upsample_factor column is the
    number a sampler feeds straight into per-source rates."""
    docs = table(spark, sf_dir, "documents", spread=True)
    # sources-grain rollup feeds the grand total AND the weighting pass
    # (and `weighted` fans out again below): materialized, the corpus
    # tokenize+count runs once instead of 4x (r14 plan audit)
    per_source = materialize(
        docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words("text")).cast("long")).cast("bigint")
            .alias("n_tokens"),
        )
    )
    tot = per_source.agg(F.sum("n_tokens").cast("bigint").alias("tok_total"))
    raw = F.col("n_tokens").cast("double") / F.col("tok_total").cast("double")
    weighted = per_source.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens",
        raw.alias("raw_share"), F.sqrt(raw).alias("w"),
    )
    norm = weighted.agg(
        F.sum(F.col("w").try_cast("decimal(38,18)"))
        .cast("string").cast("double").alias("wsum")
    )
    return (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            "source", "n_docs", "n_tokens", "raw_share",
            (F.col("w") / F.col("wsum")).alias("temp_share"),
            ((F.col("w") / F.col("wsum")) / F.col("raw_share"))
            .alias("upsample_factor"),
        )
        .orderBy("source")
    )


# --- lexical diversity (type-token ratio + hapax share) ----------------------

_LEXDIV_ORACLE = """
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE len(trim(text)) > 0
),
tf AS (
  SELECT source, term, COUNT(*) AS cnt FROM toks
  WHERE term <> '' GROUP BY source, term
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS ttr,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS hapax_share
FROM tf GROUP BY source ORDER BY source
"""


@register("doc_lexical_diversity", oracle=_LEXDIV_ORACLE)
def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and hapax share —
    the cheap vocabulary-richness signals a curation pipeline reads
    beside the LM bits/char score (templated/spammy sources show low
    TTR; OCR-noisy ones show inflated hapax). One corpus explode into a
    map-side-combining (source, term) rollup (the same substrate as
    doc_top_keywords' df pass), then a sources-sized aggregate; the
    ratios are single IEEE divisions of exact longs."""
    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select("source", F.explode(words("text")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tf.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_hapax"),
        )
        .select(
            "source", "n_tokens", "n_types",
            (F.col("n_types").cast("double") / F.col("n_tokens").cast("double"))
            .alias("ttr"),
            "n_hapax",
            (F.col("n_hapax").cast("double") / F.col("n_types").cast("double"))
            .alias("hapax_share"),
        )
        .orderBy("source")
    )
