"""Span-level exact dedup: maximal duplicated token spans across documents.

Motivation (training-data pipelines): document-level dedup (exact or
MinHash) misses the common failure mode where *parts* of documents repeat
across the corpus — boilerplate headers, license blocks, quoted chain
mail. "Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) removes any ≥50-token substring that appears more than once.
A distributed suffix array is overkill on Spark; the standard scalable
approximation is fixed-width token *windows*: a span is duplicated iff
every n-token window inside it is duplicated, so detecting duplicated
windows and merging overlapping ones recovers maximal duplicated spans
at window granularity.

Scale shape (the reason this formulation survives 100 TB):

- The document body is tokenized ONCE in a narrow map stage; what
  shuffles is ``(doc_id, pos, 16-hex window digest)`` — ~30 bytes per
  token, never the text.
- Window frequency needs only "appears in ≥2 distinct docs", which is
  ``MIN(doc_id) <> MAX(doc_id)`` — two partial-aggregatable aggregates,
  so the first shuffle map-side combines to one row per digest. No
  COUNT(DISTINCT) expansion, no cap needed: unlike pair-emitting dedup
  there is NO quadratic join anywhere — a window shared by a million
  documents still contributes exactly one row per occurrence.
- The island merge windows over ``doc_id`` — the third shuffle carries
  only the duplicated windows, typically a small fraction of the corpus.
- The windows relation feeds two consumers (the digest aggregate and the
  join-back), so the tokenize+md5 map stage runs twice. MEASURED at the
  sf1 tier (AB_RECOMPUTE_r15.json, interleaved same-JVM A/B): a
  checkpointed ``windows`` is 0.87x the recompute wall locally, because
  the page-cached corpus makes the re-scan free and the duplicated
  tokenize+md5 CPU is the whole cost. Recompute stays the default for
  the 100 TB contract anyway: ``windows`` is ~30 bytes/token (~5x the
  raw text), so materializing it writes multiple corpus volumes to
  executor-local disk — the trade only reverses where that storage
  exists and the corpus scan itself is the bottleneck (e.g. remote
  object storage without caching). Pin via checkpoint deliberately in
  such deployments.

Reference: the BBT-ETL-DW reference has no span-level operator (its dedup
is row-level `dropDuplicates`, deduplication.py); this is part of the
training-data extension surface alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.textstats import word_ngrams


def window_digests(text_col: str, n: int) -> Column:
    """array<string>: 16-hex-char md5 digest of each n-token window, in
    position order (index i = window starting at 0-based token i). md5,
    not xxhash64, so any engine (the DuckDB oracle included) re-derives
    identical digests from the text alone."""
    return F.transform(
        word_ngrams(text_col, n), lambda g: F.substring(F.md5(g), 1, 16)
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document.

    A window (n consecutive whitespace tokens of the lower-cased text) is
    *duplicated* when it occurs in at least 2 distinct documents. Runs of
    duplicated windows that overlap or touch (next start ≤ prev start + n)
    merge into one span. Token positions are 0-based; a span covers
    ``[span_start, span_end]`` inclusive.

    Returns ``(doc_id, span_start, span_end, span_tokens)`` — the removal
    plan a trainer applies (or audits) before packing. Within-document
    repetition alone does NOT mark a window (that signal lives in
    ``repetition_features``); the contract here is cross-document sharing.
    """
    windows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(window_digests(text_col, n)).alias("pos", "h"),
    )
    # appears-in-≥2-docs without COUNT(DISTINCT): min≠max over doc ids.
    dup = (
        windows.groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("h")
    )
    dup_windows = windows.join(dup, "h", "left_semi").select("doc_id", "pos")
    return _merge_windows_to_spans(dup_windows, n)


def span_dedup_stats(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span summary: how much of each document is
    covered by cross-document duplicated spans. Docs with no duplicated
    span are kept (zero coverage) via a left join — the output is one row
    per input document, the shape a filter stage consumes."""
    spans = duplicated_spans(docs, n, id_col, text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )
    from bbt_etl_dw_spark.operators.textstats import whitespace_token_count

    # token counting delegates to the ONE tokenizer the pipeline uses —
    # the raw split this replaced counted blank/whitespace-only docs as
    # 1 token ([''] has size 1) while every other consumer says 0
    # (review finding).
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        whitespace_token_count(text_col).alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        )
        .withColumn(
            "dup_fraction",
            (
                F.col("dup_tokens").cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1).cast("long"))
            ),
        )
    )


# --- incremental (append-time) span dedup ---------------------------------


def span_corpus_index(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The standing state for append-time span dedup: the corpus's
    DISTINCT window digests — one 16-hex string per unique n-token
    window, no positions, no text. Append-only (union new batches'
    digests); at 100TB this is the compact fingerprint table the ingest
    loop probes, same lifecycle as the MinHash corpus index."""
    return docs.select(
        F.explode(window_digests(text_col, n)).alias("h")
    ).distinct()


def _merge_windows_to_spans(dup_windows: DataFrame, n: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated windows (doc_id, pos) into
    maximal spans — shared by the full-corpus and incremental paths.
    Delegates to the general operator (operators/intervals.py): a window
    at token ``pos`` covers [pos, pos+n-1], and runs merge when
    consecutive window starts are within n of each other — i.e. interval
    touch with gap=1 (pos > frontier + 1 breaks, identical to the
    original pos > prev + n test since frontier = prev + n - 1 under
    fixed width)."""
    from bbt_etl_dw_spark.operators.intervals import merge_intervals

    ivals = dup_windows.select(
        "doc_id",
        F.col("pos").cast("long").alias("w_start"),
        (F.col("pos") + (n - 1)).cast("long").alias("w_end"),
    )
    return merge_intervals(ivals, ["doc_id"], "w_start", "w_end", gap=1).select(
        "doc_id",
        F.col("island_start").alias("span_start"),
        F.col("island_end").alias("span_end"),
        (F.col("island_end") - F.col("island_start") + 1).alias("span_tokens"),
    )


def incremental_span_dedup(
    index: DataFrame,
    batch: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append-time span dedup: maximal duplicated spans of the BATCH
    documents, where a window is duplicated if it exists in the corpus
    index OR in ≥2 distinct batch documents. The corpus text is never
    read — only its digest index — so each append costs O(batch), the
    ingest shape incremental_exact_dedup / incremental_minhash_* follow.
    Same output schema as :func:`duplicated_spans`."""
    bw = batch.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(window_digests(text_col, n)).alias("pos", "h"),
    )
    in_batch = (
        bw.groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("h")
    )
    # no distinct(): the union is only a LEFT-SEMI build side, where
    # duplicate rows change nothing — deduplicating the corpus-scale
    # index added a full extra shuffle per batch for zero semantic
    # effect, undercutting the O(batch) append contract (review finding)
    dup = index.select("h").union(in_batch)
    dup_windows = bw.join(dup, "h", "left_semi").select("doc_id", "pos")
    return _merge_windows_to_spans(dup_windows, n)
