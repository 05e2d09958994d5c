"""Character n-gram language-model quality scoring — the KenLM-style
perplexity filter of a pre-training pipeline, expressed engine-native.

The classic curation step: train a small LM on a trusted reference corpus
(Wikipedia-like), score every crawled document by cross-entropy under that
model, and drop the tail — gibberish, boilerplate soup, wrong-charset text
all score high. Real pipelines use KenLM over word 5-grams; character
trigrams with add-k smoothing give the same discriminative signal with a
BOUNDED vocabulary (|charset|^n), which is what makes this Spark-native
version scale:

- TRAINING is one explode + hash-agg over the reference corpus (which is
  small by definition — the trusted set, not the crawl);
- the model (trigram + bigram-prefix counts) is broadcast to the scorers:
  the 100 TB crawl NEVER shuffles — each doc's n-grams join the model
  map-side and reduce to one number per doc in partial aggregation;
- n-gram extraction is a pure ``transform(sequence(...))`` expression
  (no UDF); normalization is lower() + whitespace collapse in codegen.

Scores are bits per character (base-2 cross-entropy). No DuckDB oracle on
purpose: log2 last-ulp behavior differs across libm builds (the same
reason doc_token_drift_chisq uses chi-square) — evidence is pytest
ground-truth ordering: English-like text scores below shuffled noise under
an English-trained model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.ckpt import materialize

# the ONE canonical normalization (r07 review: a verbatim private copy
# here could drift from the fingerprint/shingle normalization the LM is
# supposed to share)
from bbt_etl_dw_spark.operators.textstats import normalize_text as _normalized

BOS = "\x02"  # padded document start: first real char gets a context too


def _char_ngrams(text_col: str, n: int):
    """Array of all character n-grams of the normalized, BOS-padded text.
    Pure expression: sequence + transform + substring."""
    padded = F.concat(F.lit(BOS * (n - 1)), _normalized(text_col))
    L = F.length(padded)
    return F.when(L < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), L - n + 1),
            lambda i: padded.substr(i, F.lit(n)),
        )
    )


def train_char_lm(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> tuple[DataFrame, DataFrame, int]:
    """Train on a trusted corpus: returns (ngram_counts, prefix_counts,
    vocab_size). ``vocab_size`` = distinct characters seen (for add-k
    smoothing's denominator) — computed from the same pass family."""
    grams = docs.select(
        F.explode(_char_ngrams(text_col, n)).alias("ngram")
    )
    ngram_counts = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("ngram_count")
    )
    prefix_counts = grams.select(
        F.substring(F.col("ngram"), 1, n - 1).alias("prefix")
    ).groupBy("prefix").agg(F.count(F.lit(1)).alias("prefix_count"))
    vocab = (
        docs.select(
            F.explode(F.split(_normalized(text_col), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .agg(F.countDistinct("ch").alias("v"))
        .first()["v"]
    )
    return ngram_counts, prefix_counts, int(vocab or 1)


def score_char_lm(
    docs: DataFrame,
    ngram_counts: DataFrame,
    prefix_counts: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: float = 0.5,
    check_broadcast: bool = True,
) -> DataFrame:
    """Bits-per-character cross-entropy of each document under the trained
    model, add-k smoothed: P(gram) = (c(gram)+k) / (c(prefix)+k*V).

    Plan shape: explode doc n-grams (narrow), LEFT join the BROADCAST
    model tables (unseen grams smooth to k/(k*V) mass), one hash-agg back
    to per-doc mean. The corpus shuffles once, on the doc id, already
    reduced to (id, partial sums). Documents EMPTY after normalization
    have no n-grams (BOS padding gives every non-empty doc at least one)
    and score NULL — no evidence either way; callers decide their fate.

    The 100TB contract is that the MODEL fits a broadcast (bounded by the
    reference corpus's distinct n-grams, NOT by the scored crawl); that
    assumption is checked loudly (``check_broadcast``) — a reference
    corpus with an unbounded charset would otherwise OOM executors three
    stages in. The count tables are localCheckpoint'ed BEFORE the check,
    so the (lazy, reference-corpus-sized) training plans execute exactly
    once and the guard aggregates plus the scoring join all reuse that
    materialization — the check itself then costs one model-sized
    aggregate, not extra training passes. Pass ``check_broadcast=False``
    in loops that re-score under an already-validated model."""
    if check_broadcast:
        from bbt_etl_dw_spark.operators.guards import assert_broadcastable

        remedy = (
            "shrink the model (lower n, or prune rare n-grams with a "
            "min-count floor before scoring) or replace the broadcast "
            "model join with a shuffle join"
        )
        ngram_counts = assert_broadcastable(
            materialize(ngram_counts), "char-LM ngram_counts", remedy
        )
        prefix_counts = assert_broadcastable(
            materialize(prefix_counts), "char-LM prefix_counts", remedy
        )
    grams = docs.select(
        F.col(id_col), F.explode(_char_ngrams(text_col, n)).alias("ngram")
    ).withColumn("prefix", F.substring(F.col("ngram"), 1, n - 1))
    joined = grams.join(F.broadcast(ngram_counts), "ngram", "left").join(
        F.broadcast(prefix_counts), "prefix", "left"
    )
    kv = float(k) * float(vocab_size)
    prob = (F.coalesce(F.col("ngram_count"), F.lit(0)).cast("double") + F.lit(float(k))) / (
        F.coalesce(F.col("prefix_count"), F.lit(0)).cast("double") + F.lit(kv)
    )
    scored = joined.groupBy(id_col).agg(
        (-F.avg(F.log2(prob))).alias("bits_per_char"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    return docs.select(id_col).join(scored, id_col, "left")


def lm_quality_filter(
    docs: DataFrame,
    ngram_counts: DataFrame,
    prefix_counts: DataFrame,
    vocab_size: int,
    max_bits_per_char: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Keep documents scoring at or below the threshold. Unscorable
    (empty-after-normalization) documents are DROPPED — an empty document
    carries no trainable signal anyway, and silent pass-through of
    unscored rows is the worse failure."""
    scores = score_char_lm(
        docs, ngram_counts, prefix_counts, vocab_size, id_col, text_col, n
    )
    keep = scores.filter(
        F.col("bits_per_char") <= max_bits_per_char
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def oov_rate_vs_reference(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    check_broadcast: bool = True,
) -> DataFrame:
    """Out-of-vocabulary n-gram rate against a reference corpus: the
    fraction of each document's character n-grams never seen in
    ``reference``. The integer-count sibling of :func:`score_char_lm` —
    same discriminative use (high OOV rate = wrong charset / gibberish /
    wrong language), but built from counts and ONE IEEE division, so it
    is bit-reproducible cross-engine (the suite oracle replays it in SQL;
    log-based cross-entropy cannot be oracled — libm last-ulp drift).

    Plan shape: the reference's distinct n-gram set is broadcast (bounded
    by |charset|^n); the scored corpus explodes to n-grams, joins
    map-side, and reduces to (id, total, oov) in partial aggregation —
    one shuffle on the doc id. Documents with no n-grams (empty text)
    return n_grams=0 and NULL rate.

    Membership only needs a FINGERPRINT, not the n-gram string: both
    sides hash to xxhash64 longs before the model's distinct, so its
    shuffle carries fixed 8-byte keys instead of variable-length UTF-8
    n-grams (VERDICT r08 #8 — the one plan-shape lever on this query),
    and the broadcast hash table keys/compares longs. A false OOV "hit"
    needs an exact 64-bit collision between a document n-gram and a
    reference n-gram — at a generous 2^30-entry reference vocabulary the
    per-gram odds are ~2^-34 and the expected error on a rate averaged
    over a document is far below the double's own rounding; acceptable
    for a statistical quality signal."""
    model = (
        reference.select(F.explode(_char_ngrams(text_col, n)).alias("ngram"))
        .select(F.xxhash64("ngram").alias("ngram_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if check_broadcast:
        from bbt_etl_dw_spark.operators.guards import assert_broadcastable

        # Validate the broadcast contract loudly, then reuse the guard's
        # materialization: localCheckpoint keeps the distinct n-gram set
        # from executing a second time in the scoring plan, so the check
        # is net ~free here.
        model = assert_broadcastable(
            materialize(model),
            "OOV reference n-gram set",
            "shrink the reference vocabulary (lower n, or restrict the "
            "reference corpus's charset) or replace the broadcast model "
            "join with a shuffle join",
        )
    # explode_outer keeps one NULL-gram row for gramless (empty-text)
    # documents, so every doc survives the aggregation and the old
    # re-join of the doc-id list back onto the scores — a second corpus
    # scan plus a doc-id shuffle and sort-merge join — is gone (r14 plan
    # audit: 2 Exchange + 1 SMJ removed, one scan instead of two). A NULL
    # hash key never matches the broadcast model, so the _hit logic needs
    # only the isNotNull guards below to keep gramless rows out of both
    # counters; n_grams=0 then yields a NULL rate exactly as the old
    # left-join shape (and the oracle) did.
    grams = docs.select(
        F.col(id_col), F.explode_outer(_char_ngrams(text_col, n)).alias("ngram")
    ).select(
        F.col(id_col),
        F.when(
            F.col("ngram").isNotNull(), F.xxhash64("ngram")
        ).alias("ngram_h"),
    )
    scored = (
        grams.join(F.broadcast(model), "ngram_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("ngram_h")).alias("n_grams"),
            F.sum(
                F.when(
                    F.col("ngram_h").isNotNull() & F.col("_hit").isNull(), 1
                ).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return scored.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.when(
            F.col("n_grams") > 0,
            F.col("n_oov").cast("double") / F.col("n_grams").cast("double"),
        ).alias("oov_rate"),
    )


def update_char_lm(
    model: tuple[DataFrame, DataFrame, int],
    new_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> tuple[DataFrame, DataFrame, int]:
    """Incrementally fold a new batch of trusted documents into a trained
    model — O(batch) work: the batch's counts merge into the existing
    count tables by key (union + sum), the corpus that trained the model
    is never re-read. The count tables are the ENTIRE model state, so
    incremental == retrain-from-scratch exactly (pytest-asserted), unlike
    smoothed-probability caches which cannot merge."""
    ngram_counts, prefix_counts, vocab = model
    d_ng, d_pf, d_v = train_char_lm(new_docs, text_col, n)
    merged_ng = (
        ngram_counts.unionByName(d_ng)
        .groupBy("ngram")
        .agg(F.sum("ngram_count").alias("ngram_count"))
    )
    merged_pf = (
        prefix_counts.unionByName(d_pf)
        .groupBy("prefix")
        .agg(F.sum("prefix_count").alias("prefix_count"))
    )
    # vocab = |union of charsets|, which max(old, new) would UNDERCOUNT
    # ({a,b} ∪ {b,c} has 3). Every corpus character appears in at least
    # one n-gram (BOS padding guarantees it), so the exact union derives
    # from the MERGED n-gram table — bounded by |charset|^n, never a
    # corpus re-read. BOS itself is excluded (train_char_lm counts only
    # text characters).
    merged_v = (
        merged_ng.select(F.explode(F.split(F.col("ngram"), "")).alias("ch"))
        .filter((F.col("ch") != "") & (F.col("ch") != BOS))
        .agg(F.countDistinct("ch").alias("v"))
        .first()["v"]
    )
    return merged_ng, merged_pf, int(merged_v or max(vocab, d_v))
