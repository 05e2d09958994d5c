"""Text-analysis operators for training-data pipelines.

Pure column expressions (JVM-side, codegen-friendly): language ID,
quality scoring, repetition scoring, token counting, fingerprinting. At
100TB these run as a single narrow map stage over the documents table —
no shuffle, no Python. The one corpus-level op here
(:func:`corpus_vocabulary`) shuffles exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic
# language ID. Real pipelines swap in bigger tables; the operator shape
# (argmax of per-language evidence counts) is what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "des", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "que", "por", "con"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text_col: str) -> Column:
    """Lower-cased whitespace tokens (empty array for blank text)."""
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def whitespace_token_count(text_col: str) -> Column:
    return F.size(words(text_col)).cast("long")


def regex_token_count(text_col: str) -> Column:
    """Sub-word token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def _marker_count(ws: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))


def lang_scores(text_col: str) -> dict[str, Column]:
    ws = words(text_col)
    return {lang: _marker_count(ws, m) for lang, m in LANG_MARKERS.items()}


def lang_id(text_col: str, min_evidence: int = 1) -> Column:
    """Argmax of marker-word evidence; deterministic tie-break by language
    code order; 'und' (undetermined) below ``min_evidence``."""
    scores = lang_scores(text_col)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best >= min_evidence, expr).otherwise(F.lit("und"))


def quality_features(text_col: str) -> dict[str, Column]:
    """Length / punctuation / stopword / word-shape features
    (the usual pre-training quality filters)."""
    t = F.col(text_col)
    ws = words(text_col)
    n_chars = F.length(t).cast("long")
    # avg word length is computed over the NORMALIZED text (single-space
    # separators), where "chars minus one separator per gap" is exact:
    # the raw length counts every blank line / indent as word mass (r07
    # review — a markdown doc's avg_word_len inflated past the [3,12]
    # quality window). n_chars stays the RAW length (the reported size
    # feature), as does punct_ratio's denominator.
    n_norm = F.length(normalize_text(text_col)).cast("long")
    n_words = F.size(ws).cast("long")
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("long")
    n_stop = _marker_count(ws, STOPWORDS).cast("long")
    safe_words = F.greatest(n_words, F.lit(1).cast("long"))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": (n_norm - (n_words - 1)) / safe_words,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1).cast("long")),
        "stopword_ratio": n_stop / safe_words,
    }


def quality_score(text_col: str) -> Column:
    """Composite [0,1]-ish quality score: enough length, sane word length,
    some stopwords (fluency proxy), not punctuation soup. Weights are
    illustrative; the operator is the deterministic expression shape."""
    f_ = quality_features(text_col)
    len_ok = F.when(f_["n_words"] >= 20, 1.0).when(f_["n_words"] >= 5, 0.5).otherwise(0.0)
    wordlen_ok = F.when((f_["avg_word_len"] >= 3) & (f_["avg_word_len"] <= 12), 1.0).otherwise(0.0)
    stop_ok = F.when(f_["stopword_ratio"] >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(f_["punct_ratio"] <= 0.2, 1.0).otherwise(0.0)
    return (0.4 * len_ok + 0.2 * wordlen_ok + 0.2 * stop_ok + 0.2 * punct_ok).alias(
        "quality_score"
    )


def normalize_text(text_col: str) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def md5_fingerprint(text_col: str) -> Column:
    """Exact-dup fingerprint: md5 of normalized text (md5 is identical in
    every engine => oracle-checkable, unlike xxhash64)."""
    return F.md5(normalize_text(text_col))


def bind_once(value: Column, build) -> Column:
    """Evaluate ``value`` once and pass it to ``build`` as a lambda
    variable (a poor man's `let`): transform over a 1-element array. An
    expression captured directly in a higher-order-function lambda is
    re-evaluated on EVERY element — for shingles that meant re-running the
    tokenizing regex split once per shingle index."""
    return F.transform(F.array(value), build)[0]


def shingles(text_col: str, k: int = 3) -> Column:
    """Word k-shingles (distinct), the unit set for Jaccard similarity.
    Short texts fall back to the whole normalized text as one shingle.
    The words array is bound once; each shingle is a k-slice concat."""

    def build(ws: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ws) - k),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, k)),
        )
        return F.when(F.size(ws) >= k, F.array_distinct(grams)).otherwise(
            F.array(normalize_text(text_col))
        )

    return bind_once(words(text_col), build)


def word_ngrams(text_col: str, n: int) -> Column:
    """Ordered word n-grams WITH duplicates (unlike :func:`shingles`, which
    dedups — repetition scoring needs the multiplicity). Empty array when
    the text has fewer than n words. Pure JVM expression; at 100TB this is
    a narrow map stage."""

    def build(ws: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        )
        return F.when(F.size(ws) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return bind_once(words(text_col), build)


def repetition_features(text_col: str, n: int = 2) -> dict[str, Column]:
    """Gopher-style repetition quality signals: total vs distinct n-gram
    counts and the duplicate-n-gram fraction. Heavily repetitive documents
    (boilerplate, keyword stuffing, decoding loops) score high and are
    filtered before training. Single bound array evaluation, no shuffle."""

    def feats(grams: Column) -> Column:
        t = F.size(grams).cast("long")
        d = F.size(F.array_distinct(grams)).cast("long")
        return F.struct(
            t.alias("n_grams"),
            d.alias("n_distinct_grams"),
            ((t - d).cast("double") / F.greatest(t, F.lit(1).cast("long"))).alias(
                "dup_fraction"
            ),
        )

    s = bind_once(word_ngrams(text_col, n), feats)
    return {
        "n_grams": s["n_grams"],
        "n_distinct_grams": s["n_distinct_grams"],
        "dup_fraction": s["dup_fraction"],
    }


def rolling_fingerprint(text_col: str, k: int = 3) -> Column:
    """Document fingerprint: minimum shingle hash (winnowing-style 'rolling
    hash' selection — robust to local edits, unlike the whole-text md5).
    md5-based and returned as the 16-hex-char prefix so any engine can
    reproduce it (hex strings order like the integers they encode)."""
    hashed = F.transform(shingles(text_col, k), lambda s: F.substring(F.md5(s), 1, 16))
    return F.array_min(hashed)


def corpus_vocabulary(
    docs, id_col: str = "doc_id", text_col: str = "text", top_k: int = 50
):
    """Corpus-level vocabulary: per-word total occurrences and document
    frequency, top-k by doc_freq (fully tie-broken => deterministic set).
    One exchange: explode is a narrow map, ``count_distinct`` runs with
    partial (map-side) distinct aggregation, and the top-k is a
    TakeOrdered — no global sort of the vocabulary."""
    from pyspark.sql import functions as _F

    w = docs.select(_F.col(id_col), _F.explode(words(text_col)).alias("word"))
    return (
        w.groupBy("word")
        .agg(
            _F.count_distinct(id_col).alias("doc_freq"),
            _F.count(_F.lit(1)).alias("total_count"),
        )
        .orderBy(_F.desc("doc_freq"), _F.desc("total_count"), "word")
        .limit(top_k)
    )


def split_bucket(id_col: str, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from the md5 of the id — the
    standard train/val/test splitter for training-data pipelines. md5 (not
    xxhash) so ANY engine reproduces the assignment; stable under
    repartitioning, appends, and reruns (unlike rand() or row position)."""
    hex8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % n_buckets).cast("int")


def assign_split(
    id_col: str, train: int = 80, valid: int = 10, n_buckets: int = 100
) -> Column:
    """'train' / 'valid' / 'test' label by hash bucket. ``train`` /
    ``valid`` are PERCENTAGES (remainder test) regardless of
    ``n_buckets`` — thresholds scale by n_buckets/100 (r07 review: the
    raw-bucket comparison silently turned 80% into 8% at
    n_buckets=1000). n_buckets must keep the percentage boundaries on
    whole buckets (a multiple of 100) so the split is exact."""
    if n_buckets % 100:
        raise ValueError(
            f"assign_split: n_buckets={n_buckets} must be a multiple of "
            f"100 so percentage boundaries land on whole buckets"
        )
    per = n_buckets // 100
    b = split_bucket(id_col, n_buckets)
    return (
        F.when(b < train * per, "train")
        .when(b < (train + valid) * per, "valid")
        .otherwise("test")
    )


def hashed_tf_vector(text_col: str, dim: int = 256) -> Column:
    """Feature-hashed term-frequency vector: each word hashes (md5, so any
    engine can re-derive the bucketing) to one of ``dim`` buckets with a
    ±1 sign from a second hash digit (the Weinberger feature-hashing trick
    — signs make colliding words cancel in expectation instead of piling
    up), producing a dense ``array<double>`` ready for the similarity
    family (cosine_near_dups, lsh_topk, random_projection) with NO
    embedding model and NO vocabulary state.

    Entirely expression-level: words → (bucket, sign) pairs →
    map-aggregated counts → densified by one sequence transform. A narrow
    map stage per document; the vocabulary never materializes anywhere.
    At 100 TB this is the "similarity search over raw text" bootstrap:
    hash-vectorize, then hand off to the ANN operators."""

    def build(ws: Column) -> Column:
        # hash each word ONCE, then derive bucket and sign from the digest
        # (two transforms: Catalyst does not CSE the md5 across struct
        # fields within one lambda)
        pairs = F.transform(
            F.transform(ws, lambda w: F.md5(w)),
            lambda d: F.struct(
                (
                    F.conv(F.substring(d, 1, 8), 16, 10).cast("long") % dim
                ).cast("int").alias("b"),
                F.when(
                    F.conv(F.substring(d, 9, 1), 16, 10).cast("int") % 2 == 0,
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                .alias("s"),
            ),
        )
        # bucket -> signed count, via aggregate into a map
        m = F.aggregate(
            pairs,
            F.create_map().cast("map<int,double>"),
            lambda acc, p: F.map_zip_with(
                acc,
                F.create_map(p["b"], p["s"]),
                lambda k, v1, v2: F.coalesce(v1, F.lit(0.0))
                + F.coalesce(v2, F.lit(0.0)),
            ),
        )
        return bind_once(
            m,
            lambda mm: F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(mm[i], F.lit(0.0)),
            ),
        )

    return bind_once(words(text_col), build)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks with
    provenance — the retrieval/embedding preprocessing step (each chunk
    small enough to embed, overlap so no span falls on a boundary).

    Pure expressions: tokens -> stride sequence -> per-chunk slice/join —
    one Generate per document, a narrow map stage, no shuffle, no UDF.
    Chunk start positions stride by ``chunk_tokens - overlap``; the final
    chunk is the one that first reaches the end of the document (no
    degenerate all-tail chunks). Empty/blank/NULL docs produce no chunks.

    Tokens are the raw whitespace split, CASE-PRESERVING (unlike
    :func:`words`): chunk_text feeds an embedder, and lower-casing would
    silently destroy proper nouns / acronyms / code identifiers in every
    chunk while breaking span-level provenance against the source text.

    Output: ``id_col, chunk_idx (0-based), start_token, n_tokens,
    chunk_text`` — enough provenance to map any downstream hit (ANN
    match, dedup span, eval contamination) back to its source offset."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    t = F.trim(F.col(text_col))
    raw_ws = F.when(
        t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))

    def build(ws: Column) -> Column:
        # NULL text => size() is null; coalesce so the no-chunk branch
        # fires instead of greatest(1, null) fabricating a phantom chunk
        n = F.coalesce(F.size(ws), F.lit(0))
        # starts: 0, stride, 2*stride, ... while start + chunk covers new
        # tokens; last start is the smallest multiple of stride with
        # start + chunk_tokens >= n
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(1),
                (
                    F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride) + 1
                ).cast("int"),
            )
        )
        starts = F.when(
            n_chunks > 0,
            F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("int").alias("chunk_idx"),
                s.cast("long").alias("start_token"),
                F.least(F.lit(chunk_tokens), n - s).cast("int").alias("n_tokens"),
                F.concat_ws(" ", F.slice(ws, s + 1, chunk_tokens)).alias("chunk_text"),
            ),
        )

    # bind the split ONCE; referencing it directly inside the per-chunk
    # lambda would re-run the split for every chunk
    chunk = F.explode(bind_once(raw_ws, build))
    return df.select(F.col(id_col), chunk.alias("c")).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def hash_uniform(id_col: str, salt: str = "") -> Column:
    """Deterministic U[0,1) per id: md5-derived 48-bit fraction. The
    repartition/rerun-stable replacement for rand() in any sampling
    decision (same contract as split_bucket, continuous-valued)."""
    hex12 = F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 12)
    return F.conv(hex12, 16, 10).cast("double") / float(16**12)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    rate: float = 1.0,
    salt: str = "ws",
) -> DataFrame:
    """Probability-proportional-to-weight sampling, deterministically:
    keep a row iff hash_uniform(id) < rate * weight (weights in [0, 1] —
    e.g. a quality score). The same corpus always yields the same sample
    at any parallelism, across reruns, and after appends (new rows decide
    independently; old decisions never flip) — the properties rand()-based
    sampling lacks and a reproducible training run needs. One narrow
    filter, no shuffle."""
    return df.filter(hash_uniform(id_col, salt) < F.lit(rate) * weight)


def token_mix_rates(
    docs: DataFrame,
    target_shares: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source keep-rates that steer the corpus toward a target TOKEN
    mixture (the 'data mixing' step of a pre-training pipeline: e.g. 30%
    web, 40% code, 30% books — by tokens, not documents).

    For each source: available_i = its token count; the achievable total
    is limited by the scarcest source relative to its target share
    (T = min_i available_i / share_i); keep_rate_i = share_i * T /
    available_i <= 1 — i.e. the scarcest source keeps everything and
    over-represented sources downsample. One aggregation over the corpus
    (token counting is a narrow map); the returned frame is dim-sized.
    Feed the rates to :func:`weighted_sample`-style hash filtering via
    :func:`apply_token_mix`."""
    counts = docs.groupBy(source_col).agg(
        F.sum(whitespace_token_count(text_col)).alias("available_tokens")
    )
    # Fail LOUDLY on target sources absent from the corpus: silently
    # renormalizing over the remaining sources would train the wrong
    # mixture (e.g. the 40%-code target quietly becoming 0% because an
    # upstream filter broke) and only surface at training time. The check
    # collects the dim-sized per-source counts — one tiny job — and the
    # downstream arithmetic is REBUILT from the collected rows: keeping
    # the lazy `counts` plan would re-run the whole corpus token pass a
    # second time when the rates frame is consumed (review finding).
    collected = counts.collect()
    avail = {r[0]: r[1] for r in collected}
    counts = docs.sparkSession.createDataFrame(
        collected, schema=counts.schema
    )
    # A source PRESENT with zero total tokens (e.g. all-blank docs after an
    # upstream filter) is the same failure as an absent one — and worse if
    # let through: T = min(available/share) becomes 0, silently emptying
    # the entire mixed corpus (its own rate would be 0/0 = NaN).
    missing = sorted(
        s for s in target_shares if avail.get(s) is None or avail[s] == 0
    )
    if missing:
        raise ValueError(
            f"target_shares name sources with zero corpus tokens: {missing} "
            f"(present: {sorted(k for k, v in avail.items() if v)})"
        )
    shares = F.create_map(
        *[x for k, v in target_shares.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    withs = counts.withColumn("share", shares[F.col(source_col)]).filter(
        F.col("share").isNotNull()
    )
    # achievable total T = min(available_i / share_i): one tiny agg
    t = withs.agg(
        F.min(F.col("available_tokens") / F.col("share")).alias("t")
    )
    return (
        withs.crossJoin(F.broadcast(t))
        .select(
            source_col,
            "available_tokens",
            "share",
            F.least(
                F.lit(1.0),
                (F.col("share") * F.col("t")) / F.col("available_tokens"),
            ).alias("keep_rate"),
        )
    )


def apply_token_mix(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Downsample each source at its :func:`token_mix_rates` keep-rate via
    the deterministic hash filter. rates is dim-sized → broadcast join;
    the corpus passes through one narrow filter stage."""
    r = F.broadcast(rates.select(source_col, "keep_rate"))
    return (
        docs.join(r, source_col)
        .filter(hash_uniform(id_col, salt) < F.col("keep_rate"))
        .drop("keep_rate")
    )


def collocation_lift(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Bigram collocation strength as LIFT — observed bigram probability
    over the independence expectation of its two words:

        lift(x,y) = (n_xy / N_bigrams) / ((n_x / N_tokens) · (n_y / N_tokens))

    This is PMI without the closing log: log is monotone, so the
    collocation RANKING is identical to PMI's, and the ratio stays inside
    correctly-rounded IEEE ops — the same no-log-in-oracles discipline as
    doc_token_drift_chisq / BM25-odds. Callers wanting textbook PMI take
    log2(lift) themselves (one map; not oracle-able).

    Scale: one explode for bigrams + one for unigrams, each reducing in
    hash aggregation; the min_count filter prunes the bigram table BEFORE
    its two vocabulary joins; corpus totals attach as one-row broadcast
    scalars. Nothing is ever quadratic in vocabulary or corpus.

    Output: (bigram, n_xy, n_x, n_y, lift), one row per surviving bigram.
    """
    # both count tables are materialized: `big_all` feeds the min-count
    # filter AND the bigram total, `uni` feeds the token total AND two
    # vocabulary joins — composed lazily the bigram explode ran 2x and
    # the unigram explode 3x over the corpus (r14 plan audit of
    # doc_pmi_collocations: 5 corpus scans for 2 irreducible passes).
    # Both frames are vocabulary-sized aggregates, never corpus-sized.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    grams = docs.select(F.explode(word_ngrams(text_col, 2)).alias("bigram"))
    big_all = materialize(
        grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_xy"))
    )
    big = big_all.filter(F.col("n_xy") >= min_count)
    toks = docs.select(F.explode(words(text_col)).alias("word"))
    uni = materialize(toks.groupBy("word").agg(F.count(F.lit(1)).alias("n_w")))
    # corpus totals fold the ALREADY-BUILT count tables (vocab-sized
    # aggregates; r07 review: agg over `grams`/`toks` re-exploded and
    # re-tokenized the full corpus twice — doubling the most expensive
    # stages for identical values, since Σ group counts == total count)
    totals = big_all.agg(F.sum("n_xy").alias("nb")).crossJoin(
        uni.agg(F.sum("n_w").alias("nt"))
    )
    x = F.split(F.col("bigram"), " ")[0]
    y = F.split(F.col("bigram"), " ")[1]
    joined = (
        big.withColumn("_x", x)
        .withColumn("_y", y)
        .join(uni.select(F.col("word").alias("_x"), F.col("n_w").alias("n_x")), "_x")
        .join(uni.select(F.col("word").alias("_y"), F.col("n_w").alias("n_y")), "_y")
        .crossJoin(F.broadcast(totals))
    )
    nxy_d = F.col("n_xy").cast("double")
    nb_d = F.col("nb").cast("double")
    nt_d = F.col("nt").cast("double")
    nx_d = F.col("n_x").cast("double")
    ny_d = F.col("n_y").cast("double")
    lift = ((nxy_d * nt_d) * nt_d) / ((nb_d * nx_d) * ny_d)
    return joined.select("bigram", "n_xy", "n_x", "n_y", lift.alias("lift"))
