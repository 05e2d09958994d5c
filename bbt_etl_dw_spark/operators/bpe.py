"""BPE merge training on Spark — the tokenizer-training side of a
training-data pipeline (Sennrich et al. 2016 byte-pair encoding).

Scale shape (the classical two-level design):

- ONE corpus pass builds the word-frequency table (hash aggregate on the
  word — the only shuffle that sees corpus-sized data). Everything after
  runs on the VOCABULARY (distinct words × frequency), which is orders
  of magnitude smaller than the corpus at any scale.
- Each merge iteration is: weighted adjacent-pair count over the vocab
  (map-side-combined aggregate), a 1-row argmax to the driver (bounded:
  one (pair, count) row per iteration), and a greedy left-to-right pair
  merge applied to the vocab's symbol arrays. k merges = k tiny vocab
  jobs, never another corpus pass.
- Pair merging is a SEQUENTIAL FOLD over the symbol array (greedy
  left-to-right, non-overlapping) — exactly reference BPE's within-
  iteration semantics, including on runs of a repeated symbol:
  "a a a a" merges to "aa aa" in one iteration. (A space-delimited
  string replace, the previous implementation, consumes the shared
  boundary space between adjacent matches and merged only every OTHER
  pair of a run — diverging from any reference BPE on 'aaaa'-like
  words; review finding.) Per-row array folds run in array order on
  every engine, so the merge is bit-reproducible and the SQL oracle
  replays it with the identical fold.

Determinism: ties on pair count break by (left, right) lexicographic
order, so the merge sequence is reproducible on any engine at any
parallelism.

Reference: the BBT-ETL-DW reference has no tokenizer training (its token
ops stop at counting, SURVEY §2.7); this module is part of the
training-data extension surface alongside operators/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.textstats import words

END_OF_WORD = "</w>"

# re-materialize the evolving vocab every N merges: bounds both the
# stacked-fold recompute (O(k*N) instead of O(k^2) fold evaluations) and
# whole-stage-codegen expression depth at large k
_REMAT_EVERY = 16


def word_frequencies(
    docs: DataFrame, text_col: str = "text", word_out: str = "word"
) -> DataFrame:
    """Corpus word-frequency table — the single corpus-sized pass of BPE
    training. Delegates tokenization to textstats.words (lower-cased
    whitespace tokens, EMPTY array for blank text — a raw split counted
    a blank doc as one ''-word and polluted the vocabulary; review
    finding). One hash aggregate."""
    return (
        docs.select(F.explode(words(text_col)).alias(word_out))
        .groupBy(word_out)
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: Column) -> Column:
    """array<string>: character symbols plus the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _merge_pair(arr: Column, lft: str, rgt: str) -> Column:
    """One BPE merge applied to a symbol array: greedy left-to-right fold
    — when the accumulator's last symbol is ``lft`` and the next is
    ``rgt``, replace the pair with the merged symbol (which then cannot
    re-merge with the element that produced it, matching reference
    non-overlapping semantics)."""
    merged = lft + rgt
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lft))
            & (s == F.lit(rgt)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocabulary."""
    s = F.col("sym")

    def pairs(s: Column) -> Column:
        return F.when(
            F.size(s) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(s) - 2),
                lambda i: F.struct(
                    s[i].alias("lft"), s[i + 1].alias("rgt")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<lft:string,rgt:string>>"))

    return (
        vocab.select("freq", F.explode(pairs(s)).alias("p"))
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus. Returns one row
    per merge: ``(merge_rank, lft, rgt, merged, pair_count)`` in learned
    order. Each iteration collects exactly ONE row (the argmax pair) to
    the driver; the vocab-side merge is the greedy array fold.

    Merge folds STACK lazily (iteration r's plan applies r-1 prior folds
    to the materialized base vocab — O(k²) fold evaluations and O(k)
    expression depth if left unchecked), so the vocab re-materializes
    every ``_REMAT_EVERY`` merges: total fold work drops to O(k·m) and
    codegen depth stays bounded at large k (r08 review). Real 30k-merge
    tokenizer training remains a single-machine job by nature — this
    operator's contract is corpus-scale COUNTING with driver-scale k."""
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col).select(
        "freq", _symbols(F.col("word")).alias("sym")
    )
    from bbt_etl_dw_spark.operators.ckpt import materialize

    vocab = materialize(vocab)  # one corpus pass, reused k times
    merges = []
    for rank in range(1, k + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lft, rgt, cnt = top[0]["lft"], top[0]["rgt"], top[0]["pair_count"]
        merges.append((rank, lft, rgt, lft + rgt, cnt))
        vocab = vocab.withColumn("sym", _merge_pair(F.col("sym"), lft, rgt))
        if rank % _REMAT_EVERY == 0:
            vocab = materialize(vocab)
    return spark.createDataFrame(
        merges, "merge_rank int, lft string, rgt string, merged string, pair_count long"
    )


def apply_merges(text_word: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize one word column with a learned merge list: symbolize,
    then apply each merge in learned order (the standard BPE encode).
    Returns the array of resulting tokens. Pure expressions — usable in a
    narrow map stage over a 100TB corpus once training is done."""
    sym = _symbols(text_word)
    for lft, rgt in merges:
        sym = _merge_pair(sym, lft, rgt)
    return sym
