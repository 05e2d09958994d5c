"""BPE merge training on Spark — the tokenizer-training side of a
training-data pipeline (Sennrich et al. 2016 byte-pair encoding).

Scale shape (the classical two-level design):

- ONE corpus pass builds the word-frequency table (hash aggregate on the
  word — the only shuffle that sees corpus-sized data). Everything after
  runs on the VOCABULARY (distinct words × frequency), which is orders
  of magnitude smaller than the corpus at any scale.
- Each merge iteration is: weighted adjacent-pair count over the vocab
  (map-side-combined aggregate), a 1-row argmax to the driver (bounded:
  one (pair, count) row per iteration), and a literal string replace
  applied to the vocab. k merges = k tiny vocab jobs, never another
  corpus pass.
- Pair merging uses left-to-right non-overlapping string replace on the
  space-delimited symbol string — exactly BPE's merge semantics ("a a a"
  merges to "aa a", the overlapping middle pair is consumed), and
  identical in Spark's and DuckDB's ``replace``, which is what makes the
  whole trainer oracle-replayable.

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

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", word_out: str = "word"
) -> DataFrame:
    """Corpus word-frequency table — the single corpus-sized pass of BPE
    training. Lower-cased whitespace words, one hash aggregate."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(words).alias(word_out))
        .groupBy(word_out)
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _padded_symbols(word: Column) -> Column:
    """' c1 c2 ... cN </w> ' — space-delimited character symbols with the
    end-of-word marker, padded so every symbol occurrence (first and last
    included) matches the ' left right ' replace pattern."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.concat(chars, F.array(F.lit(END_OF_WORD)))),
        F.lit(" "),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocabulary."""
    syms = F.split(F.trim(F.col("sym")), " ")

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
        vocab.select("freq", F.explode(pairs(syms)).alias("p"))
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus. Returns one row
    per merge: ``(merge_rank, lft, rgt, merged, pair_count)`` in learned
    order. Each iteration collects exactly ONE row (the argmax pair) to
    the driver; the vocab-side merge is a literal string replace."""
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col).select(
        "freq", _padded_symbols(F.col("word")).alias("sym")
    )
    vocab = vocab.localCheckpoint()  # one corpus pass, reused k times
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
        vocab = vocab.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {lft} {rgt} "),
                F.lit(f" {lft}{rgt} "),
            ),
        )
    return spark.createDataFrame(
        merges, "merge_rank int, lft string, rgt string, merged string, pair_count long"
    )


def apply_merges(text_word: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize one word column with a learned merge list: symbolize,
    then apply each merge in learned order (the standard BPE encode).
    Returns the array of resulting tokens. Pure expressions — usable in a
    narrow map stage over a 100TB corpus once training is done."""
    sym = _padded_symbols(text_word)
    for lft, rgt in merges:
        sym = F.replace(sym, F.lit(f" {lft} {rgt} "), F.lit(f" {lft}{rgt} "))
    return F.split(F.trim(sym), " ")
