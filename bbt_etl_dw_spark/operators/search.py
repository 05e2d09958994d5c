"""Ranked document retrieval: BM25 scoring of a term query over the
corpus, the search shape a training-data curation stack uses for
targeted corpus probes (find the documents most about X) and that the
reference's aggregate surface has no analog for.

Scale design: the corpus explodes to tokens ONCE, filtered to the query
terms BEFORE any shuffle (an IN-list predicate that pushes into the
scan-side project), so the per-term frequency aggregation touches
O(matching tokens), not the corpus. Document length is a per-row
expression (no join); the corpus-global state is two scalars (N, avgdl)
and one df row per query term — all broadcast. The final top-k is
``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject, a
per-partition heap + driver merge of k rows, NOT a global sort.

Cross-engine determinism: the standard BM25 idf is a logarithm, and
libm last-ulp drift makes log non-oracle-able (the doc_lm_oov_rate /
doc_token_drift_chisq precedent). ``idf='odds'`` therefore scores with
the RAW odds ratio (N - df + 0.5)/(df + 0.5) — the quantity BM25 takes
the log of. Per-term rankings are identical (log is monotone); the
multi-term sum weights high-idf terms more than log-BM25 would, which
is documented, deterministic behavior — every arithmetic step is a
correctly-rounded IEEE op, and the per-term partial scores fold in
FIXED term order (a column pivot, not a SUM aggregate whose order the
scheduler picks). ``idf='log'`` gives textbook BM25 for production use,
minus the bit-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.textstats import words

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    *,
    k1: float = K1,
    b: float = B,
    idf: str = "odds",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for ``query_terms`` under BM25 term saturation.

    Output: (id_col, score, n_terms_hit) ordered by (score desc, id) —
    the id tie-break makes the cut deterministic when scores tie.
    """
    if idf not in ("odds", "log"):
        raise ValueError(f"idf must be 'odds' or 'log', got {idf!r}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # fixed fold order, de-duped

    base = docs.select(
        F.col(id_col).alias("_id"), words(text_col).alias("_ws")
    )
    # NULL text => NULL words array => size() = -1 under Spark's legacy
    # sizeOfNull, which would SUBTRACT from n_tokens and skew avgdl (and
    # diverge from the oracle, whose SUM skips NULLs). Treat NULL text as
    # an empty document on both engines.
    dl = F.when(F.col("_ws").isNull(), F.lit(0)).otherwise(F.size("_ws"))
    # ONE corpus tokenize pass (r14 plan audit: doc lengths, corpus
    # stats, tf and df each re-derived `base`, tokenizing the corpus 4x).
    # The materialized frame is DOC-GRAIN and skinny — the length plus
    # only the query terms present in the doc (array filter BEFORE the
    # explode), never the full token list — so the checkpoint does not
    # carry a tokens-sized intermediate.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    slim = materialize(
        base.select(
            "_id",
            dl.cast("long").alias("dl"),
            F.filter(
                F.col("_ws"),
                lambda w: w.isin(terms),
            ).alias("_qws"),
        )
    )
    lens = slim.select("_id", "dl")
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("n_tokens")
    )

    toks = slim.select("_id", F.explode("_qws").alias("term"))
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("term").agg(F.countDistinct("_id").alias("df"))

    n_d = F.col("n_docs").cast("double")
    avgdl = (F.col("n_tokens").cast("double") / n_d).alias("avgdl")
    scalars = stats.select(F.col("n_docs"), avgdl)

    df_d = F.col("df").cast("double")
    odds = (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    # 'log' uses the Lucene/modern form ln(1 + odds): the bare ln(odds)
    # goes NEGATIVE for terms in more than half the corpus, which makes
    # a matching doc rank below a non-matching one
    idf_col = F.log(F.lit(1.0) + odds) if idf == "log" else odds

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(lens, "_id")
        .crossJoin(F.broadcast(scalars))  # 1-row scalar attach
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * dl_d / F.col("avgdl")
    )
    term_score = idf_col * (tf_d * F.lit(k1 + 1.0)) / denom

    per_term = scored.select("_id", "term", term_score.alias("s"))
    # fixed-order fold: one pivot column per term, added left-to-right
    cols = [
        F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    folded = per_term.groupBy("_id").agg(*cols)
    total = None
    for i in range(len(terms)):
        c = F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        total = c if total is None else total + c
    n_hit = None
    for i in range(len(terms)):
        c = F.when(F.col(f"_s{i}").isNotNull(), 1).otherwise(0)
        n_hit = c if n_hit is None else n_hit + c
    return (
        folded.select(
            F.col("_id").alias(id_col),
            total.alias("score"),
            n_hit.cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def sql_bm25_ctes(
    query_terms: tuple[str, ...],
    *,
    k1: float = K1,
    b: float = B,
    words_sql: str,
    id_sql: str = "doc_id",
) -> str:
    """DuckDB CTE chain replaying :func:`bm25_topk` (odds idf) over
    ``documents``; yields relation ``bm25`` with (doc_id, score,
    n_terms_hit), unranked — the caller adds ORDER BY/LIMIT. Literals
    carry Python's exact double repr so e.g. k1+1 folds identically."""
    terms = list(dict.fromkeys(query_terms))
    # words() splits on whitespace only, so realistic tokens can carry
    # apostrophes ("don't") — escape for the SQL string literals
    esc = [t.replace("'", "''") for t in terms]
    in_list = ", ".join(f"'{t}'" for t in esc)
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN term = '{t}' THEN s END) AS s{i}"
        for i, t in enumerate(esc)
    )
    total = " + ".join(f"COALESCE(s{i}, CAST(0.0 AS DOUBLE))" for i in range(len(terms)))
    nhit = " + ".join(
        f"(CASE WHEN s{i} IS NOT NULL THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    return f"""
base AS (
  SELECT {id_sql} AS _id, {words_sql} AS ws FROM documents
),
lens AS (SELECT _id, CAST(COALESCE(len(ws), 0) AS BIGINT) AS dl FROM base),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS n_tokens,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM lens
),
toks AS (
  SELECT _id, t.term FROM base, UNNEST(ws) AS t(term)
  WHERE t.term IN ({in_list})
),
tf AS (SELECT _id, term, COUNT(*) AS tf FROM toks GROUP BY _id, term),
df_t AS (SELECT term, COUNT(DISTINCT _id) AS df FROM toks GROUP BY term),
per_term AS (
  SELECT tf._id, tf.term,
         ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
          / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         * (CAST(tf.tf AS DOUBLE) * CAST({k1 + 1.0!r} AS DOUBLE))
         / (CAST(tf.tf AS DOUBLE) + CAST({k1!r} AS DOUBLE)
            * (CAST(1.0 AS DOUBLE) - CAST({b!r} AS DOUBLE)
               + CAST({b!r} AS DOUBLE) * CAST(l.dl AS DOUBLE) / s.avgdl)) AS s
  FROM tf JOIN df_t d ON tf.term = d.term
  JOIN lens l ON tf._id = l._id
  CROSS JOIN stats s
),
folded AS (
  SELECT _id,
         {pivots}
  FROM per_term GROUP BY _id
),
bm25 AS (
  SELECT _id AS doc_id, {total} AS score,
         CAST({nhit} AS BIGINT) AS n_terms_hit
  FROM folded
)"""
