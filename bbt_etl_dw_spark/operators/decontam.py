"""Train/eval n-gram decontamination.

Standard training-data hygiene (the GPT-3 / Gopher / Llama papers'
"13-gram overlap" check): any training document sharing an n-gram with the
held-out evaluation set is flagged (and usually dropped or redacted) so
benchmark numbers aren't inflated by memorized test data. The reference
repo has no equivalent — this is part of the engine's LLM-pipeline
extension surface (SURVEY §2.6/§6).

Scale shape (the whole point at 100TB):

- The EVAL side is tiny (benchmarks are MBs) ⇒ its distinct n-gram set is
  built once and broadcast; the train side then runs as a narrow
  map + broadcast-hash join — the corpus text is NEVER shuffled.
- With ``broadcast_eval=False`` (eval too big to broadcast) the join
  shuffles (gram → doc) pairs hashed on the gram string; partial distinct
  aggregation on (doc, gram) keeps the exchange bounded by the true
  overlap, not the corpus size.
- Counting hits uses ``countDistinct`` AFTER the join rather than
  pre-deduplicating each side, so the only full shuffle is the final
  per-doc aggregate of matched grams (usually minuscule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.ckpt import materialize

from bbt_etl_dw_spark.operators.textstats import word_ngrams


def eval_ngram_set(eval_df: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Distinct n-grams of the evaluation corpus — the contamination
    blocklist. One column ``gram``."""
    return (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("gram")).distinct()
    )


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    broadcast_eval: bool = True,
    check_broadcast: bool = True,
) -> DataFrame:
    """Per-train-document count of DISTINCT eval n-grams it contains.
    Returns (id_col, n_eval_grams_hit) for contaminated docs only.

    With ``broadcast_eval`` the blocklist's fits-a-broadcast contract is
    checked loudly first (guards.assert_broadcastable — the same contract
    the LM model tables carry): an eval corpus too big to broadcast
    raises naming the remedy (``broadcast_eval=False``) instead of
    OOMing executors mid-join. The guard's materialization is reused via
    localCheckpoint, so the check costs one blocklist-sized aggregate.
    ``check_broadcast=False`` skips the (EAGER) guard for callers that
    must stay one lazy plan — plans/curation.py, whose single-Catalyst-
    plan contract the guard's plan-build-time jobs were breaking (review
    finding)."""
    grams = eval_ngram_set(eval_df, text_col, n)
    if broadcast_eval and check_broadcast:
        from bbt_etl_dw_spark.operators.guards import assert_broadcastable

        grams = F.broadcast(
            assert_broadcastable(
                materialize(grams),
                "decontamination eval n-gram blocklist",
                "pass broadcast_eval=False (shuffle join) or raise n / "
                "shrink the eval corpus",
            )
        )
    elif broadcast_eval:
        grams = F.broadcast(grams)
    exploded = train.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    return (
        exploded.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_eval_grams_hit"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    max_hits: int = 0,
    broadcast_eval: bool = True,
    broadcast_hits: bool = True,
) -> DataFrame:
    """Drop training docs with more than ``max_hits`` distinct eval
    n-grams (default: any overlap). Left-anti join on the hit set — the
    surviving corpus is never widened or shuffled when the hit set
    broadcasts.

    The contaminated-id set is UNBOUNDED (common n-grams can contaminate
    a large share of a web corpus), so the broadcast hint is guarded by
    ``assert_broadcastable`` (r07 review): a hit set past the broadcast
    budget raises loudly with ``broadcast_hits=False`` as the remedy —
    then the anti join shuffles the corpus once instead of OOMing the
    driver with a forced hash relation."""
    from bbt_etl_dw_spark.operators.guards import assert_broadcastable

    hits = contamination_hits(
        train, eval_df, id_col, text_col, n, broadcast_eval
    ).filter(F.col("n_eval_grams_hit") > max_hits)
    ids = hits.select(id_col)
    if broadcast_hits:
        ids = F.broadcast(
            assert_broadcastable(
                ids,
                label="decontaminate contaminated-id set",
                remedy="pass broadcast_hits=False (corpus anti-joins "
                "via one shuffle)",
            )
        )
    return train.join(ids, id_col, "left_anti")
