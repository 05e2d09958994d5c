"""End-to-end corpus curation: the training-data operators composed into
ONE lazy plan — the product shape a data team actually runs, mirroring
how plans/pipeline.py composes the reference's warehouse stages.

Stage precedence (each document gets at most ONE drop reason — the first
that applies, so stage counts are additive and auditable):

1. ``exact_dup``     — not the min-id representative of its normalized-
                       text fingerprint (operators/dedup semantics).
2. ``low_quality``   — composite quality score below the threshold
                       (operators/textstats.quality_score).
3. ``contaminated``  — shares >max_hits distinct word n-grams with the
                       eval set (operators/decontam semantics).
Survivors get a deterministic train/valid/test split assignment.

Scale shape: fingerprint dedup is one digest-keyed aggregate + join
(text never shuffles); quality is a narrow expression; decontamination
broadcasts the eval n-gram set; the disposition is a when-ladder over
those three signals — no stage re-reads the corpus, and the whole thing
is one Catalyst plan, so column pruning and filter pushdown cross stage
boundaries exactly like the warehouse pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.decontam import contamination_hits
from bbt_etl_dw_spark.operators.textstats import (
    assign_split,
    md5_fingerprint,
    quality_score,
)


@dataclass
class CurationResult:
    disposition: DataFrame  # doc_id, kept, drop_reason, quality_score, split
    kept: DataFrame  # surviving documents (original columns + split)


def run_curation_pipeline(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.7,
    ngram_n: int = 4,
    max_hits: int = 0,
) -> CurationResult:
    """Compose exact dedup → quality filter → decontamination → split
    into one disposition plan. See module docstring for precedence and
    the scale shape of each stage. NOT fully lazy since r14: the min-id
    representative map is checkpointed at construction time (one eager
    corpus pass) so the dedup aggregation does not re-run inside the
    disposition join; everything else composes lazily."""
    ids = F.col(id_col)

    # NULL-text docs get a sentinel fingerprint: md5(NULL) is NULL, the
    # equi-join back to keepers never matches NULL keys, and such docs
    # silently vanished from BOTH disposition and kept — breaking the
    # every-doc-gets-a-disposition-row contract (review finding). Under
    # the sentinel they dedup against each other (text-less docs are
    # mutually exact duplicates) and flow through every stage.
    fp = F.coalesce(md5_fingerprint(text_col), F.lit("<null-text>"))
    with_fp = docs.select(ids, F.col(text_col), fp.alias("fp"))
    # the min-id representative map is (fp -> keep_id) — fingerprint
    # grain, no text — so one checkpoint keeps the dedup aggregation
    # (and its corpus scan) from re-running inside the disposition join
    # (r14 plan audit: documents scanned 4x in doc_curation_pipeline,
    # 3 is the floor while with_fp deliberately stays unmaterialized —
    # it carries the raw text).
    from bbt_etl_dw_spark.operators.ckpt import materialize

    keepers = materialize(with_fp.groupBy("fp").agg(F.min(ids).alias("keep_id")))
    # check_broadcast=False keeps this ONE lazy Catalyst plan (the
    # guard's eager jobs otherwise run at plan-construction time); the
    # standalone decontamination operator keeps the loud guard
    hits = contamination_hits(
        docs, eval_df, id_col, text_col, n=ngram_n, check_broadcast=False
    ).filter(F.col("n_eval_grams_hit") > max_hits)

    disposition = (
        with_fp.join(keepers, "fp")
        .join(F.broadcast(hits.select(ids, F.lit(True).alias("_hit"))), id_col, "left")
        .select(
            ids,
            quality_score(text_col),
            F.when(ids != F.col("keep_id"), "exact_dup")
            .when(quality_score(text_col) < min_quality, "low_quality")
            .when(F.col("_hit"), "contaminated")
            .alias("drop_reason"),
        )
        .select(
            ids,
            F.col("drop_reason").isNull().alias("kept"),
            "drop_reason",
            "quality_score",
            F.when(F.col("drop_reason").isNull(), assign_split(id_col)).alias(
                "split"
            ),
        )
    )
    kept = docs.join(
        disposition.filter("kept").select(ids, "split"), id_col
    )
    return CurationResult(disposition=disposition, kept=kept)
