"""PageRank over an edge list — iterative graph linear algebra as pure
DataFrame ops (Brin & Page 1998; the Pregel-in-DataFrames pattern).

The second iterative-algorithm family in the engine (after the
connected-components clustering in operators/dedup.dedup_clusters):
rank mass flows along out-edge weight fractions with damping, dangling
mass redistributed uniformly.

    p'(v) = (1-d)/N  +  d·Σ_{u→v} p(u)·w(u,v)/out(u)  +  d·D/N

where D is the total rank held by dangling nodes (no out-edges).

Scale design: the rank vector is one row per vertex, partitioned by
vertex id; each iteration is ONE keyed join (edges ⋈ ranks on src — at
dim-scale vertex counts the rank side broadcasts; at web scale both
sides co-partition on src) plus one aggregation on dst. Edge fractions
are materialized once and the rank vector once per iteration (the
dedup_clusters per-round truncation discipline): the loop references
the rank vector three times per iteration, so a lazy composition grows
3^iters subtrees — not iters — and re-executes the caller's entire
edge pipeline dozens of times even at iters=3 (r14 plan audit).

Cross-engine determinism: edge-weight fractions and the damping
arithmetic are fixed IEEE sequences over exact-decimal sums (cross-row
Σ uses the decimal discipline from functions/numeric.py; per-edge
products are single roundings), so every iteration — and therefore the
final vector — is bit-identical in the SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import dsum


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    ``vertices`` carries one row per node (``id_col``); ``edges`` carries
    (src, dst, weight>0). Self-loops are legal. Returns (id_col,
    pagerank) with ranks summing to ~1.

    N is obtained via a one-row count aggregate attached as a broadcast
    scalar — callers registering suite queries over this operator belong
    on the SCALAR_SUBQUERY_ALLOWED list (one-row build side, linear)."""
    d = F.lit(float(damping))
    base = F.lit(1.0 - float(damping))

    v = vertices.select(F.col(id_col).alias("_vid"))
    n_df = v.agg(F.count(F.lit(1)).alias("_n"))
    # n_df is crossJoined into EVERY iteration's rank update: left lazy it
    # re-runs the caller's vertex pipeline once per iteration even with
    # the rank vector materialized (r14 review finding) — one checkpoint
    # of the 1-row scalar ends that
    from bbt_etl_dw_spark.operators.ckpt import materialize

    n_df = materialize(n_df)

    # out-edge weight fractions, computed once: w/out(u) per edge
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    out_w = e.groupBy("_src").agg(dsum(F.col("_w"), "_out"))
    frac = (
        e.join(out_w, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_out")).alias("_frac"))
    )
    # The loop references `frac` once and `ranks` THREE times per
    # iteration (contribution join, dangling anti-join, rank update), and
    # Spark plans every reference independently: left lazy, the subtree
    # count grows 3^iters — the r14 plan audit measured the caller's
    # whole edge pipeline (a 4-table fact join) executing 26x for
    # iters=3. Materialize the edge fractions ONCE and each iteration's
    # rank vector (one row per vertex) — the same per-round truncation
    # discipline as dedup_clusters; the old "fixed small constant, no
    # checkpointing needed" note was wrong because composition is
    # exponential in the per-iteration reference count, not linear.
    frac = materialize(frac)

    # p0 = 1/N for every vertex
    ranks = materialize(
        v.crossJoin(F.broadcast(n_df)).select(
            "_vid", (F.lit(1.0) / F.col("_n").cast("double")).alias("_p")
        )
    )

    # every edge survives the out-weight join (out(u) exists for every
    # edge src), so the src set can ride the materialized fractions
    # instead of re-deriving from the raw edge pipeline each iteration
    srcs = frac.select("_src").distinct()
    for _ in range(iters):
        contrib = (
            frac.join(ranks, frac._src == ranks._vid)
            .select(F.col("_dst"), (F.col("_p") * F.col("_frac")).alias("_c"))
            .groupBy("_dst")
            .agg(dsum(F.col("_c"), "_in"))
        )
        # dangling mass: total rank on vertices with no out-edges
        dangling = (
            ranks.join(srcs, ranks._vid == srcs._src, "left_anti")
            .agg(dsum(F.col("_p"), "_dm"))
        )
        ranks = materialize(
            ranks.join(contrib, ranks._vid == contrib._dst, "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_df))
            .select(
                "_vid",
                (
                    (base + d * F.coalesce(F.col("_dm"), F.lit(0.0)))
                    / F.col("_n").cast("double")
                    + d * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("_p"),
            )
        )
    return ranks.select(F.col("_vid").alias(id_col), F.col("_p").alias("pagerank"))
