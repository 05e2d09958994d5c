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
sides co-partition on src) plus one aggregation on dst. The iteration
count is a fixed small constant, so the lazy plan composes without
checkpointing; for deep iteration counts reuse the per-round
checkpoint pattern from dedup_clusters.

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

    # p0 = 1/N for every vertex
    ranks = v.crossJoin(F.broadcast(n_df)).select(
        "_vid", (F.lit(1.0) / F.col("_n").cast("double")).alias("_p")
    )

    srcs = e.select("_src").distinct()
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
        ranks = (
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
