"""Graph traversal: multi-source breadth-first hop distances.

The third leg of the graph family — pagerank (global importance,
fixed-round iteration), dedup_clusters (connected components,
min-label propagation), and now BFS (distance-bounded reachability:
"everything within K hops of these nodes", the shape behind blast-radius
and recommendation-expansion queries).

Execution model is frontier expansion — the Pregel pattern expressed in
DataFrames: each round joins the CURRENT frontier (nodes first reached
last round) against the edge list, anti-joins the visited set, and
appends the survivors at hops+1. Per round that is one equi-join keyed
on the node id plus one anti-join; the frontier and visited frames are
materialized every round (operators/ckpt.materialize: reliable
checkpoint when the session has a checkpoint dir — the cluster-safe
default, since localCheckpoint blocks die with their executor and
truncated lineage cannot be recomputed — else localCheckpoint) so
lineage stays O(1) instead of O(rounds); same discipline as
``operators/dedup.dedup_clusters``. Round
count is bounded by ``max_hops`` AND by frontier exhaustion — on a
graph with diameter d the loop runs min(d, max_hops) rounds regardless
of edge count.

Scale: the edge list shuffles on its join key once per round (or zero
times if pre-bucketed on src); the frontier/visited frames are at most
node-scale. No global window, no collect of anything node- or
edge-scale — the only driver-side values are the per-round emptiness
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.ckpt import materialize


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Hop distance from the nearest of ``sources`` for every node
    within ``max_hops`` — ``(node, hops)`` with hops 0 for the sources
    themselves. ``edges`` is DIRECTED as given; pass both orientations
    for an undirected walk. Unreachable nodes are absent (distance is
    undefined, not sentinel-coded).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    frontier = (
        sources.select(F.col(node_col).alias(node_col))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
    )
    frontier = materialize(frontier)
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node_col] == e["__s"])
            .select(F.col("__d").alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
        )
        nxt = materialize(nxt)
        # DataFrame.isEmpty() stays a codegen'd limit-1 job; the old
        # RDD-conversion empty check planned a non-codegen job per round
        # (VERDICT r08 #3).
        if nxt.isEmpty():
            break
        visited = materialize(visited.unionByName(nxt))
        frontier = nxt
    return visited
