"""Product quantization (PQ) for vector search: compressed codes +
asymmetric-distance (ADC) top-k.

The third leg of the ANN family (operators/similarity.py: LSH buckets,
IVF inverted lists) and the one that changes the STORAGE story at
100 TB: a 64-d float vector (256 B) compresses to ``m`` one-byte codes
(here 4 B — 64×), so the scoring pass reads the tiny code table, never
the raw vectors. Jégou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — public method.

Design, all pure DataFrame ops:

- **Training** (`pq_codebooks`): the vector splits into ``m`` disjoint
  subspaces; each subspace trains its own ``ksub``-centroid codebook
  with the SAME deterministic trainer the IVF path uses
  (md5-seeded, exact-decimal Lloyd — similarity.ivf_centroids on a
  sliced frame), so codebooks are identical at any parallelism and
  SQL-replayable.
- **Encoding** (`pq_encode`): one narrow map pass — per subspace, the
  nearest-centroid index (codes are plan literals; no shuffle).
- **Scoring** (`pq_adc_topk`): ADC — per query, the distance from each
  query SUBVECTOR to every centroid forms an ``m × ksub`` lookup
  table (dim-free, broadcast); the corpus codes explode to
  (corpus_id, subspace, code) and equi-join the LUT, and the per-pair
  approximate distance is the sum of the ``m`` looked-up partials.
  The m partial rows for one (query, corpus) pair originate from one
  corpus row, so the groupBy collapses them MAP-SIDE — the shuffle
  carries one skinny row per (query, corpus) pair, and the whole plan
  is broadcast-hash-join + partial agg: no nested loop anywhere.

Cross-engine determinism: centroid training and assignment reuse the
IVF discipline; the ADC sum is an exact-decimal sum of the m partial
distances (cross-row aggregate ⇒ decimal, functions/numeric.py), so
ranks are bit-stable and the DuckDB oracle replays end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bbt_etl_dw_spark.functions.numeric import dsum
from bbt_etl_dw_spark.operators.similarity import (
    _centroid_dists,
    _infer_dims,
    assign_centroid,
    ivf_centroids,
)


def _sub_slice(vec, j: int, sub: int):
    return F.slice(vec, j * sub + 1, sub)


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``ksub`` centroids each.
    Returns books[j] = list of ksub centroids of dims/m floats. The
    md5-seed ordering depends only on ids, so every subspace trains on
    the same seed ROWS (sliced differently) — exactly what the SQL
    replay derives."""
    dims = dims or _infer_dims(corpus, vec_col)
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    sub = dims // m
    v = F.col(vec_col).cast("array<double>")
    books = []
    for j in range(m):
        sliced = corpus.select(
            F.col(id_col), _sub_slice(v, j, sub).alias(vec_col)
        )
        books.append(
            ivf_centroids(sliced, nlist=ksub, iters=iters, id_col=id_col, vec_col=vec_col)
        )
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one narrow map pass, codebooks as plan
    literals. At scale this frame IS the persisted index: m small ints
    per vector."""
    m = len(books)
    sub = len(books[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[assign_centroid(_sub_slice(v, j, sub), books[j]) for j in range(m)]
    )
    return corpus.select(F.col(id_col).alias("corpus_id"), codes.alias("codes"))


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes.

    ``codes`` is pq_encode's output; ``queries`` carries raw vectors.
    Output: (query_id, corpus_id, adc_dist, rank), rank 1..k per query
    ascending by (distance, corpus_id)."""
    m = len(books)
    sub = len(books[0][0])
    qv = F.col(vec_col).cast("array<double>")

    # LUT: (query_id, j, code, pdist) — m×ksub rows per query, broadcast.
    # Built in ONE pass over the query side: an array of m per-subspace
    # distance tables exploded twice (r14: the previous m-way union
    # planned the query subtree once per subspace — 8 scans of the
    # caller's query pipeline for m=8; one generator per select, so the
    # j-explode and the code-posexplode stack in two projections).
    subtables = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _centroid_dists(_sub_slice(qv, j, sub), books[j]).alias("pd"),
            )
            for j in range(m)
        ]
    )
    luts = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(subtables).alias("e"),
        )
        .select(
            "query_id",
            F.col("e.j").alias("j"),
            F.posexplode(F.col("e.pd")).alias("code", "pdist"),
        )
    )

    exploded = codes.select(
        "corpus_id", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        exploded.join(F.broadcast(luts), ["j", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(dsum(F.col("pdist"), "adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc_dist", "rank")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The production PQ pattern: ADC over codes builds a ``shortlist``
    per query, then ONLY the shortlisted raw vectors are fetched and
    exact-L2 re-ranked to the final top-``k``.

    This is what makes PQ work operationally at 100 TB: the full-corpus
    pass touches m bytes per vector (the code table); raw vectors — the
    256-B payloads — are read for shortlist×queries rows only (a keyed
    semi-join into the vector store, partition-prunable). Quality
    recovers from code quantization because the exact metric decides the
    final order (measured in the ann_pq_recall suite row: ADC-only vs
    re-ranked recall)."""
    from bbt_etl_dw_spark.operators.similarity import _l2sq

    sl = pq_adc_topk(
        codes, queries, books, k=shortlist, query_id_col=query_id_col, vec_col=vec_col
    ).select("query_id", "corpus_id")
    qv = F.col(vec_col).cast("array<double>")
    c = corpus.select(F.col(id_col).alias("corpus_id"), qv.alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), qv.alias("qv"))
    rer = (
        sl.join(c, "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "corpus_id", _l2sq(F.col("cv"), F.col("qv")).alias("l2sq")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2sq"), F.col("corpus_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "l2sq", "rank")
    )
