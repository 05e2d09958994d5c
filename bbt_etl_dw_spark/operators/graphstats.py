"""Static graph statistics: degree-ordered triangle counting and local
clustering coefficients over an undirected edge list.

Companion to the iterative operators (``operators/pagerank``,
``operators/dedup.dedup_clusters``): triangles are the canonical
non-iterative graph aggregate, and the degree-ordered formulation is the
one that survives scale. Orienting every edge from its lower-(degree,id)
endpoint to the higher bounds each vertex's out-degree by O(sqrt(|E|))
on any graph [Schank & Wagner 2005; the same ordering GraphX's
triangleCount and Spark's friend-of-friend jobs use], so the wedge
self-join — the only superlinear step — generates
sum(out_deg²) = O(|E|^1.5) candidate wedges instead of the naive
sum(deg²), which a single hub vertex makes quadratic.

Shuffle budget: two vertex-keyed joins to attach endpoint degrees, one
self-join on the wedge pivot, one equi-join to close wedges, one explode
+ hash-agg for per-vertex counts. No window over the edge set, no
cartesian anywhere; every join is equi-keyed.

The closing arithmetic (clustering coefficient 2T / d(d-1)) is a fixed
IEEE sequence on exact BIGINT inputs, so the whole operator carries a
bit-exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical distinct undirected edge list (u < v, loops dropped)."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        pairs.filter(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
    )


def triangle_stats(pairs: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle count and local clustering coefficient.

    Input: an edge pair list in any orientation (duplicates and loops
    tolerated). Output: (vertex, degree, n_triangles, clustering) with
    clustering NULL for degree < 2 (the coefficient is undefined, and a
    0.0 would poison averages).
    """
    # Reference fan-out here is MULTIPLICATIVE: `und` feeds the degree
    # union (2x) and the rank join, `deg` feeds du/dv/the final join,
    # `directed` feeds both wedge sides and the closing set — composed
    # lazily that is ~15 executions of the caller's entire edge pipeline
    # (r14 plan audit of nation_trade_triangles: each base fact scanned
    # 17x). All three frames are graph-grain (edges / vertices), so one
    # checkpoint each collapses the caller's pipeline to a single run.
    from bbt_etl_dw_spark.operators.ckpt import materialize

    und = materialize(undirected_edges(pairs, src, dst))
    deg = materialize(
        und.select(F.col("u").alias("vertex"))
        .unionAll(und.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )

    du = deg.select(F.col("vertex").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("degree").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    # orient lower-(degree, id) -> higher; total order, so exactly one
    # direction per edge and every triangle has a unique pivot vertex
    lo_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    directed = materialize(
        ranked.select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
        )
    )

    e1 = directed.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    e2 = directed.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = (
        e1.join(e2, "a")
        # keep each unordered wedge once, ends ordered like the edges
        .filter(F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y")))
        .select("a", "x", "y")
    )
    closing = directed.select(F.col("a").alias("x"), F.col("b").alias("y"))
    triangles = wedges.join(closing, ["x", "y"])

    per_vertex = (
        triangles.select(
            F.explode(F.array(F.col("a"), F.col("x"), F.col("y"))).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )

    d = F.col("degree").cast("double")
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    clustering = F.when(
        F.col("degree") >= 2,
        (F.lit(2.0) * t.cast("double")) / (d * (d - F.lit(1.0))),
    )
    return deg.join(per_vertex, "vertex", "left").select(
        "vertex",
        "degree",
        t.alias("n_triangles"),
        clustering.alias("clustering"),
    )


def sql_triangle_ctes(edge_sql: str) -> str:
    """DuckDB CTE chain replaying :func:`triangle_stats` over an edge
    relation ``{edge_sql}`` exposing columns (src, dst). Yields a
    relation ``tri_stats`` with the operator's output columns; the
    coefficient arithmetic mirrors the builder operation-for-operation.

    ``raw_pairs``/``und`` are MATERIALIZED (r13): with inlined CTEs,
    DuckDB 1.0 pushes the ``src <> dst`` predicate into the edge
    relation's join tree as a NESTED_LOOP_JOIN between the two
    vertex-map sides — an |V-map|^2 intermediate BEFORE the fact join
    (~150M rows / >20 GB temp spill at sf0.1, found by the r13
    full-registry sf0.1 sweep; invisible at sf0.01 where the maps are
    10x smaller) — and re-evaluates that misplan once per downstream
    CTE reference. Materializing pins the intended shape: build the
    edge list once, dedup once, run the wedge join on the dim-scale
    distinct edges.
    """
    return f"""
raw_pairs AS MATERIALIZED ({edge_sql}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw_pairs WHERE src <> dst
),
deg AS (
  SELECT vertex, COUNT(*) AS degree FROM (
    SELECT u AS vertex FROM und UNION ALL SELECT v FROM und
  ) GROUP BY vertex
),
ranked AS (
  SELECT e.u, e.v, d1.degree AS du, d2.degree AS dv
  FROM und e JOIN deg d1 ON e.u = d1.vertex JOIN deg d2 ON e.v = d2.vertex
),
directed AS (
  SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS a,
         CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS b,
         CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS db
  FROM ranked
),
wedges AS (
  SELECT e1.a, e1.b AS x, e2.b AS y
  FROM directed e1 JOIN directed e2 ON e1.a = e2.a
  WHERE (e1.db, e1.b) < (e2.db, e2.b)
),
triangles AS (
  SELECT w.a, w.x, w.y
  FROM wedges w JOIN directed c ON w.x = c.a AND w.y = c.b
),
per_vertex AS (
  SELECT vertex, COUNT(*) AS n_triangles FROM (
    SELECT a AS vertex FROM triangles
    UNION ALL SELECT x FROM triangles
    UNION ALL SELECT y FROM triangles
  ) GROUP BY vertex
),
tri_stats AS (
  SELECT d.vertex, d.degree,
         CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
         CASE WHEN d.degree >= 2 THEN
           (CAST(2.0 AS DOUBLE) * CAST(CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS DOUBLE))
           / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - CAST(1.0 AS DOUBLE)))
         END AS clustering
  FROM deg d LEFT JOIN per_vertex p ON d.vertex = p.vertex
)"""
