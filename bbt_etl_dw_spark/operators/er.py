"""Entity resolution: blocked fuzzy matching of a dirty string column
against a canonical dimension.

The reference normalizes dirty dimension values with exact lookup tables
(country→ISO3, reference ``scripts/map_cols.py`` — re-expressed in
functions/geo.py). This operator is the fuzzy generalization a real lake
needs once the dirty side contains typos: match each probe string to its
best canonical candidate under edit distance, WITHOUT the quadratic
probe×canonical comparison.

Scale design (the standard ER blocking recipe):

- **Blocking**: both sides derive a cheap block key — first character +
  a length band (``len // band_width``). Only same-block pairs are ever
  compared, so the join is an equi-join (hash/SMJ — never a nested
  loop). The canonical side EXPANDS to its adjacent length bands, so a
  typo that inserts/deletes up to ``band_width - 1`` characters cannot
  move a true match out of reach across a band boundary. A typo in the
  FIRST character defeats blocking — that recall limit is inherent to
  the scheme and documented here rather than papered over.
- **Broadcast**: the canonical dimension (× 3 band copies) is dim-sized
  and broadcast, so the probe side — which may be fact-proportional —
  never shuffles for the match itself.
- **Best-match selection**: min (distance, canonical key) per probe row
  via one window over the CANDIDATES only (bounded by block size, not
  corpus size), with the canonical key as deterministic tie-break.

Probe rows with no candidate within ``max_dist`` surface with NULL
match columns (left-join semantics) so unmatched rows are auditable
instead of silently dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _block_key(col: Column, band_width: int) -> tuple[Column, Column]:
    return F.substring(col, 1, 1), F.floor(F.length(col) / band_width)


def blocked_fuzzy_lookup(
    df: DataFrame,
    col: str,
    canonical: DataFrame,
    canon_col: str,
    key_col: str,
    max_dist: int = 3,
    band_width: int = 4,
) -> DataFrame:
    """Left-join ``df`` to its best fuzzy match in ``canonical``.

    Adds ``canonical``'s columns (best match, NULL when nothing is
    within ``max_dist``) plus ``match_dist``. ``key_col`` is the
    canonical frame's unique key, used as the deterministic tie-break
    when two candidates sit at equal distance.
    """
    # Surrogate row id: the join-back must recover probe rows with NO
    # candidate (left-join semantics) without equating on probe columns —
    # an all-columns equality is null-UNSAFE, so any probe row with a NULL
    # in an unrelated column would compute a match and then silently fail
    # the join-back, violating the "NULL only when nothing within
    # max_dist" contract on exactly the dirty data this operator targets.
    # It also makes the best-match window per-ROW (duplicate probe rows
    # each keep their own match) instead of per-distinct-value.
    #
    # `base` is localCheckpoint'ed because it appears on BOTH sides of the
    # final self-join: without materialization each side re-evaluates the
    # probe lineage, and monotonically_increasing_id over a lineage with a
    # shuffle in it is NOT stable across evaluations (shuffle-fetch-order
    # nondeterminism) — row R would take one id on the left and another
    # inside `best`, silently receiving a different row's match. The
    # checkpoint pins ids once; cost is one materialization of the probe
    # frame. materialize() auto-selects a RELIABLE checkpoint when the
    # session has a checkpoint dir configured (truncated lineage cannot
    # be recomputed, so executor-local blocks die with their executor on
    # a real cluster); local blocks otherwise.
    # the ±1 band expansion guarantees a true match stays reachable only
    # while an edit budget of max_dist cannot move the length across more
    # than one band boundary; a larger budget would SILENTLY lose matches
    # whose lengths differ by more than a band span (r07 review) — make
    # the recall limit loud instead
    if max_dist > band_width:
        raise ValueError(
            f"blocked_fuzzy_lookup: max_dist={max_dist} exceeds "
            f"band_width={band_width} — the ±1 length-band expansion "
            f"cannot guarantee recall; raise band_width to >= max_dist"
        )
    reserved = {"_rid", "_bc", "_bb", "_dist", "_rk"} & (
        set(df.columns) | set(canonical.columns)
    )
    if reserved:
        raise ValueError(
            f"blocked_fuzzy_lookup: columns {sorted(reserved)} collide "
            f"with the operator's internal names — rename them first"
        )
    from bbt_etl_dw_spark.operators.ckpt import materialize

    base = materialize(df.withColumn("_rid", F.monotonically_increasing_id()))

    pc, pb = _block_key(F.col(col), band_width)
    probe = base.withColumn("_bc", pc).withColumn("_bb", pb)

    cc, cb = _block_key(F.col(canon_col), band_width)
    cand = (
        canonical.withColumn("_bc", cc)
        .withColumn("_bb", F.explode(F.sequence(cb - 1, cb + 1)))
    )

    # threshold variant: the DP early-exits once the running distance
    # exceeds max_dist (returns -1) — O(max_dist·len) per comparison
    # instead of O(len²), the difference that matters inside big blocks.
    # Kept distances are the true distances, so oracle parity holds.
    dist = F.levenshtein(F.col(col), F.col(canon_col), max_dist)
    matched = (
        probe.join(F.broadcast(cand), ["_bc", "_bb"])
        .filter(dist >= 0)
        .withColumn("_dist", dist)
    )
    w = Window.partitionBy("_rid").orderBy("_dist", key_col)
    best = (
        matched.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("_rid", *canonical.columns, F.col("_dist").alias("match_dist"))
    )
    return base.join(best, on="_rid", how="left").drop("_rid")
