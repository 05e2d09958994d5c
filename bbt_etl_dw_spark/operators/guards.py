"""Join-cardinality guards: make fan-out explosions loud, cheap, and
early.

The silent killer of warehouse pipelines is a dimension that stopped
being unique: a dim⋈fact join quietly multiplies fact rows, every
downstream aggregate inflates, and nothing errors. (The reference has a
live instance: its ProductID⋈SupplierID mis-join, quarantined in
plans/reference_parity.py.) These guards convert that class of bug into
an immediate, diagnosable failure:

- :func:`assert_unique` — one hash-agg over the key columns; raises with
  the worst offending keys inlined in the message. O(|df|) with partial
  aggregation, no sort, no second pass.
- :func:`checked_dim_join` — the production dim-join wrapper: asserts the
  dim side unique on the join keys, then broadcasts it. The uniqueness
  agg runs on the DIM (small by definition), so the guard costs a
  dim-sized job, never a fact pass.
- :func:`assert_row_ratio` — post-join row-count bound for joins where
  bounded fan-out is EXPECTED (e.g. order⋈lineitem at most 7 lines):
  count(out)/count(in) must stay within [lo, hi]. Two metadata-cheap
  counts; call it on sampled slices at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CardinalityError(ValueError):
    """A join-cardinality contract was violated."""


def assert_unique(
    df: DataFrame, keys: Sequence[str], sample: int = 5, label: str = "frame"
) -> DataFrame:
    """Raise :class:`CardinalityError` unless ``keys`` are unique in
    ``df``; returns ``df`` unchanged for chaining. The error message
    carries the ``sample`` heaviest duplicate keys and their counts."""
    dups = (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .orderBy(F.col("_n").desc(), *keys)
        .limit(sample)
        .collect()
    )
    if dups:
        shown = ", ".join(
            "(" + ", ".join(f"{k}={r[k]!r}" for k in keys) + f") x{r['_n']}"
            for r in dups
        )
        raise CardinalityError(
            f"{label}: key {tuple(keys)} is not unique — worst offenders: "
            f"{shown}. A join on this side would multiply the other side's "
            "rows silently."
        )
    return df


def checked_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    label: str = "dim",
) -> DataFrame:
    """Broadcast-join a dimension AFTER proving it unique on the join
    keys. The guard aggregates the dim only (small by definition); the
    fact is never scanned by the check."""
    keys = [on] if isinstance(on, str) else list(on)
    assert_unique(dim, keys, label=label)
    return fact.join(F.broadcast(dim), on=keys, how=how)


def assert_row_ratio(
    inp: DataFrame,
    out: DataFrame,
    lo: float = 1.0,
    hi: float = 1.0,
    label: str = "join",
) -> DataFrame:
    """Raise unless count(out)/count(inp) lies in [lo, hi]; returns
    ``out`` for chaining. Use where bounded fan-out is expected and a
    uniqueness assertion is too strict."""
    n_in = inp.count()
    n_out = out.count()
    ratio = (n_out / n_in) if n_in else (0.0 if n_out == 0 else float("inf"))
    if not (lo <= ratio <= hi):
        raise CardinalityError(
            f"{label}: row ratio {ratio:.4f} ({n_in} -> {n_out}) outside "
            f"[{lo}, {hi}] — unexpected fan-out or row loss."
        )
    return out


# Guarded frames below this size are categorically broadcast-safe: the
# session's autoBroadcastJoinThreshold governs the OPTIMIZER's automatic
# choice, not explicit broadcast() hints — an admin setting a tiny (or
# -1) auto threshold is steering the planner, not banning kilobyte-scale
# hinted broadcasts. Without the floor, a conservative cluster conf
# would fail every model/blocklist guard in the engine (found by
# driver_sim --hostile-confs with a 1KB threshold). Tests shrink this to
# exercise the trip path.
GUARD_FLOOR_BYTES = 32 << 20  # 32 MB


def _session_broadcast_cap(spark) -> int:
    """The broadcast budget in bytes: the session's
    autoBroadcastJoinThreshold, never below :data:`GUARD_FLOOR_BYTES`
    (see its comment). A disabled threshold (-1) only turns off
    AUTOMATIC broadcast selection — explicit broadcast() hints still
    build a hash relation, bounded by Spark's hard 8 GB / 512M-row
    relation limit — so the guard falls back to that hard limit rather
    than going silent."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    s = raw.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    try:
        n = int(float(s)) * mult
    except ValueError:
        n = 10 << 20
    return max(n, GUARD_FLOOR_BYTES) if n > 0 else 8 << 30


def assert_broadcastable(
    df: DataFrame,
    label: str = "broadcast side",
    remedy: str = "switch this join to a shuffle join",
    max_bytes: int | None = None,
) -> DataFrame:
    """Raise :class:`CardinalityError` if ``df``'s estimated size exceeds
    the broadcast budget (``max_bytes``, defaulting to the session's
    ``spark.sql.autoBroadcastJoinThreshold``); returns ``df`` unchanged.

    The estimate is ONE aggregate over ``df`` (rows + per-column byte
    widths: strings/binary measured by octet length, nested types —
    array/map/struct — measured by their JSON text length, a deliberate
    OVERestimate for numeric payloads, which is the safe direction for a
    guard; fixed-width scalars assumed 8B; plus per-row overhead). A
    nested column priced at a fixed width would let a struct-of-kilobyte-
    strings frame pass and OOM anyway — with the guard having vouched
    for it. Call it on frames that are SUPPOSED to be small (models,
    dims, blocklists), where the check costs a dim-sized job and
    converts a driver/executor OOM three stages later into an immediate
    error naming the frame and the remedy."""
    spark = df.sparkSession
    cap = max_bytes if max_bytes is not None else _session_broadcast_cap(spark)
    width = F.lit(16)  # row object overhead
    for field in df.schema.fields:
        t = field.dataType.typeName()
        c = F.col(field.name)
        if t in ("string", "binary"):
            width = width + F.coalesce(F.octet_length(c), F.lit(0)) + F.lit(16)
        elif t in ("array", "map", "struct"):
            width = (
                width
                + F.coalesce(F.octet_length(F.to_json(c)), F.lit(0))
                + F.lit(16)
            )
        else:
            width = width + F.lit(8)
    est = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(width.cast("long")), F.lit(0)).alias("bytes"),
    ).first()
    if est["bytes"] > cap:
        raise CardinalityError(
            f"{label}: estimated broadcast size {est['bytes']:,} B "
            f"({est['n']:,} rows) exceeds the broadcast budget {cap:,} B "
            f"(spark.sql.autoBroadcastJoinThreshold). Remedy: {remedy}."
        )
    return df
