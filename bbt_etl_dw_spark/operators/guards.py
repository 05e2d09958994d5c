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
