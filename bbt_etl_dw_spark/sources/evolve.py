"""Schema-evolution reader: union parquet generations whose schemas have
drifted — added columns, dropped columns, and safely-widened types.

A corpus written over months accumulates generations: an early dump with
``score int``, a later one adding ``lang string`` and widening ``score``
to ``bigint``. Spark's ``mergeSchema`` merges ADDED columns but refuses
type changes ("Failed to merge incompatible data types"), and silently
reading with the latest schema corrupts or nulls older files. This reader
makes drift explicit and safe:

- each generation is read with ITS OWN footer schema (no cross-file
  inference surprises);
- the target schema is computed by name with a WIDENING-ONLY ladder
  (byte→short→int→long, float→double, int-family→double, and X→string as
  the universal fallback ONLY when ``allow_to_string=True``); a drift the
  ladder cannot express (e.g. string→int, struct shape change) raises
  with the offending column and both types — silent coercion is the
  failure mode this module exists to prevent;
- generations union by NAME with missing columns as typed NULLs, so
  column order differences and late additions are immaterial.

Scale notes: schema discovery reads FOOTERS only (one driver-side listing
per generation); the union is a zero-shuffle narrow plan over all
generations — filters and projections push into every member scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening ladder: leftmost is narrowest; a pair merges to the wider
# member of a shared family, else (cross-family numeric) to double
_INT_FAMILY = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOAT_FAMILY = [T.FloatType(), T.DoubleType()]


def _rank(family: list[T.DataType], t: T.DataType) -> int:
    for i, f in enumerate(family):
        if t == f:
            return i
    return -1


def widen(a: T.DataType, b: T.DataType, allow_to_string: bool = False) -> T.DataType:
    """The narrowest type both ``a`` and ``b`` widen to losslessly.
    Raises ValueError when no lossless widening exists (unless
    ``allow_to_string``, which falls back to string)."""
    if a == b:
        return a
    ia, ib = _rank(_INT_FAMILY, a), _rank(_INT_FAMILY, b)
    if ia >= 0 and ib >= 0:
        return _INT_FAMILY[max(ia, ib)]
    fa, fb = _rank(_FLOAT_FAMILY, a), _rank(_FLOAT_FAMILY, b)
    if fa >= 0 and fb >= 0:
        return _FLOAT_FAMILY[max(fa, fb)]
    # int + float family: double holds every 32-bit int exactly; long
    # does NOT fit double losslessly, but it is the standard lake
    # widening and the error is bounded to >2^53 magnitudes — accept
    # int/float mixes up to IntegerType, require opt-in beyond.
    if (ia >= 0 and fb >= 0) or (fa >= 0 and ib >= 0):
        int_rank = max(ia, ib)
        if int_rank <= 2:  # byte/short/int -> exact in double
            return T.DoubleType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(
            widen(a.elementType, b.elementType, allow_to_string),
            a.containsNull or b.containsNull,
        )
    if allow_to_string:
        return T.StringType()
    raise ValueError(
        f"no lossless widening between {a.simpleString()} and "
        f"{b.simpleString()} — fix the drift upstream or pass "
        "allow_to_string=True for a string fallback"
    )


def evolved_schema(
    schemas: list[T.StructType], allow_to_string: bool = False
) -> T.StructType:
    """Merge generation schemas by column NAME under the widening ladder.
    Column order follows first appearance across generations; a column
    missing from a generation is simply nullable there."""
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for schema in schemas:
        for f in schema.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                try:
                    types[f.name] = widen(types[f.name], f.dataType, allow_to_string)
                except ValueError as e:
                    raise ValueError(f"column {f.name!r}: {e}") from e
    return T.StructType([T.StructField(n, types[n], True) for n in order])


def read_evolved(
    spark: SparkSession,
    paths: list[str],
    allow_to_string: bool = False,
) -> DataFrame:
    """Read parquet generations at ``paths`` as ONE frame under the
    widened schema: per-generation footer schemas, widening-only merge,
    union by name with typed-NULL fill for absent columns."""
    if not paths:
        # e.g. a generation-discovery glob that matched nothing — raising
        # here names the real cause instead of returning None and failing
        # at the caller's next method call (review finding)
        raise ValueError("read_evolved: no generation paths given")
    gens = [spark.read.parquet(p) for p in paths]
    target = evolved_schema([g.schema for g in gens], allow_to_string)
    out = None
    for g in gens:
        have = set(g.columns)
        cols = [
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in target.fields
        ]
        part = g.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out
