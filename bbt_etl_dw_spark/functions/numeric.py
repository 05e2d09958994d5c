"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, and Spark's partial aggregation
order differs run-to-run and from any single-threaded oracle. For
bit-reproducible results (required both for the DuckDB oracle comparison
and for stable goldens at any parallelism), money-like aggregates are
computed exactly: convert each double to decimal, sum exactly, cast the
exact sum back to double.

The double->decimal conversion is mediated through the double's STRING
form, not a direct cast. Direct casts disagree across engines on
tie-adjacent values: Spark's cast goes through Java's shortest round-trip
representation (BigDecimal.valueOf) while e.g. DuckDB rounds the exact
binary value — a double just below x.0000005 whose shortest repr is
"x.0000005" rounds differently. The shortest round-trip decimal string of
a double is canonical (Ryu/Grisu produce identical digits everywhere), and
DECIMAL(38,18) holds every such string for |x| in [1e-2, 1e17] without any
rounding, so string-mediated conversion is bit-identical across engines.

The matching oracle-SQL fragments are provided so Spark-side and SQL-side
expressions stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 20 integer digits / 18 fractional. Shortest-repr doubles have <= 17
# significant digits, so any |x| >= 0.01 fits exactly; sums stay exact up
# to 1e20 — far above any 100TB-scale money total.
DEC = "decimal(38,18)"
SQL_DEC = "DECIMAL(38,18)"


def _dec(c: Column) -> Column:
    # Direct double->decimal: Spark's cast internally goes through the
    # shortest-repr string (Decimal.set uses BigDecimal.valueOf ==
    # Double.toString), so this is bit-identical to the explicit
    # cast-to-string path while skipping the UTF8String round trip
    # (~25% off the per-row agg cost). The ORACLE side must keep the
    # explicit VARCHAR hop — DuckDB's direct cast rounds the exact binary
    # value instead. try_cast keeps ANSI mode from throwing on NaN/Inf
    # (null on both engines' TRY_CAST).
    return c.try_cast(DEC)


def _dec_to_double(c: Column) -> Column:
    # The exact decimal -> double conversion is ALSO string-mediated:
    # DuckDB converts DECIMAL(38,18) to double as int128/1e18 (two
    # roundings, off-by-one-ulp), while Spark rounds correctly. Parsing the
    # decimal's digit string is correctly rounded in both engines.
    return c.cast("string").cast("double")


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent (exact) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return _dec_to_double(F.sum(_dec(c))).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as
    double. The denominator counts the DECIMAL cast, not the raw column:
    NaN/Infinity rows null out of the numerator (try_cast), so counting
    them in the denominator biased the mean (avg of [1.0, NaN] read 0.5;
    review finding — sql_davg mirrored the same bias, making it invisible
    to the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return (_dec_to_double(F.sum(_dec(c))) / F.count(_dec(c))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`dsum`."""
    return (
        f"CAST(CAST(SUM(TRY_CAST(CAST(({expr}) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`davg` (denominator counts the decimal
    cast for the same NaN/Inf exclusion)."""
    return (
        f"CAST(CAST(SUM(TRY_CAST(CAST(({expr}) AS VARCHAR) AS {SQL_DEC})) AS VARCHAR) AS DOUBLE)"
        f" / COUNT(TRY_CAST(CAST(({expr}) AS VARCHAR) AS {SQL_DEC})) AS {alias}"
    )
