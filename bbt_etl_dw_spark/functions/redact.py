"""PII redaction expressions for training-data pipelines.

Pre-training corpora must scrub personally identifiable information
(emails, phone numbers, IP addresses, national-ID patterns) before the
text is packed. These are pure ``regexp_replace`` column expressions —
JVM-side, whole-stage-codegen, a narrow map stage at any scale; no UDF.

Pattern dialect: every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB, used by the verification oracles) — no
lookarounds, no backreferences, ASCII word boundaries only. Order
matters: IP before phone (an IPv4 octet run also looks like digits),
email before the generic digit-run masker.

Reference: the BBT-ETL-DW reference has no redaction stage (its string
ops are trim/upper cleaning, data_cleaning.py); this module is part of
the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement-token) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    # 7+ digits with optional separators, led by an optional +country code.
    ("phone", r"\+?[0-9][0-9 ().-]{5,}[0-9]\b", "[PHONE]"),
)


def redact_pii(col: Column | str) -> Column:
    """Chained PII scrub: every pattern in :data:`PII_PATTERNS` replaced by
    its token. One Project of stacked regexp_replace calls — Catalyst
    collapses the chain into a single codegen stage."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def mask_digit_runs(col: Column | str, mask: str = "#") -> Column:
    """Replace every digit run with ``mask`` — the blunt numeric-PII
    fallback (account numbers, zip codes) once structured patterns ran."""
    src = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(src, r"[0-9]+", mask)


def count_digit_runs(col: Column | str) -> Column:
    """How many digit runs a value contains (masking audit metric)."""
    src = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(src, F.lit(r"[0-9]+")).cast("long")
