"""PII detection and redaction expressions for training-data pipelines.

Pre-training corpora must count and scrub personally identifiable
information (emails, IP addresses, national-ID patterns, phone numbers)
before the text is packed. These are pure ``regexp_count`` /
``regexp_replace`` column expressions — JVM-side, whole-stage-codegen, a
narrow map stage at any scale; no UDF, no shuffle.

Pattern dialect: every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB, used by the verification oracles) — no
lookarounds, no backreferences, ASCII word boundaries only — so the
SQL twins (:func:`sql_redact_pii` / :func:`sql_pii_counts`) replay the
exact semantics and any engine/oracle drift is a real bug, not a regex
dialect artifact.

Reference: the BBT-ETL-DW reference has no redaction stage (its string
ops are trim/upper cleaning, data_cleaning.py); this module is part of
the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement-token) — applied in order. The patterns are
# mutually exclusive by construction (an SSN's 3-2-4 digit grouping cannot
# satisfy the phone's 3-3-4; a dotted phone has 3 dot-groups, an IPv4 has
# 4), so per-category counts taken on the original text are order-
# independent and no category eats another's matches during the scrub.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    # NANP-shaped 3-3-4 with -/./space separators and optional "+1 " /
    # "(area)" decorations. The optional '+' sits OUTSIDE the word
    # boundary: \b cannot assert between a space and '+' (both non-word),
    # so \b\+?1... silently dropped the '+' from the match and left it
    # behind in the scrubbed text.
    ("phone", r"\+?\b(?:1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts (named ``<category>_count``), computed
    on the ORIGINAL text — counts never see another category's
    placeholders. NULL/empty text counts 0 everywhere (regexp_count of
    NULL is NULL — coalesced)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"{name}_count": F.coalesce(
            F.regexp_count(c, F.lit(pattern)), F.lit(0)
        ).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Chained PII scrub: every pattern in :data:`PII_PATTERNS` replaced by
    its token. One Project of stacked regexp_replace calls — Catalyst
    collapses the chain into a single codegen stage; NULL text stays NULL
    (regexp_replace propagates). Idempotent: tokens contain no digits or
    '@', so re-scrubbing already-redacted text is a no-op."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def sql_redact_pii(text_expr: str) -> str:
    """DuckDB-SQL twin of :func:`redact_pii` — the identical replace
    chain in the identical order, with the 'g' flag (DuckDB replaces
    only the first match by default; Spark replaces all)."""
    expr = text_expr
    for _, pattern, token in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{token}', 'g')"
    return expr


def sql_pii_counts(text_expr: str) -> list[str]:
    """DuckDB-SQL twins of :func:`pii_counts`, as SELECT-list fragments.

    DuckDB has no regexp_count; ``len(regexp_extract_all(...))`` is the
    standard spelling and matches Java's non-overlapping left-to-right
    scan semantics."""
    frags = []
    for name, pattern, _ in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        frags.append(
            f"CAST(COALESCE(len(regexp_extract_all({text_expr}, '{sql_pat}')), 0) AS BIGINT)"
            f" AS {name}_count"
        )
    return frags


def mask_digit_runs(col: Column | str, mask: str = "#") -> Column:
    """Replace every digit run with ``mask`` — the blunt numeric-PII
    fallback (account numbers, zip codes) once structured patterns ran."""
    src = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(src, r"[0-9]+", mask)


def count_digit_runs(col: Column | str) -> Column:
    """How many digit runs a value contains (masking audit metric)."""
    src = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(src, F.lit(r"[0-9]+")).cast("long")
