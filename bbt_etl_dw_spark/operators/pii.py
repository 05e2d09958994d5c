"""PII detection and redaction over document text.

A training-data pipeline must count and strip personally identifiable
information before a corpus ships (the reference's cleaning layer,
SURVEY §2.10, stops at column-level fillna/drop rules — free-text
redaction is the corpus-scale extension of the same idea). Everything
here is built-in JVM regex expressions — ``regexp_count`` /
``regexp_replace`` — so the scrub rides whole-stage codegen with zero
Python on the hot path and no shuffle at all: redaction is a pure map,
embarrassingly parallel at any scale.

Pattern discipline: every pattern stays inside the regex subset that
Java's engine (Spark) and RE2 (DuckDB, Go tooling) interpret
identically — character classes, bounded quantifiers, alternation,
non-capturing groups, ``\\b`` word boundaries. No backreferences, no
lookaround (RE2 lacks them), so the DuckDB oracle replays the exact
semantics and any engine/oracle drift is a real bug, not a regex
dialect artifact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: applied first-to-last. Order matters where patterns could
# overlap (an SSN is also three digit runs a loose phone pattern could
# nibble), so the more specific pattern runs first.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    (
        # the optional '+' sits OUTSIDE the word boundary: \b cannot
        # assert between a space and '+' (both non-word), so \b(?:\+?1...
        # silently dropped the '+' from the match and left it behind in
        # the scrubbed text
        "phone",
        r"\+?\b(?:1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "[PHONE]",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IPV4]",
    ),
)


def pii_counts(text_col: str | Column) -> dict[str, Column]:
    """Per-category match counts (named ``<category>_count``), computed
    on the ORIGINAL text. Counts are taken before any replacement so
    categories don't see each other's placeholders; a document with no
    text counts 0 everywhere (regexp_count of NULL is NULL — coalesced)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        f"{name}_count": F.coalesce(
            F.regexp_count(c, F.lit(pattern)), F.lit(0)
        ).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }


def scrub_pii(text_col: str | Column) -> Column:
    """Text with every PII category replaced by its typed placeholder.

    One chained ``regexp_replace`` expression per category, applied in
    PII_PATTERNS order inside a single projection — Catalyst fuses the
    chain into one codegen stage, so the whole scrub is a single pass
    over each string. NULL text stays NULL (regexp_replace propagates)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pattern, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def sql_scrub_pii(text_expr: str) -> str:
    """DuckDB-SQL twin of :func:`scrub_pii` — the identical replace
    chain in the identical order, with the 'g' flag (DuckDB replaces
    only the first match by default; Spark replaces all)."""
    expr = text_expr
    for _, pattern, placeholder in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{placeholder}', 'g')"
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
