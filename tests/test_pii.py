"""Unit tests for functions/redact.py: detection counts, redaction output,
NULL propagation, and the cross-engine regex-parity contract (the same
strings through DuckDB's RE2 must count and scrub identically)."""

import duckdb
import pytest

from bbt_etl_dw_spark.functions.redact import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    sql_pii_counts,
    sql_redact_pii,
)

CASES = [
    # (text, email, ssn, phone, ipv4, scrubbed)
    (
        "mail a.b+c@sub.example.org now",
        1, 0, 0, 0,
        "mail [EMAIL] now",
    ),
    (
        "ssn 123-45-6789 and phone 555-123-4567",
        0, 1, 1, 0,
        "ssn [SSN] and phone [PHONE]",
    ),
    (
        # +1 prefix and dotted separators
        "+1 555.123.4567 from 192.168.0.1",
        0, 0, 1, 1,
        "[PHONE] from [IP]",
    ),
    (
        # SSN must NOT be double-claimed by the phone pattern
        "id 987-65-4321",
        0, 1, 0, 0,
        "id [SSN]",
    ),
    (
        # two emails, non-overlapping scan
        "x@y.io y@z.co",
        2, 0, 0, 0,
        "[EMAIL] [EMAIL]",
    ),
    ("no pii here", 0, 0, 0, 0, "no pii here"),
    ("", 0, 0, 0, 0, ""),
    (None, 0, 0, 0, 0, None),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(CASES)], "i int, text string"
    )
    rows = (
        df.select(
            "i",
            "text",
            *[c.alias(n) for n, c in pii_counts("text").items()],
            redact_pii("text").alias("scrubbed"),
        )
        .orderBy("i")
        .collect()
    )
    return rows


def test_counts_and_redaction(scrubbed):
    for row, (text, email, ssn, phone, ipv4, expect) in zip(scrubbed, CASES):
        assert row.email_count == email, text
        assert row.ssn_count == ssn, text
        assert row.phone_count == phone, text
        assert row.ipv4_count == ipv4, text
        assert row.scrubbed == expect, text


def test_duckdb_regex_parity(scrubbed):
    """The SQL twins must produce the identical counts and scrubbed text
    for every case — the engine/oracle lock-step contract."""
    con = duckdb.connect()
    counts_sql = ", ".join(sql_pii_counts("text"))
    for row, (text, *_rest) in zip(scrubbed, CASES):
        got = con.execute(
            f"SELECT {counts_sql}, {sql_redact_pii('text')} AS scrubbed "
            "FROM (SELECT ? AS text)",
            [text],
        ).fetchone()
        n = len(PII_PATTERNS)
        expected = tuple(row[f"{name}_count"] for name, _, _ in PII_PATTERNS)
        assert tuple(got[:n]) == expected, text
        assert got[n] == row.scrubbed, text


def test_plan_is_pure_projection(spark):
    """The scrub plans as a single projected scan — no exchange, no
    Python evaluation — so redaction is map-only at any scale."""
    df = spark.createDataFrame([("a@b.co",)], "text string")
    out = df.select(
        *[c.alias(n) for n, c in pii_counts("text").items()],
        redact_pii("text").alias("scrubbed"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_scrub_idempotent_on_placeholders(spark):
    """scrub(scrub(x)) == scrub(x): placeholders contain no digits or
    '@', so no pattern can match inside already-redacted text — the
    property that makes re-running a redaction pass safe on a partially
    processed corpus."""
    texts = [t[0] for t in CASES if t[0]] + [
        "[EMAIL] [PHONE] [SSN] [IP]",
        "a@b.co 123-45-6789 555-123-4567 10.0.0.1 a@b.co",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        redact_pii("text").alias("once"),
        redact_pii(redact_pii("text")).alias("twice"),
    ).collect()
    for r in rows:
        assert r.once == r.twice, r.once
