"""Single-pass data-quality audit engine.

Re-expresses the reference's audit (``scripts/etl_transform/audit_report.py:
41-141``) — per-column missing counts, duplicate rows, duplicate-column name
detection, and typed/format inconsistency rules — with two scale fixes
(SURVEY §4):

- ALL metrics for a source are computed in ONE aggregation job (the
  reference runs one filter+collect job per rule and pulls every offending
  ID to the driver).
- Offending IDs are collected as capped arrays via ``collect_list`` inside
  the same pass (bounded driver memory), or skipped entirely with
  ``collect_ids=False`` at 100TB scale where violation *rows* should be
  written to a violations table instead (see :func:`violations`).

Rules are declarative :class:`AuditRule` values whose predicates are plain
Column expressions — JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
PHONE_RE = r"^[0-9.()\- ]*$"
ALPHA_RE = r"^[a-zA-Z ]+$"

# Name shape of Spark's dedup of duplicate CSV headers (e.g. OrderID0 /
# OrderID14) — reference audit_report.py:63-84. Base may contain ANY
# characters (a duplicated 'Order_ID' header dedups to Order_ID0/…, which
# a letters-only base regex silently missed — review finding); the lazy
# base keeps the digit suffix maximal.
DUP_COL_SUFFIX_RE = re.compile(r"^(.+?)(\d+)$")


@dataclass(frozen=True)
class AuditRule:
    """One inconsistency rule: rows where ``predicate`` holds are violations."""

    column: str
    expected: str  # human-readable expected type/format label
    predicate: Column  # true => violation


def rule_not_iso_date(col: str) -> AuditRule:
    return AuditRule(col, "date (YYYY-MM-DD)", ~F.col(col).rlike(ISO_DATE_RE) & F.col(col).isNotNull())


def rule_positive_number(col: str, kind: str = "float") -> AuditRule:
    casted = F.col(col).try_cast("double" if kind == "float" else "long")
    pred = F.col(col).isNotNull() & (casted.isNull() | (casted <= 0))
    return AuditRule(col, f"positive {kind}", pred)


def rule_non_negative_number(col: str, kind: str = "float") -> AuditRule:
    casted = F.col(col).try_cast("double" if kind == "float" else "long")
    pred = F.col(col).isNotNull() & (casted.isNull() | (casted < 0))
    return AuditRule(col, f"non-negative {kind}", pred)


def rule_charset(col: str, regex: str = PHONE_RE, label: str = "phone charset") -> AuditRule:
    return AuditRule(col, label, F.col(col).isNotNull() & ~F.col(col).rlike(regex))


def rule_non_empty(col: str) -> AuditRule:
    return AuditRule(col, "non-empty", F.col(col).isNotNull() & (F.trim(F.col(col)) == ""))


@dataclass
class AuditReport:
    source: str
    row_count: int
    missing_values: dict[str, int]
    duplicate_rows: int
    duplicate_columns: dict[str, list[str]]
    inconsistencies: dict[str, dict] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "source": self.source,
            "row_count": self.row_count,
            "missing_values": self.missing_values,
            "duplicate_rows": self.duplicate_rows,
            "duplicate_columns": self.duplicate_columns,
            "inconsistencies": self.inconsistencies,
        }


def _missing_aggs(df: DataFrame, alias: str = "{name}") -> list[Column]:
    """Per-column missing-count aggregate expressions (NaN counts as
    missing for float columns) — the ONE definition of 'missing', shared
    by missing_counts and audit so the semantics cannot drift apart."""
    aggs = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        miss = c.isNull()
        if isinstance(f_.dataType, (T.DoubleType, T.FloatType)):
            miss = miss | F.isnan(c)
        aggs.append(F.count(F.when(miss, 1)).alias(alias.format(name=f_.name)))
    return aggs


def missing_counts(df: DataFrame) -> DataFrame:
    """Per-column missing counts in one pass (SURVEY §2.4 A3, reference
    audit_report.py:51-54). NaN counts as missing for float columns."""
    return df.select(_missing_aggs(df))


def duplicate_column_groups(columns: Sequence[str]) -> dict[str, list[str]]:
    """Detect position-suffixed duplicate header names (OrderID0/OrderID14).

    A NAME-shape heuristic (reference parity): legitimately distinct
    numbered columns like Address1/Address2 can false-positive, which is
    why the cleaning interpreter VERIFIES the group members are
    value-identical before dropping any of them (clean.py — a name match
    alone deciding a column drop would be silent data loss; review
    finding)."""
    groups: dict[str, list[str]] = {}
    for c in columns:
        m = DUP_COL_SUFFIX_RE.match(c)
        if m:
            groups.setdefault(m.group(1), []).append(c)
    return {base: cols for base, cols in groups.items() if len(cols) > 1}


def audit(
    df: DataFrame,
    source: str,
    id_col: str | None = None,
    rules: Sequence[AuditRule] = (),
    collect_ids: bool = True,
    max_ids: int = 1000,
) -> AuditReport:
    """Run the full audit in two full-table jobs (metrics pass + dedup
    pass), plus — with ``collect_ids`` — one BOUNDED top-k job per
    VIOLATED rule for its sample IDs.

    ``collect_ids`` caps offending-ID arrays at ``max_ids`` per rule,
    returned in sorted order. The samples come from per-rule
    orderBy+limit jobs (TakeOrderedAndProject: a max_ids-sized heap per
    partition) instead of a collect_list sliced AFTER aggregation — the
    slice bounded only the returned array, while the aggregation buffer
    itself held EVERY violating ID on one reduce task (unbounded memory
    at exactly the scale the audit targets; review finding). Set False
    for pure counts."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__row_count")]
    aggs += _missing_aggs(df, alias="__miss__{name}")
    for i, r in enumerate(rules):
        aggs.append(F.count(F.when(r.predicate, 1)).alias(f"__viol__{i}"))
    row = df.agg(*aggs).first()

    # __row_count was just computed: subtracting from a fresh df.count()
    # would re-scan the full input a third time (review finding)
    dup_rows = row["__row_count"] - df.dropDuplicates().count()

    inconsistencies: dict[str, dict] = {}
    for i, r in enumerate(rules):
        n = row[f"__viol__{i}"]
        if n:
            entry = {"expected": r.expected, "count": n}
            if collect_ids and id_col is not None:
                entry["error_ids"] = [
                    x[0]
                    for x in df.filter(r.predicate)
                    .select(id_col)
                    .orderBy(id_col)
                    .limit(max_ids)
                    .collect()
                ]
            inconsistencies[r.column] = entry

    return AuditReport(
        source=source,
        row_count=row["__row_count"],
        missing_values={
            f_.name: row[f"__miss__{f_.name}"]
            for f_ in df.schema.fields
            if row[f"__miss__{f_.name}"]
        },
        duplicate_rows=dup_rows,
        duplicate_columns=duplicate_column_groups(df.columns),
        inconsistencies=inconsistencies,
    )


def violations(df: DataFrame, rules: Sequence[AuditRule], id_col: str) -> DataFrame:
    """100TB path: emit (id, column, expected) violation rows as a DataFrame
    to be written to a violations table — nothing is collected to the driver."""
    structs = [
        F.when(
            r.predicate,
            F.struct(F.lit(r.column).alias("column"), F.lit(r.expected).alias("expected")),
        )
        for r in rules
    ]
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array(*structs)).alias("v"))
        .filter(F.col("v").isNotNull())
        .select("id", "v.column", "v.expected")
    )
