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
# OrderID14) — reference audit_report.py:63-84.
DUP_COL_SUFFIX_RE = re.compile(r"^([A-Za-z]+?)(\d+)$")


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


def missing_counts(df: DataFrame) -> DataFrame:
    """Per-column missing counts in one pass (SURVEY §2.4 A3, reference
    audit_report.py:51-54). NaN counts as missing for float columns."""
    aggs = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        miss = c.isNull()
        if isinstance(f_.dataType, (T.DoubleType, T.FloatType)):
            miss = miss | F.isnan(c)
        aggs.append(F.count(F.when(miss, 1)).alias(f_.name))
    return df.select(aggs)


def duplicate_column_groups(columns: Sequence[str]) -> dict[str, list[str]]:
    """Detect position-suffixed duplicate header names (OrderID0/OrderID14)."""
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
    """Run the full audit in two jobs total (metrics pass + dedup pass).

    ``collect_ids`` caps offending-ID arrays at ``max_ids`` per rule —
    bounded driver memory at any scale. Set False for pure counts.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__row_count")]
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        miss = c.isNull()
        if isinstance(f_.dataType, (T.DoubleType, T.FloatType)):
            miss = miss | F.isnan(c)
        aggs.append(F.count(F.when(miss, 1)).alias(f"__miss__{f_.name}"))
    for i, r in enumerate(rules):
        aggs.append(F.count(F.when(r.predicate, 1)).alias(f"__viol__{i}"))
        if collect_ids and id_col is not None:
            capped = F.when(r.predicate, F.col(id_col))
            aggs.append(
                F.slice(F.sort_array(F.collect_list(capped)), 1, max_ids).alias(f"__ids__{i}")
            )
    row = df.agg(*aggs).first()

    dup_rows = df.count() - df.dropDuplicates().count()

    inconsistencies: dict[str, dict] = {}
    for i, r in enumerate(rules):
        n = row[f"__viol__{i}"]
        if n:
            entry = {"expected": r.expected, "count": n}
            if collect_ids and id_col is not None:
                entry["error_ids"] = list(row[f"__ids__{i}"])
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
