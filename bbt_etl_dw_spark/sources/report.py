"""Audit/anomaly report sinks — SURVEY §2.1 S5 (reference
audit_report.py:152-181, anomalies.py:146-155).

Reports are driver-side by design (they are small, bounded summaries —
the audit engine caps id arrays; see operators/audit.py). JSON keeps the
reference's array-of-reports shape so downstream cleaning can consume it.
"""

from __future__ import annotations

import json
from pathlib import Path

from bbt_etl_dw_spark.operators.audit import AuditReport


def write_audit_json(reports: list[AuditReport], path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump([r.to_dict() for r in reports], f, indent=2)


def write_audit_txt(reports: list[AuditReport], path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    lines: list[str] = []
    for r in reports:
        lines.append(f"=== {r.source} ===")
        lines.append(f"rows: {r.row_count}")
        lines.append(f"duplicate_rows: {r.duplicate_rows}")
        if r.duplicate_columns:
            lines.append(f"duplicate_columns: {r.duplicate_columns}")
        for col, n in sorted(r.missing_values.items()):
            lines.append(f"missing {col}: {n}")
        for col, info in sorted(r.inconsistencies.items()):
            lines.append(f"inconsistent {col} (expected {info['expected']}): {info['count']}")
        lines.append("")
    Path(path).write_text("\n".join(lines))


def read_audit_json(path: str) -> list[dict]:
    with open(path) as f:
        return json.load(f)
