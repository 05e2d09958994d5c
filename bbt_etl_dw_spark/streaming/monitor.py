"""Streaming health metrics: the numbers an on-call engineer needs from a
running query, pulled from Structured Streaming's progress reports.

The silent failure mode of watermarked pipelines is DATA LOSS BY DESIGN:
rows older than the watermark are dropped without any error — correct
semantics, invisible unless someone watches the counters. At 100 TB an
upstream producer lagging by one partition can shed hours of events while
every dashboard stays green. These helpers make the drop observable so it
can be alerted on instead of discovered at training time.
"""

from __future__ import annotations

from typing import Any


def progress_metrics(query) -> dict[str, Any]:
    """Operational summary of a StreamingQuery's most recent micro-batch:
    input rows, per-state-operator rows dropped by the watermark, total
    state rows/bytes, and the current event-time watermark. Zeros when no
    batch has completed yet."""
    p = query.lastProgress or {}
    state_ops = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId", -1),
        "input_rows": int(p.get("numInputRows") or 0),
        "dropped_by_watermark": sum(
            int(s.get("numRowsDroppedByWatermark") or 0) for s in state_ops
        ),
        "state_rows": sum(int(s.get("numRowsTotal") or 0) for s in state_ops),
        "state_bytes": sum(int(s.get("memoryUsedBytes") or 0) for s in state_ops),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def cumulative_dropped(query) -> int:
    """Total watermark-dropped rows across every progress report the
    driver still retains (recentProgress keeps the last ~100 batches —
    poll and accumulate externally for longer horizons)."""
    total = 0
    for p in query.recentProgress or []:
        for s in p.get("stateOperators") or []:
            total += int(s.get("numRowsDroppedByWatermark") or 0)
    return total
