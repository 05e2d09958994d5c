"""Structured Streaming surface of the engine.

The reference has no streaming at all (SURVEY §2.9); this package is the
scale extension (§7 phase 6): event-time windowed aggregation with
watermarks, session windows, streaming dedup, and a custom stateful
operator — all written against the unified DataFrame API so every
transformation runs identically on a batch DataFrame (oracle-checkable)
and a streaming one (tested via file-source micro-batches + memory sink).
"""

from bbt_etl_dw_spark.streaming.ops import (
    EVENTS_SCHEMA,
    events_file_stream,
    first_event_per_key,
    session_window_stats,
    sliding_event_stats,
    stream_dedup,
    tumbling_event_stats,
)

__all__ = [
    "EVENTS_SCHEMA",
    "events_file_stream",
    "first_event_per_key",
    "session_window_stats",
    "sliding_event_stats",
    "stream_dedup",
    "tumbling_event_stats",
]
