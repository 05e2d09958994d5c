"""bench.py lean-line contract: the ONE stdout JSON line must fit the
recording driver's 2000-char tail under every timings shape (ADVICE r11:
re-dump until it fits; ADVICE r12: even keep==1 can overflow with a
pathological name — the loop must run through keep==0)."""

import json

from bench import lean_bench_line


def test_short_line_untouched():
    line = lean_bench_line({"q1": 1.234, "q2": 2.0}, 3.234, 0.1)
    d = json.loads(line)
    assert d["queries"] == {"q1": 1.234, "q2": 2.0}
    assert "queries_truncated_to_slowest" not in d
    assert d["value"] == 3.234 and d["sf"] == 0.1


def test_truncates_to_slowest_and_fits():
    timings = {f"query_name_{i:04d}": float(i) for i in range(400)}
    line = lean_bench_line(timings, sum(timings.values()), 0.1)
    assert len(line) <= 1900
    d = json.loads(line)
    kept = d["queries_truncated_to_slowest"]
    assert 0 < kept <= 40
    # slowest kept: every kept entry beats every dropped one
    assert min(d["queries"].values()) >= 400 - kept
    assert d["value"] == sum(timings.values())


def test_single_oversized_entry_drops_to_empty_queries():
    # ADVICE r12: one entry alone exceeds the bound -> keep==0 final
    # iteration (empty queries map, truncated_to_slowest=0), re-dumped.
    timings = {"q" * 3000: 1.0}
    line = lean_bench_line(timings, 1.0, 0.01)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["queries"] == {}
    assert d["queries_truncated_to_slowest"] == 0
    assert d["value"] == 1.0


def test_pathological_limit_still_emits_contract_fields():
    # even metric/value/sf alone can't fit 10 chars; the function must
    # still return valid JSON with the totals rather than loop forever.
    line = lean_bench_line({"q": 1.0}, 1.0, 0.01, limit=10)
    d = json.loads(line)
    assert d["value"] == 1.0
    assert "queries" not in d
