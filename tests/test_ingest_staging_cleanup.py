"""Stager failure hygiene (ADVICE r12): the scratch dir's atexit rmtree
must be registered IMMEDIATELY after mkdtemp — BEFORE any staging work —
so a mid-stage failure (e.g. one of the Derby star's 8 JDBC writes)
cannot leak the temp dir for the process lifetime. A failed stage must
also leave the success-cache unpopulated so the next call retries."""

import os
import shutil

import pytest

import bbt_etl_dw_spark.suite.ingest as ing


def _capture_registrations(monkeypatch):
    captured = []
    monkeypatch.setattr(
        ing.atexit, "register", lambda fn, *a, **k: captured.append((fn, a))
    )
    return captured


def test_scratch_dir_registers_cleanup_before_returning(monkeypatch):
    captured = _capture_registrations(monkeypatch)
    d = ing._scratch_dir("bbt_test_scratch_")
    try:
        assert os.path.isdir(d)
        assert captured == [(shutil.rmtree, (d,))]
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize(
    "stager,cache,prefix",
    [
        (ing._full_star_url, ing._FULL_STAR_CACHE, "bbt_jdbc_star_"),
        (ing._span_ingest_root, ing._SPAN_INGEST_CACHE, "bbt_span_ingest_"),
        (ing._semantic_ingest_root, ing._SEM_INGEST_CACHE, "bbt_sem_ingest_"),
    ],
)
def test_mid_stage_failure_still_has_cleanup_registered(
    monkeypatch, stager, cache, prefix
):
    captured = _capture_registrations(monkeypatch)

    def boom(*a, **k):
        raise RuntimeError("simulated mid-stage failure")

    # the first staging step every stager takes is a catalog read; making
    # it raise simulates any mid-stage failure after mkdtemp
    monkeypatch.setattr(ing, "table", boom)
    key = "/nonexistent-sf-dir-for-cleanup-test"
    assert key not in cache
    with pytest.raises(RuntimeError, match="simulated mid-stage"):
        stager(None, key)
    rmtrees = [a[0] for fn, a in captured if fn is shutil.rmtree]
    assert len(rmtrees) == 1 and prefix in rmtrees[0]
    assert os.path.isdir(rmtrees[0])  # dir exists; cleanup owns it
    # failure must not populate the success cache (retry from scratch)
    assert key not in cache
    shutil.rmtree(rmtrees[0], ignore_errors=True)
