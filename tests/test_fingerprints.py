"""The force-recheck fingerprint resolver (tools/_query_fingerprints.py) is
load-bearing for the driver-evidence policy: it decides which queries sort
as changed-since-evidence. Pin its precision properties — the first
(file-granular) version flagged 211/212 queries after any infrastructure
edit, which made the 50-slot window useless."""

import importlib.util
import inspect
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "qfp", os.path.join(REPO, "tools", "_query_fingerprints.py")
)
qfp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(qfp)


def _collected(query_name):
    from bbt_etl_dw_spark.suite import load_all

    fn = load_all()[query_name].builder
    r = qfp._Resolver(REPO)
    r.expand(fn.__module__, textwrap.dedent(inspect.getsource(fn)))
    return {f"{m.rsplit('.', 1)[-1]}.{s}" for (m, s) in r.collected if s}


def test_resolver_reaches_transitive_operator_symbols():
    got = _collected("doc_dedup_clusters")
    # the builder calls collapsed_jaccard_edges + dedup_clusters; those
    # transitively reach the jaccard pipeline and the checkpoint helper
    assert "dedup.collapsed_jaccard_edges" in got
    assert "dedup.dedup_clusters" in got
    assert "dedup.ngram_jaccard_pairs" in got
    assert "ckpt.materialize" in got


def test_resolver_is_symbol_precise_not_file_granular():
    got = _collected("pricing_summary")
    # pricing_summary must NOT be fingerprint-coupled to the dedup/text
    # operators: a dedup.py edit must not flag it
    assert not any(s.startswith(("dedup.", "textstats.", "basket.")) for s in got)
    # but it IS coupled to the exact-decimal helpers it actually uses
    assert "numeric.dsum" in got


def test_resolver_excludes_registration_harness():
    got = _collected("pricing_summary")
    assert "suite.register" not in got and "suite.load_all" not in got


def test_normalize_ignores_comments_and_docstrings():
    a = '''
def f(x):
    """Original docstring."""
    # a comment
    y = x + 1  # trailing note
    return y
'''
    b = '''
def f(x):
    "Rewritten docs, much longer and more helpful."
    y = x + 1
    return y
'''
    c = '''
def f(x):
    y = x + 2
    return y
'''
    assert qfp._normalize(a) == qfp._normalize(b)  # doc/comment edits: same
    assert qfp._normalize(a) != qfp._normalize(c)  # code edit: different


def test_normalize_handles_nonparseable_and_empty_bodies():
    marker = "->reexport pkg.mod.sym"
    assert qfp._normalize(marker) == marker  # raw fallback, no crash
    only_doc = 'def g():\n    """just a docstring"""\n'
    out = qfp._normalize(only_doc)
    assert "pass" in out and "docstring" not in out
