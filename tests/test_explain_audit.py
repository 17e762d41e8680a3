"""Plan-quality gate: tools/explain_audit.py must report ALL OK.

The audit asserts the scale-critical physical-plan properties (filters in
PushedFilters, broadcast dimension joins, bounded exchange counts, no
cartesian grid joins).  Running it from pytest keeps the checks from rotting
when read paths change shape (round-4 verdict: two stale regexes reported
false MISSes for a round).  Plan-only — no query is executed.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def test_explain_audit_all_ok(spark, sf_dir):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "explain_audit", os.path.join(root, "tools", "explain_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    try:
        # get_spark() inside main() getOrCreate()s onto the session fixture
        sys.argv = ["explain_audit.py", sf_dir]
        assert mod.main() == 0
    finally:
        sys.argv = argv
