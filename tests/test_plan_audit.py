"""Repo-wide physical-plan audit: every driver query is swept for scale
anti-patterns (cartesian joins, non-finalize single-partition exchanges,
row-at-a-time Python), and the findings must match tools/audit_plans.py's
justified allowlist EXACTLY — new anti-patterns fail, and allowlist entries
whose pattern was engineered away fail as stale (the list only shrinks
deliberately)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"


def test_no_scale_antipatterns_in_any_query(spark):
    from audit_plans import ALLOWLIST, audit

    findings = audit(spark, SF)

    violations = {
        name: sorted(set(pats) - ALLOWLIST.get(name, frozenset()))
        for name, pats in findings.items()
        if set(pats) - ALLOWLIST.get(name, frozenset())
    }
    assert not violations, f"unjustified plan anti-patterns: {violations}"

    stale = {
        name: sorted(allowed - set(findings.get(name, [])))
        for name, allowed in ALLOWLIST.items()
        if allowed - set(findings.get(name, []))
    }
    assert not stale, f"stale allowlist entries (pattern no longer occurs): {stale}"
