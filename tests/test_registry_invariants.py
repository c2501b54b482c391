"""Registry invariants: the driver consumes `queries()` positionally (the
leading entries form its correctness window), so registry edits must not
silently reorder, drop, or orphan entries.  Pure-structure checks — no
Spark session, runs in milliseconds."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_window_leads_registry():
    """The declared driver window is exactly the leading block of
    queries() — a reordering that pushed a window entry out of the
    driver's slice would silently drop its correctness row."""
    window = E._R12_WINDOW
    assert len(window) == 50
    assert list(E.queries())[: len(window)] == window


def test_window_names_resolve():
    qs = E.queries()
    missing = [n for n in E._R12_WINDOW if n not in qs]
    assert not missing, f"window names not in registry: {missing}"


def test_every_query_has_an_oracle():
    """Every registry entry carries DuckDB oracle SQL (the repo's
    correctness contract: rows-only entries would silently downgrade the
    driver's check)."""
    qs, sql = E.queries(), E.oracle_sql()
    missing = [n for n in qs if n not in sql]
    assert not missing, f"queries with no oracle: {missing}"
    extra = [n for n in sql if n not in qs]
    assert not extra, f"oracles with no query: {extra}"


def test_no_duplicate_registry_names():
    """_ALL_QUERIES keys are unique by dict construction, but the window
    must not repeat a name (a repeat would shrink the driver's effective
    coverage by one slot)."""
    assert len(set(E._R12_WINDOW)) == len(E._R12_WINDOW)


def test_plan_only_names_resolve():
    qs = E.queries()
    missing = [n for n in E.plan_only() if n not in qs]
    assert not missing, f"plan_only names not in registry: {missing}"


def test_incremental_phase_names_resolve():
    qs = E.queries()
    missing = [n for n in E.incremental_phases() if n not in qs]
    assert not missing, f"incremental_phases names not in registry: {missing}"
