"""The driver samples the FIRST 50 entries of __spark_entry__.queries();
these tests pin the rotation contract that makes that window converge to
full-catalog coverage across rounds (no Spark session needed)."""

import glob
import importlib.util
import json
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entrymod_under_test", os.path.join(_HERE, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_sentinels_lead_then_fresh_then_green():
    m = _entry_mod()
    order = list(m.queries())
    sentinels = [s for s in m._SENTINELS if s in order]
    assert order[:len(sentinels)] == sentinels
    seen = m._driver_checked() - set(sentinels)
    rest = order[len(sentinels):]
    fresh = [n for n in rest if n not in seen]
    # every never-checked query sorts before every already-green one
    assert rest[:len(fresh)] == fresh


def test_window_spends_slots_on_unchecked_queries():
    """While unchecked queries remain, the 50-slot window must contain
    no already-green non-sentinel (a wasted slot)."""
    m = _entry_mod()
    order = list(m.queries())
    seen = m._driver_checked()
    unchecked_total = sum(1 for n in order if n not in seen)
    window = order[:50]
    wasted = [n for n in window
              if n in seen and n not in m._SENTINELS]
    if unchecked_total >= 50 - len(m._SENTINELS):
        assert not wasted, f"green queries occupy fresh slots: {wasted}"


def test_oracle_keys_subset_of_queries():
    m = _entry_mod()
    q = m.queries()
    extra = set(m.oracle_sql()) - set(q)
    assert not extra, f"oracle entries without a query: {extra}"


def test_rotation_is_deterministic():
    m = _entry_mod()
    assert list(m.queries()) == list(m.queries())
