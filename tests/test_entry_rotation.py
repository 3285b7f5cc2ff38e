"""The driver samples the FIRST 50 entries of __spark_entry__.queries();
these tests pin the rotation contract (etl_tool_spark.rotation) that
makes that window converge to — and then keep re-verifying — the full
catalog across rounds (no Spark session needed).

Round-4 contract change: a query counts as driver-checked only if a
report row actually PASSED (rows+schema+hash, no error). Round 3 counted
mere presence, which rotated 8 hash-mismatched queries out of the window
forever — their fixes could never have earned a green row.

Round-8 contract change: the green tail is ordered least-recently-
verified first (round-7 verdict item 1) — with everything green,
registration order would pin the same first-40 greens into every window
and the other ~155 queries could regress invisibly forever.
"""

import importlib.util
import json
import os

from etl_tool_spark import rotation as rot

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entrymod_under_test", os.path.join(_HERE, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _write_report(tmp_path, rnd, rows):
    p = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
    p.write_text(json.dumps(rows))


_GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
          "err": None}
_RED = {"rows_match": True, "schema_match": True, "hash_match": False,
        "err": None}


def test_sentinels_lead_then_retry_then_fresh_then_green():
    m = _entry_mod()
    order = list(m.queries())
    green, failed, _ = rot.driver_status(_HERE, set(m.oracle_sql()))
    sentinels = [s for s in m._SENTINELS if s in order]
    assert order[:len(sentinels)] == sentinels
    rest = order[len(sentinels):]
    retry = [n for n in rest if n in failed]
    fresh = [n for n in rest if n not in failed and n not in green]
    assert rest[:len(retry)] == retry, "failed queries must re-queue first"
    assert sorted(rest[len(retry):len(retry) + len(fresh)]) == sorted(fresh)


def test_failed_rows_are_not_seen():
    """A red report row must NOT retire a query from the window."""
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": "TypeError: unhashable type: 'list'"}
    assert not rot.row_passed(_RED, has_oracle=True)
    assert not rot.row_passed(crashed, has_oracle=True)
    assert rot.row_passed(_GREEN, has_oracle=True)


def test_no_oracle_rows_retire_only_while_oracle_absent():
    """A rows-only check retires a query only as long as it still ships
    no oracle; gaining an oracle re-queues it for a real hash check."""
    row = {"rows_match": True, "schema_match": None, "hash_match": None,
           "err": "no_oracle"}
    assert rot.row_passed(row, has_oracle=False)
    assert not rot.row_passed(row, has_oracle=True)


def test_green_tail_cycles_least_recently_verified(tmp_path):
    """With everything green, successive 50-query windows must cycle
    through the catalog instead of re-pinning the same prefix: simulate
    4 rounds of a 12-query catalog with a 4-slot window (1 sentinel +
    3 tail) and assert every query is re-verified within the cycle."""
    names = [f"q{i:02d}" for i in range(12)]
    sentinels = [names[0]]
    oracle = set(names)
    # Round 1: everything earned a green row at once.
    _write_report(tmp_path, 1, {n: _GREEN for n in names})
    seen_rounds = {n: 1 for n in names}
    for rnd in range(2, 6):
        order = rot.rotation(names, sentinels, str(tmp_path), oracle)
        assert order[0] == names[0]
        tail = order[1:]
        # LRU: the window's tail slots take the globally stalest queries.
        window = [order[0]] + tail[:3]
        ages = [seen_rounds[n] for n in tail]
        assert sorted(ages[:3]) == sorted(ages)[:3], (
            f"round {rnd}: window {window} skipped older queries")
        _write_report(tmp_path, rnd, {n: _GREEN for n in window})
        for n in window:
            seen_rounds[n] = rnd
    # 11 tail queries / 3 slots -> every query re-verified within 4 rounds.
    assert min(seen_rounds.values()) >= 2, (
        f"stale queries never re-sampled: "
        f"{[n for n, r in seen_rounds.items() if r < 2]}")


def test_red_row_outranks_lru_green(tmp_path):
    """A regression in an old green must jump the LRU queue entirely."""
    names = ["s", "a", "b", "c"]
    _write_report(tmp_path, 1, {n: _GREEN for n in names})
    _write_report(tmp_path, 2, {"b": _RED})
    order = rot.rotation(names, ["s"], str(tmp_path), set(names))
    assert order[:2] == ["s", "b"]
    # Remaining greens LRU: a and c last seen r1 (tie -> registration).
    assert order[2:] == ["a", "c"]


def test_window_spends_slots_on_retry_and_unchecked():
    """While failed/unchecked queries remain, the 50-slot window must
    contain no already-green non-sentinel (a wasted slot)."""
    m = _entry_mod()
    order = list(m.queries())
    green, failed, _ = rot.driver_status(_HERE, set(m.oracle_sql()))
    pending_total = sum(1 for n in order if n not in green)
    window = order[:50]
    wasted = [n for n in window
              if n in green and n not in failed and n not in m._SENTINELS]
    if pending_total >= 50 - len(m._SENTINELS):
        assert not wasted, f"green queries occupy pending slots: {wasted}"


def test_live_window_rotates_vs_last_report():
    """Against the repo's real reports: with zero failed and zero fresh,
    the next window's non-sentinel slots must all come from queries NOT
    in the latest report (they are by construction the oldest)."""
    m = _entry_mod()
    green, failed, last_round = rot.driver_status(_HERE, set(m.oracle_sql()))
    order = list(m.queries())
    fresh = [n for n in order if n not in green and n not in failed]
    if failed or fresh or not last_round:
        return  # mid-backlog states are covered by the synthetic test
    newest = max(last_round.values())
    in_last = {n for n, r in last_round.items() if r == newest}
    tail_window = [n for n in order[:50] if n not in m._SENTINELS]
    overlap = [n for n in tail_window if n in in_last]
    assert len(overlap) <= 5, (
        f"window re-checks {len(overlap)} queries from round {newest}: "
        f"{overlap[:10]}")


def test_oracle_keys_subset_of_queries():
    m = _entry_mod()
    q = m.queries()
    extra = set(m.oracle_sql()) - set(q)
    assert not extra, f"oracle entries without a query: {extra}"


def test_rotation_is_deterministic():
    m = _entry_mod()
    assert list(m.queries()) == list(m.queries())


def test_split_knobs_gated_on_local_master():
    """The 4 MiB small-file split sizes are a local-bench tuning; a
    cluster master must get an EMPTY override dict (Spark's 128 MiB
    defaults), or a 100 TB scan schedules 25M+ tasks."""
    from etl_tool_spark.session import split_knobs
    local = split_knobs("local[32]")
    assert local["spark.sql.files.maxPartitionBytes"] == str(4 * 1024 * 1024)
    assert local["spark.sql.files.openCostInBytes"] == str(1 * 1024 * 1024)
    for master in ("yarn", "k8s://https://host:443",
                   "spark://master:7077", ""):
        assert split_knobs(master) == {}, master
