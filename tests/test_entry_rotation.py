"""The driver samples the FIRST 50 entries of __spark_entry__.queries();
these tests pin the rotation contract that makes that window converge to
full-catalog coverage across rounds (no Spark session needed).

Round-4 contract change: a query counts as driver-checked only if a
report row actually PASSED (rows+schema+hash, no error). Round 3 counted
mere presence, which rotated 8 hash-mismatched queries out of the window
forever — their fixes could never have earned a green row."""

import importlib.util
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entrymod_under_test", os.path.join(_HERE, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_sentinels_lead_then_retry_then_fresh_then_green():
    m = _entry_mod()
    order = list(m.queries())
    green, failed = m._driver_status()
    sentinels = [s for s in m._SENTINELS if s in order]
    assert order[:len(sentinels)] == sentinels
    rest = order[len(sentinels):]
    retry = [n for n in rest if n in failed]
    fresh = [n for n in rest if n not in failed and n not in green]
    assert rest[:len(retry)] == retry, "failed queries must re-queue first"
    assert rest[len(retry):len(retry) + len(fresh)] == fresh


def test_failed_rows_are_not_seen():
    """A red report row must NOT retire a query from the window."""
    m = _entry_mod()
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "err": None}
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "err": None}
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": "TypeError: unhashable type: 'list'"}
    assert not m._row_passed(red, has_oracle=True)
    assert not m._row_passed(crashed, has_oracle=True)
    assert m._row_passed(green, has_oracle=True)


def test_no_oracle_rows_retire_only_while_oracle_absent():
    """A rows-only check retires a query only as long as it still ships
    no oracle; gaining an oracle re-queues it for a real hash check."""
    m = _entry_mod()
    row = {"rows_match": True, "schema_match": None, "hash_match": None,
           "err": "no_oracle"}
    assert m._row_passed(row, has_oracle=False)
    assert not m._row_passed(row, has_oracle=True)


def test_window_spends_slots_on_retry_and_unchecked():
    """While failed/unchecked queries remain, the 50-slot window must
    contain no already-green non-sentinel (a wasted slot)."""
    m = _entry_mod()
    order = list(m.queries())
    green, failed = m._driver_status()
    pending_total = sum(1 for n in order if n not in green)
    window = order[:50]
    wasted = [n for n in window
              if n in green and n not in failed and n not in m._SENTINELS]
    if pending_total >= 50 - len(m._SENTINELS):
        assert not wasted, f"green queries occupy pending slots: {wasted}"


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
