"""Property-based dedup parity: random record batches deduplicated by a
Python reference implementation of the Go semantics (dedupRecords,
internal/processor/processor.go:277-314 + CompareValues,
transform.go:1052-1117) must match the window-based Spark operator."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.operators.dedup import dedup

# values deliberately mix ints-as-strings with ints (cross-type numeric
# compare) plus nulls (placeholder path)
key_vals = st.sampled_from([None, "k1", "k2", "k3"])
strat_vals = st.sampled_from([None, "1", "2", "10", "9"])

records = st.lists(
    st.tuples(key_vals, key_vals, strat_vals),
    min_size=0, max_size=12,
).map(lambda rows: [(i, a, b, s) for i, (a, b, s) in enumerate(rows)])


def ref_dedup(rows, strategy):
    """Go reference: encounter-order loop keeping one record per composite
    key; min/max compare numerically when both parse as float, else string;
    null/missing strategy value: current-missing keeps stored,
    stored-missing replaces; ties keep stored."""
    placeholder = "<ETL_NIL_OR_MISSING>"
    seen = {}
    for row in rows:
        seq, k1, k2, sv = row
        key = "||".join(v if v is not None else placeholder for v in (k1, k2))
        if key not in seen:
            seen[key] = row
            continue
        if strategy == "first":
            continue
        if strategy == "last":
            seen[key] = row
            continue
        stored_sv = seen[key][3]
        if sv is None:
            continue  # current missing → keep stored
        if stored_sv is None:
            seen[key] = row  # stored missing → replace
            continue
        cur, sto = float(sv), float(stored_sv)  # all test values numeric
        if (strategy == "min" and cur < sto) or (strategy == "max" and cur > sto):
            seen[key] = row
    return sorted(seen.values())


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=records, strategy=st.sampled_from(["first", "last", "min", "max"]))
def test_dedup_matches_reference(spark, rows, strategy):
    if not rows:
        return
    df = spark.createDataFrame(rows, "seq long, k1 string, k2 string, sv string")
    out = dedup(df, ["k1", "k2"], strategy,
                strategy_field="sv" if strategy in ("min", "max") else None,
                seq_col="seq")
    got = sorted(tuple(r) for r in out.collect())
    expected = ref_dedup(rows, strategy)
    assert got == expected, (rows, strategy)
