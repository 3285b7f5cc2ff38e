"""Property-based dedup parity: random record batches deduplicated by a
Python reference implementation of the Go semantics (dedupRecords,
internal/processor/processor.go:277-314 + CompareValues,
transform.go:1052-1117) must match the window-based Spark operator.

CompareValues semantics exercised here:
  * nil strategy value → CompareValues(nil, x) = -1: nil WINS 'min' and
    loses 'max'; among nils the earliest wins.
  * both values parse as float → numeric compare (even when stored as
    strings), else same-type compare (lexical for strings).
The generator draws each example's strategy values from EITHER an
all-numeric or an all-non-numeric pool (plus nulls): groups mixing
numeric and non-numeric strings make Go's pairwise relation
non-transitive (its fold result depends on encounter order), and the
Spark operator deliberately renders those with a deterministic
group-level rule instead — see the mixed-group unit test below.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.operators.dedup import dedup

key_vals = st.sampled_from([None, "k1", "k2", "k3"])
# two pools: cross-type numeric compare ints-as-strings, and pure lexical
numeric_pool = st.sampled_from([None, "1", "2", "10", "9", "-3", "2.5"])
string_pool = st.sampled_from([None, "abc", "B", "zz", "a", "<NIL>", ""])


def _records(strat_vals):
    return st.lists(
        st.tuples(key_vals, key_vals, strat_vals),
        min_size=0, max_size=12,
    ).map(lambda rows: [(i, a, b, s) for i, (a, b, s) in enumerate(rows)])


records = st.one_of(_records(numeric_pool), _records(string_pool))


def _compare(cur, sto):
    """Go CompareValues for string-typed fields: nil < everything; both
    parse → numeric; else lexical (same Go type: string vs string)."""
    if cur is None and sto is None:
        return 0
    if cur is None:
        return -1
    if sto is None:
        return 1

    def pf(x):
        try:
            return float(x)
        except ValueError:
            return None

    a, b = pf(cur), pf(sto)
    if a is not None and b is not None:
        return (a > b) - (a < b)
    return (cur > sto) - (cur < sto)


def ref_dedup(rows, strategy):
    """Go reference: encounter-order loop keeping one record per composite
    key. Null key fields hash as the '<ETL_NIL_OR_MISSING>' placeholder
    (distinct from a literal '<NIL>' string value)."""
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
        c = _compare(sv, seen[key][3])
        if (strategy == "min" and c < 0) or (strategy == "max" and c > 0):
            seen[key] = row
    return sorted(seen.values(), key=lambda r: r[0])


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=records, strategy=st.sampled_from(["first", "last", "min", "max"]))
def test_dedup_matches_reference(spark, rows, strategy):
    if not rows:
        return
    df = spark.createDataFrame(rows, "seq long, k1 string, k2 string, sv string")
    out = dedup(df, ["k1", "k2"], strategy,
                strategy_field="sv" if strategy in ("min", "max") else None,
                seq_col="seq")
    got = sorted((tuple(r) for r in out.collect()), key=lambda r: r[0])
    expected = ref_dedup(rows, strategy)
    assert got == expected, (rows, strategy)


def test_dedup_null_wins_min_loses_max(spark):
    """CompareValues(nil, x) = -1 (transform.go:1055-1060): a null
    strategy value KEEPS the record under 'min' and loses under 'max'."""
    rows = [(0, "k", "5"), (1, "k", None), (2, "k", "3"), (3, "k", None)]
    df = spark.createDataFrame(rows, "seq long, k string, sv string")
    got_min = dedup(df, ["k"], "min", "sv", seq_col="seq").collect()
    assert [(r["seq"], r["sv"]) for r in got_min] == [(1, None)]  # earliest null
    got_max = dedup(df, ["k"], "max", "sv", seq_col="seq").collect()
    assert [(r["seq"], r["sv"]) for r in got_max] == [(0, "5")]


def test_dedup_nil_literal_does_not_collide_with_null_key(spark):
    """A literal '<NIL>' string key must form a DIFFERENT group than a
    null key (which hashes as '<ETL_NIL_OR_MISSING>', processor.go:283-291)."""
    rows = [(0, "<NIL>", "a"), (1, None, "b")]
    df = spark.createDataFrame(rows, "seq long, k string, v string")
    out = dedup(df, ["k"], "first", seq_col="seq")
    assert out.count() == 2


def test_dedup_mixed_group_rule_documented(spark):
    """Groups mixing numeric and non-numeric strings: Go's pairwise fold
    is non-transitive (e.g. '10' <num '2'? no — 2<10 numerically, but
    '10' <lex '1x' <lex '2'), so its result depends on encounter order.
    The Spark operator uses the deterministic group-level rule: numeric
    order iff every non-null value parses, else lexical throughout."""
    rows = [(0, "k", "10"), (1, "k", "2"), (2, "k", "1x")]
    df = spark.createDataFrame(rows, "seq long, k string, sv string")
    got = dedup(df, ["k"], "min", "sv", seq_col="seq").collect()
    assert [r["sv"] for r in got] == ["10"]  # lexical min of the group


# ---------------------------------------------------------------------------
# paragraph_dedup: random corpora vs a pure-Python reference
# ---------------------------------------------------------------------------

_para_pool = st.sampled_from(["", "a", "bb", "FOOT", "x y", "zz", "q"])
_doc = st.lists(_para_pool, min_size=1, max_size=5)
_corpus = st.lists(_doc, min_size=0, max_size=8)


def _paragraph_dedup_ref(docs):
    """Pure-Python reference: global first occurrence by (id, pos)."""
    seen = set()
    out = {}
    for i, paras in enumerate(docs):
        kept = []
        dropped = 0
        for p in paras:
            if p in seen:
                dropped += 1
            else:
                seen.add(p)
                kept.append(p)
        out[i] = ("\n".join(kept), len(kept), dropped)
    return out


@given(docs=_corpus)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_paragraph_dedup_matches_reference(spark, docs):
    from etl_tool_spark.llm.dedup import paragraph_dedup

    rows = [(i, "\n".join(paras)) for i, paras in enumerate(docs)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
           for r in paragraph_dedup(df).collect()}
    assert got == _paragraph_dedup_ref(docs)
