"""Property-based parity for the round-4 retrieval/dedup-surgery
operators: random tiny corpora evaluated by straight-line pure-Python
reference implementations must match the distributed Spark operators
bit-for-bit (excision) / to float tolerance (BM25).

The vocabulary is deliberately tiny (5 tokens) so repeated n-grams and
query-term hits are dense — the interesting paths (overlapping spans,
keeper contention, multi-term tf) fire on nearly every example.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm import text as X

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=0, max_size=6,
).map(lambda ds: [(i, " ".join(t)) for i, t in enumerate(ds)])


def _ref_excise(docs, n, min_docs=2):
    """Straight-line reference: mark every start whose n-gram recurs in
    >= min_docs distinct docs and whose doc is not the gram's min-id
    keeper; remove the union of covered positions; re-join survivors."""
    toks = {d: t.strip().lower().split() for d, t in docs if t.strip()}
    containing: dict[str, set[int]] = {}
    starts: dict[int, list[tuple[int, str]]] = {}
    for d, t in toks.items():
        pg = [(p, " ".join(t[p:p + n])) for p in range(len(t) - n + 1)]
        starts[d] = pg
        for _, g in pg:
            containing.setdefault(g, set()).add(d)
    keeper = {g: min(ds) for g, ds in containing.items()
              if len(ds) >= min_docs}
    out = {}
    for d, t in toks.items():
        removed: set[int] = set()
        for p, g in starts[d]:
            if g in keeper and keeper[g] != d:
                removed.update(range(p, p + n))
        kept = [tok for i, tok in enumerate(t) if i not in removed]
        out[d] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=docs_strategy)
def test_excise_matches_reference(spark, docs):
    if not any(t.strip() for _, t in docs):
        return
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
           for r in X.excise_repeated_spans(df, n=3).collect()}
    assert got == _ref_excise(docs, n=3)


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.strip().lower().split() for d, t in docs if t.strip()}
    if not toks:
        return {}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    tf = {(d, q): t.count(q) for d, t in toks.items() for q in terms}
    df = {q: sum(1 for d in toks if tf[(d, q)] > 0) for q in terms}
    out: dict[int, float] = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            if tf[(d, q)] == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += (idf * tf[(d, q)] * (k1 + 1.0)
                  / (tf[(d, q)] + k1 * (1.0 - b + b * len(t) / avgdl)))
        if s != 0.0:
            out[d] = s
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=docs_strategy)
def test_bm25_matches_reference(spark, docs):
    if not any(t.strip() for _, t in docs):
        return
    terms = ["alpha", "delta"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25_raw"]
           for r in X.bm25_scores(df, terms).collect()}
    ref = _ref_bm25(docs, terms)
    assert set(got) == set(ref)
    for d in ref:
        assert got[d] == pytest.approx(ref[d])
