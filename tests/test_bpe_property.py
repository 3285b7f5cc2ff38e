"""Distributed BPE (llm/bpe.py) vs an independent pure-Python model.

The reference model trains and encodes over SYMBOL LISTS (tuples), not
the engine's delimited-string representation — so the two
implementations share no code path: agreement checks both the
replace-all rewrite semantics and the (count DESC, left, right) argmax
tie-break."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm import bpe as B


# ---------------------------------------------------------------- model

def ref_apply(syms: tuple, left: str, right: str) -> tuple:
    """Leftmost non-overlapping replace-all of the pair over a symbol
    tuple — the greedy order BPE specifies."""
    out: list = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_train(word_freq: list[tuple[str, int]], k: int):
    """(merges, vocab): merges as (it, l, r, n) with the engine's
    tie-break; vocab as [(symbol_tuple, freq)]."""
    vocab = [(tuple(w), c) for w, c in word_freq]
    merges = []
    for it in range(1, k + 1):
        counts: dict = {}
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), n = min(counts.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((it, left, right, n))
        vocab = [(ref_apply(s, left, right), c) for s, c in vocab]
    return merges, vocab


def ref_segment(word: str, merges: list) -> tuple:
    syms = tuple(word)
    for _, left, right, _ in merges:
        syms = ref_apply(syms, left, right)
    return syms


# ----------------------------------------------------------- strategies

words = st.text(alphabet="abc", min_size=1, max_size=6)
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=10)


def _train_on_docs(spark, texts, k):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    merges, final = B.bpe_train_merges(B.word_frequencies(df), k)
    return df, merges, final


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs_strategy, st.integers(min_value=1, max_value=5))
def test_train_matches_reference(spark, texts, k):
    _, merges, _ = _train_on_docs(spark, texts, k)
    freq: dict = {}
    for t in texts:
        for w in t.lower().split():
            freq[w] = freq.get(w, 0) + 1
    want, _ = ref_train(sorted(freq.items()), k)
    got = [(m["it"], m["l"], m["r"], m["n"]) for m in merges]
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs_strategy)
def test_encode_matches_reference(spark, texts):
    _, merges, _ = _train_on_docs(spark, texts, 4)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id INT, text STRING")
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in B.bpe_token_counts(df, merges).collect()}
    ref_merges = [(m["it"], m["l"], m["r"], m["n"]) for m in merges]
    for i, t in enumerate(texts):
        toks = t.lower().split()
        want = (len(toks),
                sum(len(ref_segment(w, ref_merges)) for w in toks))
        assert got[i] == want


def test_consecutive_occurrences_all_merge_in_one_pass(spark):
    """'aaaa' + merge (a,a) must rewrite to (aa, aa) in ONE replace-all
    pass — the delimited-string pattern consumes only the inner half of
    each flanking delimiter precisely so the second non-overlapping
    occurrence still matches."""
    df = spark.createDataFrame([("aaaa aaaa aaa",)], "text STRING")
    merges, final = B.bpe_train_merges(B.word_frequencies(df), 1)
    assert (merges[0]["l"], merges[0]["r"]) == ("a", "a")
    # counting sees every ADJACENCY (overlapping): aaaa carries 3 (a,a)
    # pairs and appears twice, aaa carries 2 — 3*2 + 2 = 8
    assert merges[0]["n"] == 8
    rows = {tuple(r["syms"]) for r in
            final.selectExpr("filter(split(s, '  '), x -> x <> '') AS syms")
                 .collect()}
    assert rows == {("aa", "aa"), ("aa", "a")}


def test_symbol_boundary_never_crossed(spark):
    """A merged multi-char symbol must not be confused with the char
    pair spelling it: after (a,b)->ab, the pair (ab, c) in 'abc' is
    counted from the MERGED symbol, and a lone 'ab'-adjacent-to-'a'
    word must not match pattern (a, b) inside the merged symbol."""
    df = spark.createDataFrame([("ab ab abc",)], "text STRING")
    merges, final = B.bpe_train_merges(B.word_frequencies(df), 2)
    got = [(m["l"], m["r"], m["n"]) for m in merges]
    # it1: (a,b) appears 3x; it2: (ab,c) once — tie-broken vs nothing else
    assert got[0] == ("a", "b", 3)
    assert got[1] == ("ab", "c", 1)
    segs = {tuple(r["syms"]) for r in
            final.selectExpr("filter(split(s, '  '), x -> x <> '') AS syms")
                 .collect()}
    assert segs == {("ab",), ("abc",)}


def test_tie_break_is_count_then_symbols(spark):
    # 'ba' and 'ab' each appear twice: pairs (a,b) and (b,a) tie at 2.
    # (a,b) < (b,a) lexicographically, so it must win.
    df = spark.createDataFrame([("ab ab ba ba",)], "text STRING")
    merges, _ = B.bpe_train_merges(B.word_frequencies(df), 1)
    assert (merges[0]["l"], merges[0]["r"], merges[0]["n"]) == ("a", "b", 2)


def test_train_stops_when_no_pairs_remain(spark):
    df = spark.createDataFrame([("a b c",)], "text STRING")
    merges, _ = B.bpe_train_merges(B.word_frequencies(df), 5)
    assert merges == []  # single-char words carry no adjacent pair


def test_encode_counts_single_char_words(spark):
    """Encode keeps one-symbol words (train skips them for PAIRS only)."""
    df = spark.createDataFrame([(1, "a bb a")], "doc_id INT, text STRING")
    merges = [{"it": 1, "l": "b", "r": "b", "n": 1}]
    row = B.bpe_token_counts(df, merges).collect()[0]
    assert (row["n_words"], row["n_subwords"]) == (3, 3)  # a, bb(merged), a


def test_word_frequencies_skips_blank_docs(spark):
    df = spark.createDataFrame([("  ",), ("a a",)], "text STRING")
    rows = {(r["tok"], r["c"]) for r in B.word_frequencies(df).collect()}
    assert rows == {("a", 2)}


def test_fewer_learnable_merges_than_k_matches_oracle_semantics(spark):
    """A corpus that exhausts its pairs before K merges: the trainer
    breaks early and encode applies only the learned merges. The DuckDB
    oracle mirrors this with chr(7) identity replacements (catalog.py
    _bpe_oracle_ctes) — these are the values it produces for the same
    corpus, pinned here against the library."""
    df = spark.createDataFrame([(1, "ab ab c"), (2, "c c")],
                               "doc_id INT, text STRING")
    merges, _ = B.bpe_train_merges(B.word_frequencies(df), 4)
    assert [(m["it"], m["l"], m["r"], m["n"]) for m in merges] \
        == [(1, "a", "b", 2)]
    got = sorted((r["doc_id"], r["n_words"], r["n_subwords"])
                 for r in B.bpe_token_counts(df, merges).collect())
    assert got == [(1, 3, 3), (2, 2, 2)]


def test_distributed_fallback_matches_driver_path(spark):
    """Forcing driver_vocab_cap=0 exercises the distributed
    job-per-merge fallback; its merges and final vocab must be
    byte-identical to the driver-side loop's."""
    df = spark.createDataFrame([("abab abab abc cab",), ("abc ba",)],
                               "text STRING")
    wf = B.word_frequencies(df)
    m_drv, f_drv = B.bpe_train_merges(wf, 4)
    m_dist, f_dist = B.bpe_train_merges(wf, 4, driver_vocab_cap=0,
                                        checkpoint_every=2)
    assert [(m["it"], m["l"], m["r"], m["n"]) for m in m_drv] \
        == [(m["it"], m["l"], m["r"], m["n"]) for m in m_dist]
    assert {tuple(r) for r in f_drv.collect()} \
        == {tuple(r) for r in f_dist.collect()}


def test_thousand_merges_constant_job_count(spark):
    """VERDICT r6 #4: ≥1k merges must NOT schedule a job per merge.
    The whole train — corpus pass, vocab gate count, vocab collect —
    is a small constant number of Spark jobs regardless of K."""
    import random

    rng = random.Random(7)
    # corpus with enough distinct adjacent pairs to sustain 1k merges:
    # long words over a 12-letter alphabet
    alpha = "abcdefghijkl"
    texts = [" ".join("".join(rng.choice(alpha) for _ in range(18))
                      for _ in range(40)) for _ in range(50)]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    sc = spark.sparkContext
    sc.setJobGroup("bpe-1k", "bpe job-count probe")
    try:
        merges, _ = B.bpe_train_merges(B.word_frequencies(df), 1000)
    finally:
        sc.setJobGroup(None, None)
    assert len(merges) == 1000
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("bpe-1k")
    # checkpoint + count + collect ≈ 3-4 jobs; anything merge-count
    # shaped (hundreds) means the driver path regressed
    assert len(jobs) <= 8, f"expected O(1) jobs, got {len(jobs)}"
