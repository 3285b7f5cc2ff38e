"""Distributed byte-pair-encoding: train merges over a corpus, apply them.

The reference (brian-c-moore/etl-tool) has no tokenizer surface; this is
part of the Spark-native LLM-data layer (SURVEY.md §2.6). Algorithm per
Sennrich, Haddow & Birch, ACL 2016 ("Neural Machine Translation of Rare
Words with Subword Units"): start from characters, repeatedly merge the
most frequent adjacent symbol pair. The published trainers run the loop
single-node over a word-frequency table; the Spark shape here is the
corpus-scale version of exactly that:

- The corpus is touched ONCE: tokenize + count collapses it to the
  word-frequency VOCABULARY map-side (one partial-agg'd shuffle on the
  word). Everything after is vocabulary-sized.
- Each merge iteration is one vocabulary-sized partial-agg job (pair
  counts, key space bounded by |current vocab of symbols|²) plus a
  ONE-ROW argmax collect — the same driver-read pattern as the IVF
  centroid loop, never a data-sized collect.
- Applying a merge is a single literal ``replace`` over the word's
  symbol string — pure Column work, no UDF.

Symbol-string representation: a word is stored as its symbols joined by
a DOUBLE space with leading/trailing double spaces, e.g. "abc" →
``"␣␣a␣␣b␣␣c␣␣"``. Merging pair (l, r) is then the literal replacement
``"␣l␣␣r␣" → "␣lr␣"``: the pattern consumes only the INNER half of each
flanking delimiter, so consecutive non-overlapping occurrences in one
word ("aaaa" with merge (a,a)) all rewrite in a single leftmost
replace-all pass — the exact greedy order BPE specifies — while the
single-space flanks guarantee both symbols match whole symbols only
(symbols can never contain whitespace: they come from a ``\\s+`` split).
Both Spark's ``replace`` and DuckDB's are leftmost non-overlapping
replace-all, so an oracle can unroll the identical iterations in SQL.

Encoding applies the learned merges to each word sequentially in rank
order, each as a replace-all (Sennrich's reference ``apply_bpe`` order).
A pair involving a merged symbol can only be LEARNED after the merge
that created the symbol, so by induction rank order is also dependency
order; the one pathological exception (two distinct merge paths
producing byte-identical symbols) is resolved identically by any engine
running the same sequential semantics, which is the contract tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.text import tokens

__all__ = ["word_frequencies", "bpe_train_merges", "bpe_segment",
           "bpe_token_counts"]

#: Inter-symbol delimiter unit (doubled between symbols). Tokens are
#: produced by a whitespace split, so no symbol can ever contain it.
_D = " "


def _sym_string(tok: Column) -> Column:
    """'abc' → '  a  b  c  ' — each codepoint a symbol, double-space
    delimited, double-space flanked."""
    return F.concat(F.lit(_D * 2), F.regexp_replace(tok, "(.)", "$1" + _D * 2))


def _symbols(s: Column) -> Column:
    """Symbol array of a delimited symbol string (drops the empty
    fragments the flanking delimiters produce)."""
    return F.filter(F.split(s, _D * 2), lambda x: x != F.lit(""))


def _merge_pattern(left: str, right: str) -> tuple[str, str]:
    """(search, replace) literals applying merge (left, right)."""
    return (_D + left + _D * 2 + right + _D, _D + left + right + _D)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (tok, c) word-frequency vocabulary: lowercased
    whitespace tokens, one partial-agg'd shuffle — the only corpus-sized
    stage of BPE training."""
    return (docs.filter(F.trim(F.col(text_col)) != "")
                .select(F.explode(tokens(F.col(text_col))).alias("tok"))
                .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))


def _pair_counts(w: DataFrame) -> DataFrame:
    """(l, r, n): adjacent-symbol pair counts over the vocabulary,
    weighted by word frequency. Words with one symbol carry no pair and
    are filtered BEFORE the sequence fan-out (sequence(1, 0) would step
    backwards)."""
    return (w.select(_symbols(F.col("s")).alias("syms"), "c")
             .filter(F.size("syms") >= 2)
             .select(F.explode(F.expr(
                 "transform(sequence(1, size(syms) - 1),"
                 " j -> struct(syms[j-1] AS l, syms[j] AS r))")).alias("p"),
                 "c")
             .groupBy("p.l", "p.r").agg(F.sum("c").alias("n")))


#: Vocabulary row count up to which the merge loop runs driver-side.
#: 2M (word, freq) rows is ≲ a few hundred MB of Python symbol lists —
#: the size every published single-node trainer (Sennrich's learn_bpe,
#: sentencepiece, HF tokenizers) holds in memory; web-scale corpora
#: plateau well under this (vocab grows ~ heaps-law, not linearly).
DRIVER_VOCAB_CAP = 2_000_000


def bpe_train_merges(words: DataFrame, num_merges: int,
                     word_col: str = "tok", freq_col: str = "c",
                     checkpoint_every: int = 8,
                     driver_vocab_cap: int | None = None,
                     ) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges from a (word, frequency)
    vocabulary frame. Returns (merges, final_vocab): merges as
    ``[{"it", "l", "r", "n"}, ...]`` in learning order with the
    deterministic tie-break (count DESC, then left/right symbol ASC —
    binary string order on both engines), and the vocabulary frame in
    its post-merge symbol representation.

    The corpus-sized work (tokenize + count in word_frequencies) always
    runs distributed and exactly once. The merge LOOP is vocab-sized,
    and a real vocabulary fits one machine — so when the vocab is under
    ``driver_vocab_cap`` rows it is collected ONCE and the loop runs
    driver-side with incremental pair stats + a lazy max-heap (the
    published single-node trainer shape): total Spark job count is a
    small constant, independent of num_merges, instead of one
    aggregate job per merge (32k merges must not be 32k Spark jobs).
    Vocabularies past the cap fall back to the distributed
    job-per-merge loop, which is slower per merge but never holds the
    vocab in one heap."""
    w = words.select(_sym_string(F.col(word_col)).alias("s"),
                     F.col(freq_col).cast("long").alias("c"))
    # materialize the vocabulary ONCE — the corpus-sized tokenize+count
    # must not re-run under every iteration's pair-count job (or under
    # the driver path's count + collect)
    w = w.localCheckpoint(eager=True)
    cap = DRIVER_VOCAB_CAP if driver_vocab_cap is None else driver_vocab_cap
    if w.count() <= cap:
        # the driver path's result is a fresh createDataFrame with no
        # lineage into w — release the checkpoint blocks explicitly
        # (up to a 2M-row vocab snapshot otherwise pinned until JVM GC)
        from etl_tool_spark.llm.graph import _checkpoint_rdd
        w_rdd = _checkpoint_rdd(w)
        try:
            return _train_driver(w, num_merges)
        finally:
            if w_rdd is not None:
                w_rdd.unpersist(False)
    return _train_distributed(w, num_merges, checkpoint_every)


def _apply_merge_syms(syms: list, left: str, right: str) -> list:
    """Leftmost non-overlapping replace-all of (left, right) over a
    symbol list — the same greedy pass the delimited-string replace
    performs."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_driver(w: DataFrame, num_merges: int
                  ) -> tuple[list[dict], DataFrame]:
    """Driver-side merge loop over a collected vocabulary: incremental
    pair statistics (only words CONTAINING the merged pair are
    recounted, via a pair→word index) and a lazily-invalidated max-heap
    argmax, so per-merge cost is ~O(affected words + log |pairs|) —
    never a rescan of the vocab, never a Spark job."""
    import heapq

    rows = w.collect()  # one vocab-sized job; gated by the caller
    vocab: list = [([x for x in r["s"].split(_D * 2) if x], r["c"])
                   for r in rows]
    stats: dict = {}
    index: dict = {}
    for wi, (syms, c) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            stats[p] = stats.get(p, 0) + c
            index.setdefault(p, set()).add(wi)
    # heap entries are (-n, l, r); stale ones (count since changed) are
    # discarded on pop by checking against stats — the classic lazy
    # decrease-key. Min-heap on (-n, l, r) pops count DESC then (l, r)
    # ASC: exactly the engine/oracle tie-break.
    heap = [(-n, p[0], p[1]) for p, n in stats.items()]
    heapq.heapify(heap)
    merges: list[dict] = []
    for it in range(1, num_merges + 1):
        best = None
        while heap:
            nn, hl, hr = heap[0]
            if stats.get((hl, hr)) == -nn:
                best = (hl, hr, -nn)
                break
            heapq.heappop(heap)  # stale
        if best is None:
            break
        l, r, n = best
        merges.append({"it": it, "l": l, "r": r, "n": int(n)})
        touched: set = set()
        for wi in list(index.get((l, r), ())):
            syms, c = vocab[wi]
            old = list(zip(syms, syms[1:]))
            new_syms = _apply_merge_syms(syms, l, r)
            vocab[wi] = (new_syms, c)
            new = list(zip(new_syms, new_syms[1:]))
            for p in old:
                stats[p] -= c
                touched.add(p)
            for p in new:
                stats[p] = stats.get(p, 0) + c
                touched.add(p)
            old_set, new_set = set(old), set(new)
            for p in old_set - new_set:
                s = index.get(p)
                if s is not None:
                    s.discard(wi)
            for p in new_set - old_set:
                index.setdefault(p, set()).add(wi)
        for p in touched:
            if stats.get(p, 0) <= 0:
                stats.pop(p, None)
                index.pop(p, None)
            else:
                heapq.heappush(heap, (-stats[p], p[0], p[1]))
    import pandas as pd
    final = pd.DataFrame(
        {"s": [_D * 2 + "".join(sym + _D * 2 for sym in syms)
               for syms, _ in vocab],
         "c": [c for _, c in vocab]})
    spark = w.sparkSession
    return merges, spark.createDataFrame(final, schema="s string, c long")


def _train_distributed(w: DataFrame, num_merges: int,
                       checkpoint_every: int) -> tuple[list[dict], DataFrame]:
    """Fallback for vocabularies too large to collect: one
    vocabulary-sized partial-agg job + a ONE-ROW argmax collect per
    merge; lineage (a chain of replaces over the cached base) is
    truncated every ``checkpoint_every`` merges, and each superseded
    checkpoint's blocks are released as soon as the next one is
    materialized (graph.py's pattern) so a large-K train holds at most
    one vocab snapshot pinned."""
    from etl_tool_spark.llm.graph import _checkpoint_rdd

    prev_rdd = _checkpoint_rdd(w)
    merges: list[dict] = []
    for it in range(1, num_merges + 1):
        top = (_pair_counts(w)
               .orderBy(F.col("n").desc(), "l", "r").limit(1).collect())
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append({"it": it, "l": l, "r": r, "n": int(n)})
        search, repl = _merge_pattern(l, r)
        w = w.withColumn("s", F.replace(F.col("s"), F.lit(search),
                                        F.lit(repl)))
        if it % checkpoint_every == 0:
            w = w.localCheckpoint(eager=True)
            if prev_rdd is not None:
                prev_rdd.unpersist(False)
            prev_rdd = _checkpoint_rdd(w)
    return merges, w


def bpe_segment(tok: Column, merges: list[dict]) -> Column:
    """Subword symbol array for one token under learned merges: the
    rank-ordered sequential replace-all chain — pure Column, the merge
    table rides as K literals (it is ≤ vocabulary-budget sized by
    construction, the canonical broadcast-as-literal case)."""
    s = _sym_string(tok)
    for m in merges:
        search, repl = _merge_pattern(m["l"], m["r"])
        s = F.replace(s, F.lit(search), F.lit(repl))
    return _symbols(s)


def bpe_token_counts(docs: DataFrame, merges: list[dict],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document subword statistics under a learned merge table:
    (id, n_words, n_subwords). Map-side segment + one partial-agg'd
    shuffle on the document id; documents that are empty after trim
    carry no words and are excluded (mirror the filter on any oracle)."""
    toks = (docs.filter(F.trim(F.col(text_col)) != "")
                .select(id_col,
                        F.explode(tokens(F.col(text_col))).alias("tok")))
    return (toks.select(id_col,
                        F.size(bpe_segment(F.col("tok"), merges)).alias("_k"))
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_words"),
                     F.sum("_k").alias("n_subwords")))
