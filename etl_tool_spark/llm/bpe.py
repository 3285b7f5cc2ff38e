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


def bpe_train_merges(words: DataFrame, num_merges: int,
                     word_col: str = "tok", freq_col: str = "c",
                     checkpoint_every: int = 8,
                     ) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges from a (word, frequency)
    vocabulary frame. Returns (merges, final_vocab): merges as
    ``[{"it", "l", "r", "n"}, ...]`` in learning order with the
    deterministic tie-break (count DESC, then left/right symbol ASC —
    binary string order on both engines), and the vocabulary frame in
    its post-merge symbol representation.

    Per-iteration cost is one vocabulary-sized aggregate plus a one-row
    collect; lineage (a chain of replaces over the cached base) is
    truncated every ``checkpoint_every`` merges so a large-K train does
    not accumulate an unbounded plan."""
    w = words.select(_sym_string(F.col(word_col)).alias("s"),
                     F.col(freq_col).cast("long").alias("c"))
    # materialize the vocabulary ONCE — the corpus-sized tokenize+count
    # must not re-run under every iteration's pair-count job
    w = w.localCheckpoint(eager=True)
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
