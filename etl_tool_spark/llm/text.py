"""Text-analysis operators for LLM data pipelines.

Everything is built-in-function Columns (JVM-side, codegen'd) — no
Python UDFs — so a 100 TB documents table streams through scan→project
with zero serialization overhead. Deterministic md5-derived hashing keeps
results reproducible across engines (DuckDB oracle parity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash64", "tokens", "token_count", "bpe_ish_token_count",
           "quality_features", "language_id", "fingerprint",
           "repetition_stats", "boilerplate_ngrams", "repeated_spans",
           "excise_repeated_spans", "bm25_scores", "bm25_batch_topk",
           "script_counts", "dominant_script", "SCRIPTS",
           "stupid_backoff_logprob", "log_odds_classifier",
           "STOPWORDS"]


def hash64(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 — identical in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT. The cross-engine primitive
    under minhash/simhash/LSH."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# A BPE-ish lexer: words, numbers, or single non-space symbols — a cheap
# stand-in for subword tokenizers with the same asymptotics.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + frozen: they are part of the operator's
# deterministic contract (the oracle embeds the same lists).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_id(col: Column, toks: Column | None = None) -> Column:
    """Argmax language by stopword-hit count. Deterministic tie rule:
    equal hit counts pick the lexicographically GREATEST language code
    (struct max compares (hits, lang) field-by-field — the oracle uses
    the same rule). No hits at all ⇒ 'und' (undetermined).

    Pass ``toks`` (a pre-materialized ``tokens(col)`` column living in its
    own projection) when composing with other token consumers — otherwise
    Catalyst's CollapseProject inlines the regex split once per stopword
    list."""
    if toks is None:
        toks = tokens(col)
    scored = F.array(*[
        F.struct(_stopword_hits(toks, words).alias("hits"), F.lit(lang).alias("lang"))
        for lang, words in sorted(STOPWORDS.items())
    ])
    best = F.array_max(scored)
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def quality_features(col: Column, toks: Column | None = None) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features + a composite score
    in [0,1]. All ratios in double; empty text ⇒ zeros.

    ``toks``: pre-materialized ``tokens(col)`` column (see language_id) —
    the token array feeds several features, so materializing it once in
    its own projection keeps the split from being inlined per feature."""
    t = F.trim(col)
    n_chars = F.length(t)
    if toks is None:
        toks = tokens(col)
    n_tokens = F.when(t == "", F.lit(0)).otherwise(F.size(toks))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*all_stop)))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    mean_token_len = F.round((n_chars - (n_tokens - 1)) / safe_tokens.cast("double"), 6)
    # score uses the UNROUNDED ratios: feeding 6-dp-rounded decimals into
    # further arithmetic lands results exactly on rounding boundaries,
    # where engines' half-up implementations disagree in the last digit
    punct_raw = n_punct / safe_chars.cast("double")
    stop_raw = n_stop / safe_tokens.cast("double")
    # composite: long enough, not punctuation soup, has some stopwords
    score = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_raw * 4, F.lit(1.0))) * 0.3
        + F.least(stop_raw * 5, F.lit(1.0)) * 0.3
    )
    # floor-scaling, not round(): the score is a rational of small counts
    # and systematically lands ON half-up boundaries (e.g. 0.83125), where
    # engines' decimal rounding of the same double disagrees; floor of
    # identical doubles is bit-deterministic everywhere
    score_4dp = F.floor(score * 10000) / 10000
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": F.round(punct_raw, 6),
        "stopword_ratio": F.round(stop_raw, 6),
        "mean_token_len": mean_token_len,
        "quality_score": score_4dp,
    }


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (stable under reflow). The rolling-hash analogue with cross-engine
    reproducibility."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals (the Gopher/C4-style quality
    rules): type-token ratio, most-frequent-token fraction, and
    most-frequent-bigram fraction. High top-fractions flag boilerplate,
    keyword stuffing, and generation loops.

    Shape for 100 TB: tokens and bigrams derive map-side (the bigram
    array is a zip of the token array with its own tail — no
    self-join); each then partial-aggregates on (doc, term) before the
    per-doc rollup, so the shuffle carries distinct counts, not raw
    token streams. Empty documents are excluded (no tokens → no ratio).
    """
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    base = (df.filter(t != "")
              .select(F.col(id_col), toks.alias("_toks"),
                      bigrams.alias("_bgs")))
    tok_counts = (base.select(id_col, F.explode("_toks").alias("tok"))
                      .groupBy(id_col, "tok")
                      .agg(F.count(F.lit(1)).alias("c"))
                      .groupBy(id_col)
                      .agg(F.sum("c").alias("n_tokens"),
                           F.count(F.lit(1)).alias("n_distinct"),
                           F.max("c").alias("top_c")))
    bg_counts = (base.select(id_col, F.explode("_bgs").alias("bg"))
                     .groupBy(id_col, "bg")
                     .agg(F.count(F.lit(1)).alias("c"))
                     .groupBy(id_col)
                     .agg(F.sum("c").alias("n_bg"),
                          F.max("c").alias("top_bg")))
    return (tok_counts.join(bg_counts, id_col, "left")
            .select(
                id_col,
                F.col("n_tokens"),
                F.round(F.col("n_distinct") / F.col("n_tokens").cast("double"),
                        6).alias("distinct_ratio"),
                F.round(F.col("top_c") / F.col("n_tokens").cast("double"),
                        6).alias("top_token_frac"),
                F.round(F.coalesce(
                    F.col("top_bg") / F.col("n_bg").cast("double"),
                    F.lit(0.0)), 6).alias("top_bigram_frac")))


def _gram_array(toks: Column, n: int) -> Column:
    """Positional token n-grams of a token array (empty when the doc is
    shorter than n) — shared by boilerplate_ngrams and repeated_spans
    so the gram construction can't drift between the two."""
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_ngrams(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 8,
                       min_docs: int = 2) -> DataFrame:
    """Cross-document boilerplate detection, C4-style: token n-grams
    that recur across ≥ ``min_docs`` DISTINCT documents (headers,
    footers, licence blurbs, templated spans). Returns
    (gram, n_docs, first_doc).

    100 TB shape: per-doc grams are built map-side (one slice per
    window over the shared token array) and deduped WITHIN the doc by
    array_distinct before the explode, so the single shuffle is a
    partial-agg'd groupBy on the gram string and n_docs needs no
    count-distinct state. No joins, no candidate pairs — this is the
    corpus-frequency complement to the pairwise near-dup family.
    """
    t = tokens(F.col(text_col))
    base = df.select(F.col(id_col), t.alias("_toks"))
    grams = F.array_distinct(_gram_array(F.col("_toks"), n))
    return (base.select(F.col(id_col), F.explode(grams).alias("gram"))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.min(id_col).alias("first_doc"))
                .filter(F.col("n_docs") >= min_docs))


def repeated_spans(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 8,
                   min_docs: int = 2) -> DataFrame:
    """Maximal cross-document repeated token spans — the exact-substring
    dedup signal (public dedup literature: long verbatim repeats across
    training documents degrade models; spans, not whole docs, are the
    removal unit). A position participates when its n-gram recurs in
    ≥ ``min_docs`` DISTINCT documents; consecutive participating
    positions merge into maximal runs. Returns
    (id_col, start_pos, span_tokens) with 1-based token positions; a
    run of k consecutive repeated n-grams covers k + n - 1 tokens.

    100 TB shape: positional grams build map-side; the recurring-gram
    set comes from the same partial-agg'd groupBy as boilerplate_ngrams
    (per-doc distinct first, so no count-distinct state); marking is an
    equi-join on the gram string; the merge is one per-doc window over
    marked positions (gaps-and-islands). No pairs, no cartesian —
    corpus-frequency machinery end to end."""
    t = tokens(F.col(text_col))
    base = df.select(F.col(id_col), t.alias("_toks"))
    gram_arr = _gram_array(F.col("_toks"), n)
    pos_grams = base.select(
        F.col(id_col),
        F.posexplode(gram_arr).alias("_p0", "gram"))
    rep = (base.select(F.col(id_col),
                       F.explode(F.array_distinct(gram_arr)).alias("gram"))
               .groupBy("gram")
               .agg(F.count(F.lit(1)).alias("_nd"))
               .filter(F.col("_nd") >= min_docs)
               .select("gram"))
    marked = pos_grams.join(rep, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("_p0")
    isl = marked.select(
        F.col(id_col), F.col("_p0"),
        (F.col("_p0") - F.row_number().over(w)).alias("_g"))
    return (isl.groupBy(id_col, "_g")
               .agg(F.min("_p0").alias("_s"),
                    F.count(F.lit(1)).alias("_run"))
               .select(F.col(id_col),
                       (F.col("_s") + 1).cast("bigint").alias("start_pos"),
                       (F.col("_run") + (n - 1)).cast("bigint")
                       .alias("span_tokens")))


def excise_repeated_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 8,
                          min_docs: int = 2) -> DataFrame:
    """Exact-substring dedup SURGERY — the apply side of
    ``repeated_spans``. The public dedup literature removes all-but-one
    occurrence of long verbatim cross-document repeats (spans, not whole
    docs, are the removal unit); this operator performs that rewrite
    with a deterministic keeper rule. A start position is marked when
    its token n-gram recurs in ≥ ``min_docs`` DISTINCT documents and
    this doc is not the gram's keeper (the min id among containing
    docs); each marked start expands to its n covered token positions;
    surviving tokens re-join in order into ``text_dedup``. Returns
    (id_col, n_tokens, n_removed, text_dedup) for every non-empty doc —
    a doc whose text is entirely repeated collapses to ''.

    100 TB shape: positional grams build map-side from one shared token
    array; the recurring-gram table reduces the corpus to
    vocabulary-of-repeats size and joins back through the broadcast
    size gate; removal positions come from a map-side sequence explode
    (n rows per marked start, dedup'd before the anti-join); the final
    per-doc reconstruction is one shuffle keyed on the doc id — never
    skewed, never pairwise. The collect_list is per-document (bounded
    by doc length), not per-corpus."""
    from etl_tool_spark.operators.skew import gated_broadcast

    t = F.trim(F.col(text_col))
    base = (df.filter(t != "")
              .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")))
    gram_arr = _gram_array(F.col("_toks"), n)
    pos = base.select(F.col(id_col),
                      F.posexplode(gram_arr).alias("_p0", "gram"))
    rec = (base.select(F.col(id_col),
                       F.explode(F.array_distinct(gram_arr)).alias("gram"))
               .groupBy("gram")
               .agg(F.count(F.lit(1)).alias("_nd"),
                    F.min(id_col).alias("_keeper"))
               .filter(F.col("_nd") >= min_docs)
               .select("gram", "_keeper"))
    marked = (pos.join(gated_broadcast(rec), "gram")
                 .filter(F.col(id_col) != F.col("_keeper"))
                 .select(F.col(id_col), F.col("_p0")))
    # 1-based token positions covered by any marked start: [p0+1, p0+n]
    removed = (marked.select(F.col(id_col),
                             F.explode(F.sequence(F.col("_p0") + 1,
                                                  F.col("_p0") + n))
                              .alias("_tp"))
                     .distinct())
    toks_pos = (base.select(F.col(id_col),
                            F.posexplode("_toks").alias("_i", "tok"))
                    .select(F.col(id_col),
                            (F.col("_i") + 1).alias("_tp"), "tok"))
    kept = toks_pos.join(removed, [id_col, "_tp"], "left_anti")
    kept_agg = (kept.groupBy(id_col)
                    .agg(F.count(F.lit(1)).alias("_n_kept"),
                         F.array_join(
                             F.transform(
                                 F.array_sort(F.collect_list(
                                     F.struct(F.col("_tp"), F.col("tok")))),
                                 lambda s: s.getField("tok")),
                             " ").alias("text_dedup")))
    lens = base.select(F.col(id_col),
                       F.size("_toks").cast("bigint").alias("n_tokens"))
    return (lens.join(kept_agg, id_col, "left")
                .select(F.col(id_col), F.col("n_tokens"),
                        (F.col("n_tokens")
                         - F.coalesce(F.col("_n_kept"), F.lit(0)))
                        .cast("bigint").alias("n_removed"),
                        F.coalesce(F.col("text_dedup"), F.lit(""))
                         .alias("text_dedup")))


def bm25_scores(df: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed bag of
    query terms (Robertson et al.; the +1 idf variant Lucene uses so
    high-df terms can't score negative). Returns (id_col, bm25_raw
    DOUBLE) for documents matching ≥ 1 query term — the lexical
    retrieval complement to the embedding-side ANN family.

    100 TB shape: ONE corpus scan, pure map-side — per-term tf is
    size(filter(token_array)) emitted through one inline struct array
    (plus a sentinel row per doc so corpus stats need no second scan),
    so no token-keyed shuffle ever happens and the text column never
    moves. The narrow (doc, dl, tok, tf) frame is checkpointed once —
    |Q|+1 rows per doc, a few dozen bytes each — and document
    frequencies, the (N, avgdl) pair, and the final doc-keyed score sum
    all derive from it; df and stats broadcast back. Scoring a fixed
    query set needs no inverted index."""
    if any(not q for q in query_terms):
        raise ValueError("bm25_scores: query terms must be non-empty")
    t = F.trim(F.col(text_col))
    base = (df.filter(t != "")
              .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")))
    # sentinel entry ("", 0): guarantees one row per doc even with zero
    # hits, so N/avgdl come from the same single pass as the tfs
    entries = F.array(
        F.struct(F.lit("").alias("tok"), F.lit(0).cast("bigint").alias("tf")),
        *[F.struct(F.lit(q).alias("tok"),
                   F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(q)))
                    .cast("bigint").alias("tf"))
          for q in query_terms])
    long = (base.select(F.col(id_col),
                        F.size("_toks").cast("bigint").alias("dl"),
                        F.inline(entries))
                .localCheckpoint(eager=False))
    stats = (long.filter(F.col("tok") == "")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                      F.avg("dl").alias("avgdl")))
    hits = long.filter(F.col("tf") > 0)
    dfq = hits.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (hits.join(F.broadcast(dfq), "tok")
                .crossJoin(F.broadcast(stats))
                .groupBy(id_col)
                .agg(F.sum(contrib).alias("bm25_raw")))


def bm25_batch_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    query_id_col: str = "query_id",
                    query_text_col: str = "query_text",
                    k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-``k`` per query for a QUERY SET — the batch
    retrieval shape (hard-negative mining for thousands of training
    queries, eval-suite scoring) that the fixed-bag ``bm25_scores``
    cannot express: there the per-term tf is a literal column per term,
    so the term list must be small and known at plan time; here queries
    are data. Returns (query_id, doc_id, bm25 DOUBLE, rank); ranking on
    the 6-dp-rounded score with a doc_id tiebreak, so float summation
    noise can't flip a cross-engine cutoff.

    100 TB shape — an inverted-postings join, with the Zipf-skew
    discipline of the corpus-frequency family:

      * postings = one corpus tokenize + ONE shuffle on the compound
        (doc, token) key (skew-proof — no reducer ever keys on a bare
        hot token); per-doc length rides along;
      * the query-vocabulary frame (distinct query terms) comes BACK to
        the postings through ``gated_broadcast``, so the corpus-sized
        posting stream is filtered map-side to query terms and is never
        exchanged on the skewed bare-token key;
      * document frequencies aggregate over the (already query-filtered)
        postings; corpus stats (N, avgdl) reduce from the per-doc
        lengths and broadcast as scalars;
      * scoring shuffles only the hit stream on the compound
        (query, doc) key; top-k is a per-query window over scored docs.

    Stats semantics match ``bm25_scores``: N and avgdl count every
    non-empty document (not just hit documents)."""
    from etl_tool_spark.operators.skew import BROADCAST_ROW_GATE

    t = F.trim(F.col(text_col))
    base = (corpus.filter(t != "")
                  .select(F.col(id_col), tokens(F.col(text_col))
                          .alias("_toks")))
    toks = base.select(F.col(id_col),
                       F.size("_toks").cast("bigint").alias("dl"),
                       F.explode("_toks").alias("tok"))
    postings = (toks.groupBy(id_col, "tok")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("tf"),
                         F.max("dl").alias("dl"))
                    .localCheckpoint(eager=False))
    dls = postings.groupBy(id_col).agg(F.max("dl").alias("dl"))
    stats = dls.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.avg("dl").alias("avgdl"))

    qt = (queries.select(F.col(query_id_col),
                         F.explode(F.array_distinct(
                             tokens(F.col(query_text_col)))).alias("tok"))
                 .where(F.col("tok") != ""))
    # one eager count of the QUERY-side term frame gates every broadcast
    # below (|qvocab| <= |dfq rows| <= |qt| by construction) — a
    # gated_broadcast on dfq would instead materialize the corpus-sized
    # postings at plan-build time via its count() job
    n_qt = qt.count()

    def _gated(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_qt <= BROADCAST_ROW_GATE else df

    qvocab = qt.select("tok").distinct()
    post_q = postings.join(_gated(qvocab), "tok")
    dfq = post_q.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint")
                                    .alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (post_q.join(_gated(qt), "tok")
                    .join(_gated(dfq), "tok")
                    .crossJoin(F.broadcast(stats))
                    .groupBy(query_id_col, id_col)
                    .agg(F.round(F.sum(contrib), 6).alias("bm25")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("bm25").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


#: Unicode scripts profiled by script_counts, in dominance-priority
#: order (first-match-wins on count ties). Values are the Unicode
#: script property names shared by Java regex (\p{IsX}) and RE2
#: (\p{X}) — the same table drives both the Spark chain and its
#: DuckDB oracle.
SCRIPTS = ["Latin", "Cyrillic", "Greek", "Arabic", "Hebrew", "Han",
           "Hangul", "Hiragana", "Katakana", "Devanagari"]


def script_counts(col: Column) -> dict[str, Column]:
    """Per-script codepoint counts — the writing-system profile that
    gates which language-ID / tokenization path a crawl document takes
    (stopword n-gram langid only means anything for the script it was
    built for). One count per script in SCRIPTS, computed as
    length(text) − length(text with that script's codepoints removed):
    pure Column regexp over Java's \\p{IsX} script properties, full
    scan width inside codegen, no UDF, no shuffle. Digits, punctuation
    and whitespace are script 'Common' and count toward nothing."""
    return {s.lower(): (F.length(col)
                        - F.length(F.regexp_replace(col, rf"\p{{Is{s}}}", "")))
            for s in SCRIPTS}


def dominant_script(col: Column,
                    counts: dict[str, Column] | None = None) -> Column:
    """Name of the script with the most codepoints ('unknown' when no
    profiled script appears). Ties resolve to the earliest script in
    SCRIPTS — a fixed priority both engines replay exactly (the oracle
    is the same first-match CASE over greatest())."""
    c = counts if counts is not None else script_counts(col)
    m = F.greatest(*[c[s.lower()] for s in SCRIPTS])
    out = F.lit("unknown")
    for s in reversed(SCRIPTS):
        out = F.when((c[s.lower()] == m) & (m > 0), F.lit(s.lower())) \
               .otherwise(out)
    return out


def stupid_backoff_logprob(train: DataFrame, score: DataFrame,
                           id_col: str = "doc_id", text_col: str = "text",
                           alpha: float = 0.4) -> DataFrame:
    """Per-document average trigram log-probability under a stupid-
    backoff LM (Brants et al., EMNLP 2007 — the web-scale n-gram
    smoothing: no discount mass bookkeeping, just score
    c3/c2 when the trigram is attested, else α·(c2/c1), else
    α²·c1/N with a 0.5 OOV pseudo-count floor) trained on ``train``
    and scored over ``score`` — the CCNet-style quality filter shape:
    the LM comes from a curated slice, the crawl is scored against it,
    and held-out text genuinely exercises every backoff arm.

    Scale shape: the three count tables are n-gram-vocabulary sized —
    orders below the token stream for unigrams/bigrams, potentially
    corpus-order for trigrams on web data — so each joins back through
    the broadcast size gate: broadcast while they fit, sort-merge with
    AQE skew-splitting when they don't. The scored token stream is
    traversed once (one explode over trigram positions carrying the
    three context words), and every count lookup is a LEFT join so
    unattested n-grams fall through the CASE, never drop rows.

    Returns (id_col, n_trigrams, avg_logprob): docs with fewer than 3
    tokens carry no trigram positions and are absent, matching the SQL
    twin. avg_logprob is log10, rounded to 6 for cross-engine hashing.
    """
    a2 = float(alpha) * float(alpha)

    def _toks(df: DataFrame) -> DataFrame:
        t = F.trim(F.col(text_col))
        return (df.filter(t != "")
                  .select(F.col(id_col), F.split(t, r"\s+").alias("_a")))

    tr = _toks(train)
    uni = (tr.select(F.explode("_a").alias("_w"))
             .groupBy("_w").agg(F.count(F.lit(1)).alias("_c1"))
             .localCheckpoint(eager=True))
    total = uni.agg(F.sum("_c1").alias("_n"))
    bi = (tr.filter(F.size("_a") >= 2)
            .select(F.explode(F.expr(
                "transform(sequence(1, size(_a) - 1),"
                " i -> concat(element_at(_a, i), ' ', element_at(_a, i + 1)))"
            )).alias("_bg"))
            .groupBy("_bg").agg(F.count(F.lit(1)).alias("_c2"))
            .localCheckpoint(eager=True))
    tri = (tr.filter(F.size("_a") >= 3)
             .select(F.explode(F.expr(
                 "transform(sequence(1, size(_a) - 2),"
                 " i -> concat(element_at(_a, i), ' ', element_at(_a, i + 1),"
                 "             ' ', element_at(_a, i + 2)))")).alias("_tg"))
             .groupBy("_tg").agg(F.count(F.lit(1)).alias("_c3"))
             .localCheckpoint(eager=True))

    pos = (_toks(score).filter(F.size("_a") >= 3)
           .select(F.col(id_col), F.explode(F.expr(
               "transform(sequence(1, size(_a) - 2),"
               " i -> struct(element_at(_a, i) AS w1,"
               "             element_at(_a, i + 1) AS w2,"
               "             element_at(_a, i + 2) AS w3))")).alias("_p"))
           .select(id_col, "_p.w1", "_p.w2", "_p.w3"))
    g = (pos
         .withColumn("_tg", F.concat_ws(" ", "w1", "w2", "w3"))
         .withColumn("_bg12", F.concat_ws(" ", "w1", "w2"))
         .withColumn("_bg23", F.concat_ws(" ", "w2", "w3")))
    # one row-gate count per count TABLE, not per join: bi and uni each
    # join twice (left/right bigram context, w2/w3 unigram lookups), and
    # gated_broadcast counts per call — the same cached checkpoint was
    # counted twice (guide §1.2 fewer driver round-trips; 5 gate jobs
    # → 3). The gate verdict is a property of the table, not the
    # projection, so one count decides both joins.
    from etl_tool_spark.operators.skew import BROADCAST_ROW_GATE

    def _gate(df):
        hint = df.count() <= BROADCAST_ROW_GATE
        return (lambda d: F.broadcast(d)) if hint else (lambda d: d)

    tri_g, bi_g, uni_g = _gate(tri), _gate(bi), _gate(uni)
    g = (g.join(tri_g(tri), "_tg", "left")
          .join(bi_g(bi.select(F.col("_bg").alias("_bg12"),
                               F.col("_c2").alias("_c2_12"))),
                "_bg12", "left")
          .join(bi_g(bi.select(F.col("_bg").alias("_bg23"),
                               F.col("_c2").alias("_c2_23"))),
                "_bg23", "left")
          .join(uni_g(uni.select(F.col("_w").alias("w2"),
                                 F.col("_c1").alias("_c1_2"))),
                "w2", "left")
          .join(uni_g(uni.select(F.col("_w").alias("w3"),
                                 F.col("_c1").alias("_c1_3"))),
                "w3", "left")
          .crossJoin(F.broadcast(total)))
    sc = (F.when(F.col("_c3").isNotNull(),
                 F.col("_c3") / F.col("_c2_12"))
           .when(F.col("_c2_23").isNotNull(),
                 F.lit(alpha) * F.col("_c2_23") / F.col("_c1_2"))
           .otherwise(F.lit(a2) * F.coalesce(F.col("_c1_3"), F.lit(0.5))
                      / F.col("_n")))
    return (g.groupBy(id_col)
             .agg(F.count(F.lit(1)).alias("n_trigrams"),
                  F.round(F.avg(F.log10(sc)), 6).alias("avg_logprob")))


def log_odds_classifier(train: DataFrame, score: DataFrame,
                        label_col: str = "y",
                        id_col: str = "doc_id", text_col: str = "text",
                        pos_name: str = "pos",
                        neg_name: str = "neg") -> DataFrame:
    """Bag-of-features linear classifier apply pass — the fastText /
    model-based quality-filter shape (Joulin et al. 2016; weights are
    the Naive-Bayes log-count ratios of Wang & Manning, ACL 2012):
    train computes one add-1-smoothed log-odds weight per unigram and
    word-bigram feature from ``train``'s boolean ``label_col``; scoring
    averages the weights over each document's feature OCCURRENCES and
    adds the class-prior bias. This is the DCLM/"quality classifier"
    pipeline stage: a linear model over sparse text features, applied
    corpus-wide with nothing but joins and aggregations.

    Scale shape: ONE tokenization feeds train and score (features form
    map-side via a higher-order transform — no second pass); the learned
    weight table is feature-vocabulary-sized and joins back through the
    broadcast size gate; the prior and smoothing scalars ride one-row
    broadcast frames. Nothing shuffles on the raw token stream except
    the per-feature count aggregation (map-side partial) and the final
    per-document average — the same two shuffles a plain word count
    pays. At 100 TB the weight table is a trained artifact: swap the
    in-plan trainer for a persisted table and the apply side is
    unchanged.

    Returns (id_col, n_feats, score, pred): ``n_feats`` counts the
    doc's in-vocabulary feature occurrences, ``score`` = round(mean
    weight + bias, 6) (log10 odds; positive ⇒ ``pos_name``), and docs
    whose every feature is out-of-vocabulary are absent (they carry no
    evidence — downstream policy decides their fate, as with the
    LM-score operator's <3-token docs).
    """
    from etl_tool_spark.operators.skew import gated_broadcast

    def _feats(df: DataFrame, *keep: str) -> DataFrame:
        t = F.trim(F.col(text_col))
        arr = df.filter(t != "").select(*keep, F.split(t, r"\s+").alias("_a"))
        uni = arr.select(*keep, F.explode("_a").alias("_f"))
        bi = (arr.filter(F.size("_a") >= 2)
                 .select(*keep, F.explode(F.expr(
                     "transform(sequence(1, size(_a) - 1),"
                     " i -> concat(element_at(_a, i), ' ',"
                     "             element_at(_a, i + 1)))")).alias("_f")))
        return uni.unionByName(bi)

    trf = _feats(train, label_col)
    counts = (trf.groupBy("_f")
                 .agg(F.sum(F.when(F.col(label_col), 1).otherwise(0))
                       .alias("_cp"),
                      F.sum(F.when(~F.col(label_col), 1).otherwise(0))
                       .alias("_cn"))
                 .localCheckpoint(eager=True))
    scal = counts.agg(F.sum("_cp").alias("_np"), F.sum("_cn").alias("_nn"),
                      F.count(F.lit(1)).alias("_v"))
    w = (counts.crossJoin(F.broadcast(scal))
               .select("_f", F.log10(
                   ((F.col("_cp") + 1.0) / (F.col("_np") + F.col("_v"))) /
                   ((F.col("_cn") + 1.0) / (F.col("_nn") + F.col("_v"))))
                   .alias("_r")))
    t0 = F.trim(F.col(text_col))
    bias = (train.filter(t0 != "")
                 .agg(F.log10(
                     F.sum(F.when(F.col(label_col), 1).otherwise(0)) /
                     F.sum(F.when(~F.col(label_col), 1).otherwise(0)))
                     .alias("_bias")))
    return (_feats(score, id_col)
            .join(gated_broadcast(w), "_f")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 F.avg("_r").alias("_m"))
            .crossJoin(F.broadcast(bias))
            .select(id_col, "n_feats",
                    F.round(F.col("_m") + F.col("_bias"), 6).alias("score"))
            .withColumn("pred", F.when(F.col("score") > 0,
                                       pos_name).otherwise(neg_name)))


def compression_ratio(col: Column, level: int = 6) -> Column:
    """zlib-compressed-size / raw-size of UTF-8 text — the Gopher/Dolma
    repetitiveness signal: boilerplate and template spam compress far
    below natural prose, so a low ratio flags low-information documents
    cheaply (one pass, no tokenization, language-agnostic). Neither the
    JVM nor DuckDB exposes a deterministic twin of CPython's zlib
    stream, so this ships as a library transform (unit-tested ordering
    contract) rather than an oracle-paired catalog row. Arrow-batched
    pandas UDF around stdlib zlib — map-side, no shuffle; nulls pass
    through; empty text reports ratio 1.0 (nothing to judge)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            raw = v.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)
        return s.map(one)

    return ratio(col)
