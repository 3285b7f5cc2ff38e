"""Training-data preparation operators: deterministic splits/shards,
PII redaction, fixed-length sequence packing, benchmark contamination.

These cover the corpus-to-training-set mile that follows cleaning/dedup
(llm/pipeline.py). Everything is built-in-function Columns (JVM-side,
codegen'd, no Python UDFs) and every random-looking choice is a
deterministic md5-derived hash, so (a) results are reproducible across
reruns and engines (DuckDB oracle parity) and (b) membership is a pure
function of the key — re-running the pipeline after adding documents
never reshuffles existing train/test assignments (the property that
prevents test-set leakage across dataset versions).

Scale shapes (100 TB):
  * split/shard assignment — map-side hash, zero shuffle; writers
    partition by the assignment column.
  * redact_pii — map-side regexp chain, zero shuffle.
  * pack_sequences — one explode per CHUNK (not per token): a doc row
    fans out to ceil(n_tokens/seq_len) rows, each slicing its own token
    window. No shuffle until the caller groups/writes.
  * contamination — the benchmark n-gram set is tiny vs the corpus, so
    the semi-join broadcasts; per-doc counters aggregate on doc_id
    (one shuffle of matched shingles only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.dedup import shingles
from etl_tool_spark.llm.text import hash64, tokens

__all__ = ["split_assign", "shard_assign", "stratified_sample",
           "weighted_sample", "sample_per_group", "PII_PATTERNS",
           "redact_pii", "pii_counts", "pack_sequences", "chunk_text",
           "contamination", "normalize_url", "url_domain", "url_parts",
           "unicode_normalize", "html_to_text"]


def _key_hash(key: Column, salt: str) -> Column:
    """Salted deterministic hash of a key column. Distinct salts give
    independent partitions (split vs shard), like seeding two RNGs."""
    return hash64(F.concat(F.lit(salt + ":"), key.cast("string")))


def split_assign(key: Column, splits: dict[str, int] | None = None,
                 salt: str = "split") -> Column:
    """Map a key to a named split by hash bucket — 'train'/'valid'/'test'
    with 90/5/5 weights by default (weights must sum to 100). Assignment
    is a pure function of (salt, key): stable under re-runs, appends, and
    reorderings — the standard guard against train/test contamination
    when a corpus is rebuilt."""
    splits = splits or {"train": 90, "valid": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {splits}")
    bucket = _key_hash(key, salt) % 100
    expr: Column | None = None
    upper = 0
    *head, (last_name, _) = splits.items()
    for name, weight in head:
        upper += weight
        cond = bucket < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))


def shard_assign(key: Column, n_shards: int, salt: str = "shard") -> Column:
    """Deterministic shard id in [0, n_shards) — the interleave/output
    partition for training files. Salted independently of split_assign so
    shards are balanced within every split."""
    return (_key_hash(key, salt) % n_shards).cast("int")


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, int], default_pct: int = 0,
                      key_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Deterministic stratified sampling: keep ``rates[stratum]`` percent
    of each stratum (``default_pct`` for unlisted strata), where
    membership is a pure function of (salt, key) — the corpus-mixing
    primitive (down-weight over-represented languages/sources) that,
    unlike ``df.sample``/``sampleBy``, is reproducible across engines,
    reruns, and appends: a kept document stays kept when the corpus
    grows, so dataset versions stay comparable.

    Map-side filter, zero shuffle; at 100 TB this is a scan-rate
    predicate evaluated next to the parquet reader."""
    for stratum, pct in rates.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} outside [0, 100]: {pct}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct outside [0, 100]: {default_pct}")
    bucket = _key_hash(F.col(key_col), salt) % 100
    rate: Column | None = None
    for stratum, pct in rates.items():
        cond = F.col(strata_col) == stratum
        rate = (F.when(cond, F.lit(pct)) if rate is None
                else rate.when(cond, F.lit(pct)))
    rate = F.lit(default_pct) if rate is None else rate.otherwise(F.lit(default_pct))
    return df.filter(bucket < rate)


# Ordered redaction patterns. RE2-safe subset (no lookaround, no
# backreferences) so the same pattern strings run in Spark (Java regex)
# and DuckDB (RE2). Email must run before phone: an address like
# a+1-555-123@x.org would otherwise lose its local part to the phone rule.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,4}-?\d{0,4}", "<PHONE>"),
]


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15) of a string column — the
    canonical-equivalence step a web corpus needs BEFORE any exact or
    shingle dedup: 'café' composed (U+00E9) and decomposed
    (e + U+0301) are the same text to a reader but different bytes to
    every fingerprint, so unnormalized corpora under-deduplicate and
    split token statistics across variants. Spark has no built-in
    normalizer, so this is one of the few genuinely-Python operators:
    an Arrow-batched pandas UDF around unicodedata.normalize (the
    stdlib UAX #15 implementation; DuckDB's nfc_normalize — utf8proc —
    implements the same algorithm, which is what makes the catalog
    query oracle-checkable). Map-side, no shuffle; nulls pass through."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unicode_normalize: unknown form {form!r}")

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: unicodedata.normalize(form, v)
                     if v is not None else None)

    return norm(col)


def redact_pii(col: Column) -> Column:
    """Replace e-mail / IPv4 / phone spans with typed placeholder tokens.
    A chained map-side regexp_replace — order fixed by PII_PATTERNS."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (size of
    regexp_extract_all — count must precede redaction; each rule's spans
    are disjoint with the others' by construction)."""
    return {name: F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")
            for name, pattern, _ in PII_PATTERNS}


def pack_sequences(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Split each document's token stream into fixed-length training
    sequences: (id, chunk_id, n_tokens, chunk_text), chunk_id 0-based,
    every chunk full except possibly the last.

    Fans out one row per CHUNK, not per token: each chunk row slices its
    own window out of the shared token array (`slice` is O(seq_len)), so
    the explode factor is n_tokens/seq_len — ~100× smaller than a
    posexplode-then-regroup formulation, and shuffle-free."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    chunk = F.explode(F.sequence(F.lit(0), F.floor((n - 1) / seq_len).cast("int")))
    per_chunk = toks.select(F.col(id_col), F.col("_toks"), chunk.alias("chunk_id"))
    start = F.col("chunk_id") * seq_len
    window = F.slice("_toks", start + 1, seq_len)
    return per_chunk.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(window).cast("bigint").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"))


def weighted_sample(df: DataFrame, weight_col: str,
                    key_col: str = "doc_id", salt: str = "wsample",
                    resolution: int = 10000) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    equal to its ``weight_col`` value (a [0, 1] weight — typically a
    quality score), where the draw is a pure function of (salt, key).
    The quality-weighted corpus-mixing primitive ("sample documents
    proportionally to quality") with the same reproducibility contract
    as stratified_sample: kept rows stay kept across reruns, appends,
    and engines.

    The comparison is integer-exact: keep iff
    ``hash(salt:key) % resolution < round(weight * resolution)`` — no
    float threshold ambiguity cross-engine. Weights outside [0, 1] clamp
    (≥1 always keeps, ≤0 always drops). Map-side filter, zero shuffle."""
    bucket = _key_hash(F.col(key_col), salt) % resolution
    thresh = F.round(F.col(weight_col) * resolution).cast("bigint")
    return df.filter(bucket < thresh)


def sample_per_group(df: DataFrame, strata_col: str, n: int,
                     key_col: str = "doc_id",
                     salt: str = "pergroup") -> DataFrame:
    """Deterministic 'N examples per class': rank each stratum's rows by
    a salted hash of the key (a reproducible random order) and keep the
    first ``n``. Unlike a rate-based sample, the OUTPUT SIZE per stratum
    is exact (min(n, stratum size)) — the eval-set/few-shot builder.

    One window shuffle on the stratum key. Deterministic across engines
    and reruns, and adding documents only displaces existing picks when
    a new key hashes earlier — no global reshuffle."""
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    h = _key_hash(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= n)
              .drop("_rk"))


def chunk_text(df: DataFrame, size: int, overlap: int = 0,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the RAG/context-window prep
    twin of pack_sequences: windows start every ``size - overlap``
    tokens, each ``size`` tokens long (the last may be short; a window
    fully contained in the previous one is not emitted).

    Same scale shape as pack_sequences: one output row per CHUNK slicing
    the shared token array map-side — no per-token explosion, no
    shuffle. Output: (id, chunk_id, start_token, n_tokens, chunk_text).
    """
    if size <= 0:
        raise ValueError(f"size must be positive: {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size): {overlap}")
    stride = size - overlap
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    # number of windows = 1 + ceil(max(n - size, 0) / stride)
    extra = F.greatest(n - size, F.lit(0))
    n_chunks = (F.lit(1) + F.ceil(extra / stride)).cast("int")
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1))
    per_chunk = toks.select(F.col(id_col), F.col("_toks"), chunk.alias("chunk_id"))
    start = F.col("chunk_id") * stride
    window = F.slice("_toks", start + 1, size)
    return per_chunk.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_token"),
        F.size(window).cast("bigint").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"))


def contamination(df: DataFrame, benchmark: DataFrame, shingle_n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document n-gram overlap with a benchmark/eval set: the
    decontamination check run before training. Returns
    (id, n_shingles, n_overlap, overlap_ratio) for every document with at
    least one shingle in common with the benchmark.

    Shape: the benchmark shingle set is tiny next to the corpus, so Spark
    broadcasts it into the semi-ish join; only matched shingles shuffle to
    the per-doc count. Corpus shingling is map-side."""
    doc_sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh"))
    bench_sh = (benchmark
                .select(F.explode(F.array_distinct(
                    shingles(F.col(text_col), shingle_n))).alias("_sh"))
                .distinct())
    sizes = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (doc_sh.join(F.broadcast(bench_sh), "_sh")
                     .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_overlap")))
    ratio = F.round(F.col("n_overlap") / F.col("n_shingles"), 6)
    return (overlap.join(sizes, id_col)
                   .select(F.col(id_col), "n_shingles", "n_overlap",
                           ratio.alias("overlap_ratio")))


_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")


def url_parts(col: Column) -> dict[str, Column]:
    """scheme/host/path/query Columns from a URL (fragment dropped).
    The query regex anchors BEFORE any '#': a '?' inside the fragment
    ('/p#frag?a=1', SPA hash routes) is fragment content, not query."""
    s = F.trim(col)
    return {
        "scheme": F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)),
        "host": F.lower(F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        "path": F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        "query": F.regexp_extract(s, r"^[^#]*?\?([^#]*)", 1),
    }


def normalize_url(col: Column, strip_www: bool = True) -> Column:
    """Canonical URL for crawl-level dedup and per-domain mixing:
    lowercase scheme+host, default ports (:80 http / :443 https) and
    `www.` stripped, the fragment dropped, tracking parameters
    (utm_* / fbclid / gclid / msclkid / mc_eid) removed, the surviving
    query parameters SORTED (param order never distinguishes resources),
    and the root path's trailing slash normalized away. Pure Column
    expression chain — map-side at any scale; two URLs of the same
    resource hash equal afterwards, so exact dedup on the normalized
    string collapses them."""
    p = url_parts(col)
    host = p["host"]
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(p["scheme"] == "http",
                  F.regexp_replace(host, r":80$", "")) \
            .when(p["scheme"] == "https",
                  F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)
    path = F.when((p["path"] == "/") | (p["path"] == ""), F.lit("")) \
            .otherwise(F.regexp_replace(p["path"], r"/$", ""))
    params = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "") & ~sum(
            (kv.startswith(pre).cast("int") for pre in _TRACKING_PREFIXES),
            F.lit(0)).cast("boolean"))
    params = F.array_join(F.sort_array(params), "&")
    built = F.concat(
        p["scheme"], F.lit("://"), host, path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)))
    # malformed / scheme-less inputs must NOT all collapse onto the one
    # key '://' (exact dedup would then silently drop every such row but
    # the first); null keeps them distinct and visibly unparseable
    return F.when((p["scheme"] != "") & (p["host"] != ""), built)


def url_domain(col: Column, strip_www: bool = True) -> Column:
    """Registrable-host extraction for per-domain corpus statistics
    (port and `www.` stripped; no public-suffix list — document that a
    real crawl plugs one in via register_transform). Null for inputs
    with no parseable host, matching normalize_url."""
    host = F.regexp_replace(url_parts(col)["host"], r":\d+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host != "", host)


# ordered: script/style bodies fall BEFORE the generic tag strip (the
# generic pass would remove the <script> tags but keep the JS text);
# entities decode AFTER it (so text-encoded '&lt;script&gt;' can never
# re-materialize as live markup); '&amp;' decodes last of the entities
# (decoding it first would re-interpret '&amp;lt;' as '&lt;').
_HTML_BLOCK_STRIPS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
    r"(?s)<[^>]*>",
]
_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                  ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
                  ("&amp;", "&")]


def html_to_text(col: Column) -> Column:
    """Markup-stripped text from an HTML column — the first pass of
    every web-crawl ingestion pipeline (WET-style extraction: tags,
    script/style bodies and comments dropped, named entities decoded,
    whitespace collapsed). Pure Column regexp chain: stays inside
    whole-stage codegen at full scan width, no UDF.

    Contract notes: tag strip is regex-grade, not an HTML5 tree parser
    — unclosed <script>/<style> blocks degrade safely (the opening tag
    is stripped, the body survives as text); entity decode covers the
    named core + &#39; (the generic numeric form needs chr(), which
    neither engine exposes inside a regexp); whitespace collapse uses
    the explicit class [ \\t\\r\\n] so the Spark (Java regex) and
    DuckDB (RE2) twins agree byte-for-byte on \\x0B-class edge chars.
    The same chain re-implemented over RE2 is this operator's oracle
    (catalog llm_html_extract)."""
    out = col
    for pat in _HTML_BLOCK_STRIPS:
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, "[ \t\r\n]+", " "))
