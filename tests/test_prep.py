"""Training-set preparation operators (llm/prep.py): deterministic
splits/shards, PII redaction, sequence packing, contamination."""

import pytest
from pyspark.sql import functions as F

from etl_tool_spark.llm import prep as P


def test_split_assign_deterministic_and_weighted(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = df.select("doc_id", P.split_assign(F.col("doc_id")).alias("split"))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    # hash buckets over 2000 keys: within a few points of 90/5/5
    assert 0.85 <= counts["train"] / 2000 <= 0.95
    # pure function of the key: a second evaluation and a subset evaluation
    # agree row-for-row (append-stability)
    again = df.filter(F.col("doc_id") < 500) \
              .select("doc_id", P.split_assign(F.col("doc_id")).alias("split"))
    joined = out.withColumnRenamed("split", "s1").join(again, "doc_id")
    assert joined.filter(F.col("s1") != F.col("split")).count() == 0


def test_split_assign_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        P.split_assign(F.lit("x"), {"train": 50, "test": 40})


def test_shard_assign_range_and_salt_independence(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = df.select(
        P.split_assign(F.col("doc_id")).alias("split"),
        P.shard_assign(F.col("doc_id"), 8).alias("shard"))
    rng = out.agg(F.min("shard"), F.max("shard")).first()
    assert rng[0] == 0 and rng[1] == 7
    # every (split, shard) cell populated: the salts are independent, so
    # shards don't collapse within a split
    assert out.distinct().count() == 24


def test_redact_pii_patterns_and_order(spark):
    rows = [
        ("a", "mail bob.smith+x@sub.example.org now", "mail <EMAIL> now"),
        ("b", "from 192.168.001.5 port", "from <IP> port"),
        ("c", "call +44-201-555-0176 today", "call <PHONE> today"),
        ("d", "a+1-555-123@x.org", "<EMAIL>"),   # email wins over phone
        ("e", "clean text stays", "clean text stays"),
    ]
    df = spark.createDataFrame(rows, "id string, text string, want string")
    out = df.select("id", "want", P.redact_pii(F.col("text")).alias("got"))
    assert out.filter(F.col("got") != F.col("want")).count() == 0


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [("x@y.io and z@w.co at 1.2.3.4",)], "text string")
    got = df.select(*[c.alias(k) for k, c in P.pii_counts(F.col("text")).items()]).first()
    assert got["email"] == 2 and got["ipv4"] == 1 and got["phone"] == 0


def test_pack_sequences_boundaries(spark):
    text = " ".join(f"t{i}" for i in range(70))   # 70 tokens → 32+32+6
    df = spark.createDataFrame([(1, text), (2, "only three tokens"),
                                (3, "")], "doc_id long, text string")
    out = P.pack_sequences(df, 32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    one = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in one] == [32, 32, 6]
    assert one[0]["chunk_text"].startswith("t0 t1 ") and one[2]["chunk_text"] == \
        "t64 t65 t66 t67 t68 t69"
    assert [r["n_tokens"] for r in by_doc[2]] == [3]
    # empty text: tokens('') == [''] — one chunk of the empty token,
    # matching the oracle's regexp_split_to_array behavior
    assert [r["chunk_text"] for r in by_doc[3]] == [""]


def test_contamination_ratio(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),   # exact copy
         (2, "quick brown fox jumps high"),                    # partial
         (3, "completely unrelated words entirely")],          # none
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.contamination(corpus, bench).collect()}
    assert got[1]["overlap_ratio"] == 1.0
    assert 0 < got[2]["overlap_ratio"] < 1.0
    assert 3 not in got


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" a b c d")).alias("text"))
    plan = P.contamination(docs, docs.limit(5))._jdf.queryExecution() \
            .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_split_partitioned_write_prunes(spark, tmp_path):
    """The 100 TB layout: assign split/shard, write partitionBy(split),
    and a reader filtering one split must prune partitions at the scan
    (PartitionFilters), not read-then-filter."""
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"))
    assigned = docs.select(
        "doc_id", "text",
        P.split_assign(F.col("doc_id")).alias("split"),
        P.shard_assign(F.col("doc_id"), 4).alias("shard"))
    out = str(tmp_path / "corpus")
    assigned.write.partitionBy("split", "shard").parquet(out)

    back = spark.read.parquet(out).filter(F.col("split") == "test")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters")[1][:120]
    want = assigned.filter(F.col("split") == "test").count()
    assert back.count() == want > 0


def test_stratified_sample_deterministic_and_stable(spark):
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de").otherwise("xx").alias("lang"))
    rates = {"en": 80, "de": 40}
    kept = {r["doc_id"] for r in
            P.stratified_sample(docs, "lang", rates, default_pct=10).collect()}
    # re-run: identical membership (pure function of the key)
    again = {r["doc_id"] for r in
             P.stratified_sample(docs, "lang", rates, default_pct=10).collect()}
    assert kept == again
    # append stability: sampling a subset == subset of the full sample
    subset = docs.filter(F.col("doc_id") < 200)
    sub_kept = {r["doc_id"] for r in
                P.stratified_sample(subset, "lang", rates, default_pct=10).collect()}
    assert sub_kept == {d for d in kept if d < 200}
    # rates roughly honored per stratum (hash-uniform over ~133 docs each)
    by_lang = {"en": 0, "de": 0, "xx": 0}
    rows = {r["doc_id"]: r["lang"] for r in docs.collect()}
    for d in kept:
        by_lang[rows[d]] += 1
    assert 0.6 < by_lang["en"] / 134 < 1.0
    assert 0.25 < by_lang["de"] / 133 < 0.55
    assert by_lang["xx"] / 133 < 0.25


def test_stratified_sample_rejects_bad_rates(spark):
    docs = spark.range(5).select(F.col("id").alias("doc_id"),
                                 F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        P.stratified_sample(docs, "lang", {"en": 120})
    with pytest.raises(ValueError):
        P.stratified_sample(docs, "lang", {"en": 50}, default_pct=-1)


def test_chunk_text_overlap_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
         (2, "a b"),                                 # shorter than size
         (3, " ".join(f"u{i}" for i in range(12)))],  # exact multiple
        "doc_id long, text string")
    got = {}
    for r in P.chunk_text(docs, size=4, overlap=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"]))
    for v in got.values():
        v.sort()
    # doc 1: starts 0,2,4,6 — last window t6..t9 reaches the end
    assert [c[1] for c in got[1]] == [0, 2, 4, 6]
    assert got[1][0][3] == "t0 t1 t2 t3"
    assert got[1][-1][3] == "t6 t7 t8 t9"
    # doc 2: one short window
    assert got[2] == [(0, 0, 2, "a b")]
    # doc 3 (12 toks): starts 0,2,4,6,8 — stride 2, final full window
    assert [c[1] for c in got[3]] == [0, 2, 4, 6, 8]
    assert all(c[2] == 4 for c in got[3])
    # every consecutive pair overlaps by exactly `overlap` tokens
    for chunks in (got[1], got[3]):
        for (_, s1, _, t1), (_, s2, _, t2) in zip(chunks, chunks[1:]):
            assert s2 - s1 == 2
            assert t1.split()[2:] == t2.split()[:2]


def test_chunk_text_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        P.chunk_text(docs, size=0)
    with pytest.raises(ValueError):
        P.chunk_text(docs, size=4, overlap=4)


def test_sample_per_group_exact_counts_and_stability(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
         .when(F.col("id") % 3 == 1, "b").otherwise("c").alias("lang"))
    got = P.sample_per_group(docs, "lang", 10).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {k: len(v) for k, v in by.items()} == {"a": 10, "b": 10, "c": 10}
    # deterministic across reruns
    again = {r["doc_id"] for r in P.sample_per_group(docs, "lang", 10).collect()}
    assert again == set().union(*by.values())
    # n larger than the stratum -> whole stratum
    tiny = docs.filter(F.col("doc_id") < 6)
    assert P.sample_per_group(tiny, "lang", 10).count() == 6
    with pytest.raises(ValueError):
        P.sample_per_group(docs, "lang", 0)


def test_weighted_sample_proportional_and_stable(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 0.9).otherwise(0.1).alias("w"))
    kept = P.weighted_sample(docs, "w").collect()
    hi = sum(1 for r in kept if r["w"] == 0.9)
    lo = len(kept) - hi
    # 1000 draws each; binomial 3-sigma bounds
    assert 850 <= hi <= 950 and 70 <= lo <= 130
    # deterministic across reruns
    again = {r["doc_id"] for r in P.weighted_sample(docs, "w").collect()}
    assert again == {r["doc_id"] for r in kept}
    # boundary weights: 1.0 keeps everything, 0.0 keeps nothing
    edge = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 25, 1.0).otherwise(0.0).alias("w"))
    kept_ids = {r["doc_id"] for r in P.weighted_sample(edge, "w").collect()}
    assert kept_ids == set(range(25))


def test_normalize_url_rules(spark):
    cases = {
        "HTTPS://WWW.Ex.COM:443/A/B/?utm_source=x&b=2&a=1#f":
            ("https://ex.com/A/B?a=1&b=2", "ex.com"),
        "http://ex.com:80/": ("http://ex.com", "ex.com"),
        "https://sub.ex.com/p?z=1&y=2&fbclid=q&gclid=r":
            ("https://sub.ex.com/p?y=2&z=1", "sub.ex.com"),
        "http://ex.com/only?utm_campaign=c": ("http://ex.com/only", "ex.com"),
        "https://ex.com:8443/x": ("https://ex.com:8443/x", "ex.com"),
        # '?' inside the fragment is fragment content, not query
        "https://ex.com/p#frag?a=1": ("https://ex.com/p", "ex.com"),
        "https://app.com/#/search?q=f": ("https://app.com", "app.com"),
        # malformed inputs must NOT collapse onto one shared key
        "not a url at all": (None, None),
        "/relative/path?a=1": (None, None),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: (r["n"], r["d"]) for r in df.select(
        "url", P.normalize_url(F.col("url")).alias("n"),
        P.url_domain(F.col("url")).alias("d")).collect()}
    assert got == cases


def test_html_to_text_cases(spark):
    cases = {
        # script body with raw < > survives tag-aware stripping
        '<p>a</p><script>if (1 < 2 && 3 > 2) { x(); }</script><p>b</p>':
            "a b",
        # style body dropped, attributes in tags ignored
        '<style type="text/css">p > a { color: red; }</style>'
        '<div class="x">text</div>': "text",
        # comments containing live-looking tags
        "before<!-- <script>evil()</script> -->after": "before after",
        # entity decode order: &amp;lt; must NOT become '<'
        "x &amp;lt; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; &apos;t&apos;":
            'x &lt; y <tag> "q" \'s\' \'t\'',
        # nbsp + newline/tab collapse
        "a&nbsp;&nbsp;b\n\t c": "a b c",
        # unclosed script degrades safely: opening tag stripped, body
        # survives as text (regex-grade contract, not a tree parser)
        "<script>var x = 1;": "var x = 1;",
        # case-insensitive tags, multi-line script body
        "<SCRIPT>\nvar a;\n</SCRIPT><B>bold</B>": "bold",
        "": "",
    }
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    got = {r["html"]: r["t"]
           for r in df.select("html",
                              P.html_to_text(F.col("html")).alias("t"))
                      .collect()}
    assert got == cases


def test_html_to_text_roundtrip_escaped_payload(spark):
    # any text, entity-escaped and wrapped in markup, comes back intact
    payload = 'if (a < b && b > c) { s = "x" + \'y\'; } & done'
    esc = (payload.replace("&", "&amp;").replace("<", "&lt;")
                  .replace(">", "&gt;").replace('"', "&quot;"))
    df = spark.createDataFrame([(f"<html><body><p>{esc}</p></body></html>",)],
                               "html string")
    got = df.select(P.html_to_text(F.col("html")).alias("t")).head()["t"]
    assert got == payload
