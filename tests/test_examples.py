"""The examples/ directory must stay runnable — each example is an
end-to-end drive of a full engine personality."""

import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_orders_cleanup_playbook(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    from etl_tool_spark.plans import load_config, run_pipeline

    cfg = load_config(os.path.join(REPO, "examples", "orders_cleanup.yaml"))
    res = run_pipeline(spark, cfg)
    assert res.written
    out = spark.read.option("header", True).csv(str(tmp_path / "top_orders.csv"))
    assert out.count() > 0
    # dedup kept one (max-total) order per customer
    assert out.groupBy("customer_id").count().agg(F.max("count")).first()[0] == 1


def test_corpus_prep_example(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        from corpus_prep import prepare_corpus
    finally:
        sys.path.pop(0)
    out = prepare_corpus(spark, "/root/testdata/sf0.001", str(tmp_path / "out"))
    assert out.count() > 0
    assert {"split", "shard", "chunk_id", "chunk_text", "phase"} <= set(out.columns)
    # curriculum phases cover 0..3 and are doc-constant
    phases = {r["phase"] for r in out.select("phase").distinct().collect()}
    assert phases <= {0, 1, 2, 3} and len(phases) >= 2
    assert (out.groupBy("doc_id").agg(F.countDistinct("phase").alias("p"))
               .filter("p > 1").count()) == 0
    # partitioned layout on disk
    assert any(p.name.startswith("split=") for p in (tmp_path / "out").iterdir())
    # redaction ran before packing: no raw emails survive
    assert out.filter(F.col("chunk_text").rlike("@[a-z]+\\.")).count() == 0


def test_revenue_by_region_playbook(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    from etl_tool_spark.plans import load_config, run_pipeline

    cfg = load_config(os.path.join(REPO, "examples", "revenue_by_region.yaml"))
    res = run_pipeline(spark, cfg)
    assert res.written
    out = spark.read.option("header", True).csv(
        str(tmp_path / "revenue_by_region.csv"))
    rows = {r["nation"]: float(r["revenue"]) for r in out.collect()}
    assert len(rows) == 25 and all(v > 0 for v in rows.values())
    assert all(n == n.upper() for n in rows)


def test_events_stream_playbook(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    from etl_tool_spark.plans import load_config, run_pipeline

    cfg = load_config(os.path.join(REPO, "examples", "events_stream.yaml"))
    res = run_pipeline(spark, cfg)
    assert res.written
    got = res.output
    assert got.count() > 0
    assert {r["event_type"] for r in got.select("event_type").distinct().collect()} \
        == {"PURCHASE"}
    assert got.filter(F.col("value") <= 1).count() == 0


def test_ann_index_example(spark, tmp_path, capsys):
    import examples.ann_index as ex
    import sys

    old = sys.argv
    sys.argv = ["ann_index.py", "/root/testdata/sf0.001",
                str(tmp_path / "ivf")]
    try:
        ex.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "recall vs exact" in out


def test_warehouse_load_playbook(spark, tmp_path, monkeypatch):
    """The showcase playbook: quality gate passes, output is globally
    time-sorted with a manifest, pruned_read plans from it."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline
    from etl_tool_spark.sources.skipping import pruned_read

    cfg = yaml.safe_load(open("examples/warehouse_load.yaml"))
    out = str(tmp_path / "events_sorted")
    cfg["destination"]["file"] = out
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    assert res.written and res.metrics["quality_failures"] == 0
    full = spark.read.parquet(out)
    assert len(full.inputFiles()) == 8
    import datetime

    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 1, 6)
    pr = pruned_read(spark, out, "ts", lo, hi)
    assert pr.count() == full.filter(
        (full.ts >= lo) & (full.ts <= hi)).count()
    assert len(pr.inputFiles()) < 8


def test_retrieval_example(spark):
    sys.path.insert(0, REPO)
    try:
        from examples.retrieval import hybrid_search
    finally:
        sys.path.pop(0)
    out = hybrid_search(spark, "/root/testdata/sf0.001",
                        ["spark", "window", "vector", "merge"], k=10)
    rows = out.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # every fused row must come from at least one component ranking,
    # and the query doc itself may never be retrieved
    assert all(r["rank_lex"] is not None or r["rank_emb"] is not None
               for r in rows)
    assert all(r["doc_id"] != 0 for r in rows)
    assert all(r["snippet"] for r in rows)


def test_cdc_upsert_playbook(spark, tmp_path, monkeypatch):
    import json

    src = tmp_path / "changes"
    src.mkdir()
    rows = [{"id": 1, "seq": 10, "op": "I", "payload": "a0"},
            {"id": 2, "seq": 10, "op": "I", "payload": "b0"},
            {"id": 1, "seq": 20, "op": "D", "payload": None}]
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows))
    monkeypatch.setenv("CDC_IN_DIR", str(src))
    monkeypatch.setenv("SNAP_DIR", str(tmp_path / "snap"))
    from etl_tool_spark.plans import load_config, run_pipeline

    cfg = load_config(os.path.join(REPO, "examples", "cdc_upsert.yaml"))
    res = run_pipeline(spark, cfg)
    got = {r["id"]: r["payload"] for r in res.output.collect()}
    assert got == {2: "b0"}


def test_crawl_ingest_example(spark):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        from crawl_ingest import ingest_crawl
    finally:
        sys.path.pop(0)

    out = ingest_crawl(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n, n_docs = out.count(), docs.count()
    assert 0 < n <= n_docs                      # dedup can only shrink
    # survivors are unique by extracted text
    assert out.groupBy("text").count() \
              .agg(F.max("count")).first()[0] == 1
    # routing labels come from the language-ID operator's codomain
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    from etl_tool_spark.llm.text import STOPWORDS
    assert langs <= set(STOPWORDS) | {"und"}
    # the WARC/HTML round trip preserved the document text verbatim
    # (modulo the page furniture the extractor strips): spot-check one
    row = out.orderBy("media_id").first()
    src = docs.filter(F.col("doc_id") == row["media_id"]) \
              .select("text").first()[0]
    assert src.split() == row["text"].split()[2:]  # "Doc <id>" prefix


def test_tokenizer_train_example(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        from tokenizer_train import train_tokenizer
    finally:
        sys.path.pop(0)
    merges, counts, fert = train_tokenizer(
        spark, "/root/testdata/sf0.001", str(tmp_path / "merges"), 4)
    assert len(merges) == 4
    assert [m["it"] for m in merges] == [1, 2, 3, 4]
    row = fert.collect()[0]
    # merging can only shorten: 1 <= fertility <= chars-per-word bound,
    # and a 4-merge tokenizer still splits most words into >1 symbol
    assert row["fertility"] > 1.0
    assert counts.filter("n_subwords < n_words").count() == 0
    # the artifact round-trips: encode used the RELOADED table
    assert (tmp_path / "merges").exists()


def test_ingest_store_example(spark, tmp_path):
    """The long-lived ingest-store lifecycle example: gated batches,
    in-place compaction to <= one file per band shard, and a re-keyed
    survivor replay that must be fully gated by the compacted store."""
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        from ingest_store import run_lifecycle
    finally:
        sys.path.pop(0)
    from etl_tool_spark.llm import store as st

    out = run_lifecycle(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert out["survivors"] > 0 and out["leaked"] == 0
    assert out["compact_stats"]["bands"]["after"] <= st.band_shards()
