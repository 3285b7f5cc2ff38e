"""Web-crawl ingestion, end to end: WARC split → HTML-to-text →
language ID → exact dedup — the first day of a Common Crawl-style
corpus build, composed from the engine's operators exactly the way the
oracle-checked catalog query `llm_crawl_ingest` proves them.

Run:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/crawl_ingest.py
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the deduplicated, language-routed survivors of a
    synthetic crawl: one two-record WARC archive per document (the
    response block is an HTML page around the text), split with
    llm/warc.py, stripped with html_to_text, language-identified, and
    exact-deduplicated on an md5 fingerprint (min-id keeper)."""
    from etl_tool_spark.llm.prep import html_to_text
    from etl_tool_spark.llm.text import language_id, tokens
    from etl_tool_spark.llm.warc import two_record_archive, warc_records

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # entity-escape the text before embedding it in markup — otherwise
    # any document containing <, > or & would be corrupted by the
    # extractor's tag strip (same discipline as the catalog twin)
    esc = F.replace(F.replace(F.replace(F.col("text"),
                                        F.lit("&"), F.lit("&amp;")),
                              F.lit("<"), F.lit("&lt;")),
                    F.lit(">"), F.lit("&gt;"))
    html = F.concat(F.lit("<html><body><h1>Doc "),
                    F.col("doc_id").cast("string"),
                    F.lit("</h1><p>"), esc,
                    F.lit("</p><!-- crawler boilerplate --></body></html>"))
    uri = F.concat(F.lit("https://crawl.example/doc/"),
                   F.col("doc_id").cast("string"))
    base = docs.select(F.col("doc_id").alias("media_id"),
                       html.alias("_html"), uri.alias("_uri"))
    archives = base.select(
        "media_id",
        two_record_archive(F.col("_uri"), F.col("_html")).alias("payload"))

    recs = warc_records(archives)
    pages = (recs.filter(F.col("warc_type") == "response")
                 .select("media_id", "target_uri",
                         F.col("block").cast("string").alias("_page")))
    ext = pages.select("media_id", "target_uri",
                       html_to_text(F.col("_page")).alias("text"))
    toked = ext.select("*", tokens(F.col("text")).alias("_toks"))
    routed = toked.select("media_id", "target_uri", "text",
                          language_id(F.col("text"), toks=F.col("_toks"))
                           .alias("lang"))
    # exact dedup: fingerprint keeper, never the text as a shuffle key
    slim = routed.withColumn("_fp", F.md5("text"))
    keep = slim.groupBy("_fp").agg(F.min("media_id").alias("media_id"))
    return slim.join(keep, ["_fp", "media_id"]).drop("_fp")


if __name__ == "__main__":
    from etl_tool_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("crawl_ingest_example",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    out = ingest_crawl(spark, sf_dir)
    total = out.count()
    by_lang = out.groupBy("lang").count().orderBy("lang").collect()
    print(f"survivors: {total}")
    for r in by_lang:
        print(f"  {r['lang']}: {r['count']}")
