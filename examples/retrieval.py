"""Hybrid retrieval over the documents + embeddings tables:

  BM25 lexical scoring (query term bag)
    + embedding-cosine ranking (query document's vector)
    -> reciprocal-rank fusion (RRF, k=60)
    -> top-k with a text snippet joined back

Run:
    python examples/retrieval.py [sf_dir]

Each side is the scale-shaped operator from etl_tool_spark: BM25 is a
single map-side corpus pass (no inverted index, no token shuffle), the
cosine side is the broadcast-probe brute-force top-k (swap in
ivf_search against a persisted index for a real corpus), and the RRF
fusion joins two top-``depth`` frames — its cost is independent of
corpus size. Snippets join back by doc id only for the final k rows.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_tool_spark.llm.similarity import brute_force_topk
from etl_tool_spark.llm.text import bm25_scores
from etl_tool_spark.session import get_spark


def hybrid_search(spark: SparkSession, sf_dir: str, terms: list[str],
                  query_vec_id: int = 0, k: int = 10,
                  depth: int = 50) -> DataFrame:
    """Top-``k`` documents for a (term bag, query vector) pair by RRF
    over the BM25 top-``depth`` and cosine top-``depth`` rankings."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    lex_top = (bm25_scores(docs, terms)
               .filter(F.col("doc_id") != query_vec_id)
               .select("doc_id", F.round("bm25_raw", 6).alias("_s"))
               .orderBy(F.col("_s").desc(), "doc_id").limit(depth))
    lex = lex_top.withColumn(
        "rank_lex",
        F.row_number().over(Window.orderBy(F.col("_s").desc(), "doc_id"))
    ).select("doc_id", "rank_lex")

    qv = (emb.filter(F.col("vec_id") == query_vec_id)
             .select(F.col("vec_id").alias("query_id"), "embedding"))
    sem = (brute_force_topk(emb, qv, k=depth)
           .select(F.col("vec_id").alias("doc_id"),
                   F.col("rank").alias("rank_emb")))

    fused = (lex.join(sem, "doc_id", "full_outer")
             .select("doc_id", "rank_lex", "rank_emb",
                     F.round(
                         F.coalesce(1.0 / (F.col("rank_lex") + 60),
                                    F.lit(0.0))
                         + F.coalesce(1.0 / (F.col("rank_emb") + 60),
                                      F.lit(0.0)), 6).alias("rrf")))
    top = (fused.withColumn(
               "rank",
               F.row_number().over(
                   Window.orderBy(F.col("rrf").desc(), "doc_id")))
                .filter(F.col("rank") <= k))
    snippet = docs.select("doc_id",
                          F.substring("text", 1, 80).alias("snippet"))
    return top.join(snippet, "doc_id", "left") \
              .orderBy("rank") \
              .select("rank", "doc_id", "rrf", "rank_lex", "rank_emb",
                      "snippet")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval_example")
    out = hybrid_search(spark, sf_dir,
                        ["spark", "window", "vector", "merge"])
    for r in out.collect():
        lex = r["rank_lex"] if r["rank_lex"] is not None else "-"
        emb = r["rank_emb"] if r["rank_emb"] is not None else "-"
        print(f"{r['rank']:>3}  doc {r['doc_id']:>6}  rrf={r['rrf']:.6f} "
              f"lex={lex:>3} emb={emb:>3}  {r['snippet']}")


if __name__ == "__main__":
    main()
