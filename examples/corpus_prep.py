"""End-to-end training-corpus preparation over the documents table:

  clean (quality -> language -> exact dedup -> near-dedup)
    -> decontaminate against an eval set
    -> curriculum phase (4 equal-token-mass quality buckets,
       banded prefix sum — no global window)
    -> redact PII
    -> assign deterministic train/valid/test splits + shards
    -> pack into fixed-length sequences
    -> write partitioned by (split, shard)

Run:
    python examples/corpus_prep.py [sf_dir] [out_dir]

Every stage is the scale-shaped operator from etl_tool_spark.llm; the
output layout (partitionBy split/shard) is what a 100 TB run would
write, so readers prune to one split at the scan.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from etl_tool_spark.llm.pipeline import clean_corpus
from etl_tool_spark.llm.prep import (contamination, pack_sequences, redact_pii,
                                     shard_assign, split_assign)
from etl_tool_spark.session import get_spark


def prepare_corpus(spark, sf_dir: str, out_dir: str, seq_len: int = 32):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .repartition(spark.sparkContext.defaultParallelism)

    # 1. clean: quality/language filters, exact + transitive near-dedup
    staging = tempfile.mkdtemp(prefix="corpus_prep_sig_")
    clean = clean_corpus(docs, staging_dir=f"{staging}/sig", transitive=True)

    # 2. decontaminate: drop docs overlapping the eval set (every 23rd doc)
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    contaminated = (contamination(clean, bench)
                    .filter(F.col("overlap_ratio") >= 0.5)
                    .select("doc_id"))
    clean = clean.join(contaminated, "doc_id", "left_anti")

    # 3. curriculum phase: walk best-quality-first, cut into 4 phases of
    # equal TOKEN mass via the banded prefix sum (no single-partition
    # global window); integer cut-point arithmetic
    from etl_tool_spark.llm.text import quality_features, token_count
    from etl_tool_spark.operators.globalorder import banded_cumsum

    base = clean.select(
        "doc_id", "text",
        token_count(F.col("text")).alias("_nt"),
        quality_features(F.col("text"))["quality_score"].alias("_q"))
    cum = banded_cumsum(base, band="_q", intra_order=[F.col("doc_id").asc()],
                        value="_nt", out="_cum", band_desc=True)
    total = base.agg(F.sum("_nt").alias("_total"))
    phases = (cum.crossJoin(F.broadcast(total))
                 .select("doc_id",
                         F.least(F.lit(3),
                                 F.expr("((_cum - _nt) * 4) div _total"))
                          .cast("int").alias("phase")))

    # 4. redact + 5. split/shard + 6. pack (+ phase rides along per doc)
    redacted = clean.select("doc_id", redact_pii(F.col("text")).alias("text"))
    packed = pack_sequences(redacted, seq_len)
    final = (packed.join(phases, "doc_id")
                   .select("*",
                           split_assign(F.col("doc_id")).alias("split"),
                           shard_assign(F.col("doc_id"), 8).alias("shard")))

    # 6. the 100 TB layout: one directory per (split, shard)
    final.write.mode("overwrite").partitionBy("split", "shard").parquet(out_dir)
    return spark.read.parquet(out_dir)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_out_")
    spark = get_spark("corpus_prep")
    out = prepare_corpus(spark, sf_dir, out_dir)
    stats = (out.groupBy("split")
                .agg(F.countDistinct("doc_id").alias("docs"),
                     F.count(F.lit(1)).alias("chunks"),
                     F.sum("n_tokens").alias("tokens"))
                .orderBy("split"))
    stats.show()
    print(f"written to {out_dir}")


if __name__ == "__main__":
    main()
