"""Train a BPE subword tokenizer on the documents corpus, persist the
merge table as a tokenizer artifact, and measure its fertility:

  word-frequency vocabulary (one corpus pass)
    -> K distributed merge iterations (vocabulary-sized each)
    -> merge table written to parquet (THE tokenizer artifact:
       tiny, ordered, reload-and-apply anywhere)
    -> encode the corpus with the frozen merges (pure Column chain)
    -> corpus fertility = subwords per word (the tokenizer-quality
       number a multilingual vocab sweep compares across K)

Run:
    python examples/tokenizer_train.py [sf_dir] [out_dir] [num_merges]

At 100 TB the corpus is touched twice total (once to count words, once
to encode); everything between is bounded by the vocabulary.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from etl_tool_spark.llm.bpe import (bpe_token_counts, bpe_train_merges,
                                    word_frequencies)
from etl_tool_spark.session import get_spark


def train_tokenizer(spark, sf_dir: str, out_dir: str, num_merges: int = 8):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .repartition(spark.sparkContext.defaultParallelism)

    # 1. learn the merges (vocabulary-sized per-iteration cost)
    merges, _ = bpe_train_merges(word_frequencies(docs), num_merges)

    # 2. persist the artifact: an ordered merge table is the whole
    # tokenizer — any session reloads it and applies the same chain
    spark.createDataFrame(
        [(m["it"], m["l"], m["r"], m["n"]) for m in merges],
        "it INT, l STRING, r STRING, n BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(out_dir)

    # 3. reload (proving the round-trip) and encode the corpus
    reloaded = [r.asDict() for r in
                spark.read.parquet(out_dir).orderBy("it").collect()]
    counts = bpe_token_counts(docs, reloaded)

    # 4. fertility under the learned vocabulary
    fert = counts.agg(
        F.sum("n_words").alias("words"),
        F.sum("n_subwords").alias("subwords"),
        F.round(F.sum("n_subwords") / F.sum("n_words"), 4).alias("fertility"))
    return merges, counts, fert


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else tempfile.mkdtemp(prefix="bpe_tok_") + "/merges")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("tokenizer_train")
    merges, _, fert = train_tokenizer(spark, sf_dir, out_dir, k)
    for m in merges:
        print(f"  merge {m['it']:>2}: {m['l']!r} + {m['r']!r}  (n={m['n']})")
    print(fert.collect()[0].asDict())


if __name__ == "__main__":
    main()
