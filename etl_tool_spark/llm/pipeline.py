"""The end-to-end training-data cleaning pipeline, composed from the
operator families: quality filter → language filter → exact dedup →
MinHash near-dedup. One call produces the clean corpus the way a real
100 TB data pipeline would — each stage is the scale-shaped operator
from its module, and the whole chain is a single lazy plan.

Near-dup policy (deterministic contract), two dials:
  * pairwise (default): any doc appearing as the higher-id side of a
    verified near-dup pair is dropped — the lower id is canonical.
    Removes ≥ one of every pair, single-pass, oracle-checkable in one
    non-recursive query.
  * transitive=True: pairs are collapsed by connected components
    (llm/graph.py) and only each component's min id survives — if A~B
    and B~C, one representative remains even when A~C missed the
    threshold. Costs the iterative fixpoint on the (tiny) pairs graph;
    this is what a production corpus dedup runs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.dedup import exact_dedup, minhash_dedup_pairs
from etl_tool_spark.llm.graph import connected_components
from etl_tool_spark.llm.text import fingerprint, language_id, quality_features, tokens

__all__ = ["clean_corpus"]


def clean_corpus(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 min_quality: float = 0.5, jaccard_threshold: float = 0.7,
                 staging_dir: str | None = None,
                 transitive: bool = False) -> DataFrame:
    """Return the surviving documents (id + text) after the four cleaning
    stages. Filters run FIRST so the expensive near-dup hashing only sees
    documents that can survive — the order matters at scale."""
    # tokenize ONCE: the token array feeds both the quality score and the
    # language-ID argmax; left inline, CollapseProject re-inlines the regex
    # split into every consumer expression (the HOF-inlining pitfall —
    # same fix as _signed in llm/dedup.py). `_toks` is multiply-referenced
    # from its own projection, so Catalyst keeps it materialized.
    base = df.select("*", tokens(F.col(text_col)).alias("_toks"))
    feats = quality_features(F.col(text_col), toks=F.col("_toks"))
    kept = (base.select("*",
                        feats["quality_score"].alias("_q"),
                        language_id(F.col(text_col), toks=F.col("_toks")).alias("_lang"))
              .filter((F.col("_q") >= min_quality) & (F.col("_lang") != "und"))
              .drop("_toks"))

    # exact dedup: keep the min-id representative per normalized fingerprint
    reps = (kept.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fp"))
                .groupBy("_fp").agg(F.min(id_col).alias(id_col))
                .select(id_col))
    uniq = kept.join(reps, id_col, "left_semi")

    hs = None
    if staging_dir:
        # checkpoint the filtered+exact-deduped corpus ONCE: it has
        # three downstream consumers (the signature build and both the
        # pair verify's and the final anti-join's doc sides), and
        # without staging each consumer re-runs the quality/langid/
        # fingerprint chain over the full input. This is the standard
        # production stage boundary — the cleaned-corpus table a 100 TB
        # pipeline writes between phases anyway. (AQE exchange reuse
        # can't help: the consumers aggregate differently, so their
        # exchanges never canonicalize equal.)
        # The shingle-hash signatures ride the SAME write: one staged
        # (id, text, _hs) table instead of a corpus checkpoint followed
        # by a second signature-staging pass over it — one fewer full
        # read of the cleaned corpus and one fewer write job
        # (optimization guide §1.2 fewer passes). Hash family must match
        # minhash_dedup_pairs' default shingle_n below.
        from etl_tool_spark.llm.dedup import shingle_hashes
        corpus_dir = f"{staging_dir.rstrip('/')}_corpus"
        (uniq.select("*", shingle_hashes(F.col(text_col), 3).alias("_hs"))
             .write.mode("overwrite").parquet(corpus_dir))
        staged = df.sparkSession.read.parquet(corpus_dir)
        uniq = staged.drop("_hs")
        hs = staged.select(F.col(id_col), "_hs")

    # near-dup: pairwise drop-higher-id, or transitive component collapse
    pairs = minhash_dedup_pairs(uniq, id_col=id_col, text_col=text_col,
                                shingle_n=3, threshold=jaccard_threshold,
                                hs_frame=hs)
    if transitive:
        comp = connected_components(pairs, src="a", dst="b")
        drop_ids = (comp.filter(F.col("label") != F.col("id"))
                        .select(F.col("id").alias(id_col)))
    else:
        drop_ids = pairs.select(F.col("b").alias(id_col)).distinct()
    return (uniq.join(drop_ids, id_col, "left_anti")
                .select(id_col, text_col))
