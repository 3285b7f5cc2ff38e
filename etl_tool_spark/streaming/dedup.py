"""Streaming near-duplicate detection: the incremental minhash pipeline
(llm/dedup.py:incremental_minhash_pairs) driven by Structured Streaming
micro-batches over a persistent signature store.

Each micro-batch of documents is shingle-hashed once, banded against the
signatures of every previously seen document, verified with exact
Jaccard, and appended to the store — so the stream continuously reports
each near-dup pair exactly when its *younger* member arrives, and the
union of all batches' outputs equals the one-shot batch pipeline over
everything ingested (the property tested for the batch API).

Delivery semantics: foreachBatch + checkpoint gives at-least-once here —
a batch replayed after a crash would re-append its signatures and pairs.
A production deployment makes the sink idempotent by keying on batch_id
(kept as a column for exactly that) or lands both writes in a
snapshot-isolated table format; raw parquet keeps this module
dependency-free."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.dedup import (incremental_exact_dedup,
                                      incremental_minhash_pairs)

__all__ = ["near_dedup_stream", "exact_dedup_stream"]


def near_dedup_stream(docs: DataFrame, store_dir: str, pairs_dir: str,
                      checkpoint: str, id_col: str = "doc_id",
                      text_col: str = "text", **minhash_kwargs):
    """Run a streaming documents frame through incremental near-dedup.

    ``docs`` is a streaming DataFrame with (id_col, text_col). Discovered
    pairs land in ``pairs_dir`` as parquet (a, b, jaccard, batch_id),
    append-only. Runs with the availableNow trigger (drain-current-files;
    swap the trigger for continuous ingest). Returns the finished query."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_minhash_pairs(
            batch_df, store_dir, id_col=id_col, text_col=text_col,
            **minhash_kwargs)
        (pairs.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(pairs_dir))

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def exact_dedup_stream(docs: DataFrame, store_dir: str, out_dir: str,
                       checkpoint: str, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Streaming exact dedup-on-ingest: each micro-batch keeps only
    documents whose normalized text was never seen (across ALL prior
    batches, via the persistent fingerprint store) and appends the
    survivors to ``out_dir`` — the always-deduped landing zone. Same
    at-least-once/foreachBatch semantics as near_dedup_stream; the store
    anti-join makes a replayed batch a no-op for already-landed docs."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        fresh = incremental_exact_dedup(batch_df, store_dir,
                                        id_col=id_col, text_col=text_col)
        (fresh.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(out_dir))

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
