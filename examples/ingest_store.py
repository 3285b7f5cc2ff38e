"""A long-lived dedup-on-ingest store, end to end: nightly batches
arrive, a near-dup gate lands only survivors, the sharded signature
store grows one file per shard per batch, and a periodic compaction
rewrites it back to one file per shard — the maintenance loop that
keeps a months-old 100 TB ingest store's file listing (and therefore
every probe's planning cost) bounded, without a table format.

This composes the same operators the oracle-checked catalog queries
prove: `llm_ingest_gate_fold` (gate semantics), `llm_incremental_dedup`
(store probe semantics), `llm_store_compaction` (compaction is
invisible to results). The same compaction runs from the CLI:
`python -m etl_tool_spark -compact-store <store>`.

Run:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/ingest_store.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")  # run from the repo root

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_lifecycle(spark: SparkSession, sf_dir: str, base: str) -> dict:
    """Gate three batches into a store under ``base``, compact it, then
    replay re-keyed copies of every survivor against the compacted
    layout. Returns {survivors, leaked, compact_stats}."""
    from etl_tool_spark.llm import store as st
    from etl_tool_spark.streaming.dedup import land_near_batch

    store, landed = f"{base}/store", f"{base}/landed"
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                 .select("doc_id", "text"))

    # --- nightly drops: each batch passes the near-dup gate; only
    # survivors land AND only survivors enter the store (a dropped
    # duplicate must never flag later documents).
    n_batches = 3
    for b in range(n_batches):
        land_near_batch(docs.filter(F.col("doc_id") % n_batches == b),
                        b, store, landed)
        files = len(st.sharded_files(f"{store}/bands"))
        print(f"batch {b}: bands/ holds {files} files")

    survivors_before = spark.read.parquet(landed).count()

    # --- maintenance window: rewrite every store table in place
    # (crash-safe: staged copy first, manifest-promoted, any
    # interrupted promotion is finished by the next store open).
    stats = st.compact_store(spark, store)
    for table, s in stats.items():
        print(f"compacted {table}: {s['before']} -> {s['after']} files")

    # --- compaction must be invisible: the landed corpus re-reads
    # identically, and the next batch probes the compacted layout.
    assert spark.read.parquet(landed).count() == survivors_before
    replay = (spark.read.parquet(landed).select("doc_id")
                   .join(docs, "doc_id")   # exact copies of SURVIVORS…
                   .withColumn("doc_id",   # …under fresh ids
                               F.col("doc_id") + 1_000_000_000))
    land_near_batch(replay, n_batches, store, landed)
    leaked = spark.read.parquet(landed).count() - survivors_before
    print(f"post-compaction probe: {leaked} of {survivors_before} "
          f"re-keyed survivor copies landed (every one is an exact dup "
          f"of a stored survivor, so the gate drops them all)")
    return {"survivors": survivors_before, "leaked": leaked,
            "compact_stats": stats}


def main() -> None:
    import etl_tool_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark: SparkSession = etl_tool_spark.get_spark(
        "ingest-store-example",
        extra_conf={"spark.sql.shuffle.partitions": "8"})
    base = tempfile.mkdtemp(prefix="etl_ingest_store_")
    try:
        out = run_lifecycle(spark, sf_dir, base)
        assert out["leaked"] == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
