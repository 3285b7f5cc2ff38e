"""Bucketed table layout — the co-located (sort-merge-bucket) join.

The biggest recurring join at 100 TB is usually fact×fact on a shared
key (orders×customer, events×profiles, signatures×store). Shuffling
both sides on every run IS the cost; the warehouse answer is to pay the
shuffle ONCE at write time: persist both tables `bucketBy(n, key)` +
`sortBy(key)`, and every subsequent equi-join on that key reads
bucket i of each side into the same task — a SortMergeJoin with NO
Exchange on either side (a cheap per-task Sort remains: Spark only
consumes in-bucket sort order under the legacy sorted-scan conf with
one file per bucket — the network exchange is the cost that matters
at 100 TB, and that is what the layout removes; ``sortBy`` still buys
sorted row groups, i.e. min/max pruning on the key). SCALE.md cites this
layout as the answer for the dedup store, the CDC snapshot, and the
LSH probe join; this module makes it an executable, plan-assertable
operator instead of prose.

Mechanics (all public Spark): ``bucketBy`` requires ``saveAsTable``
(bucket metadata lives in the catalog, not the parquet footer — a
plain ``.parquet(path)`` write cannot carry it); joins collapse to
exchange-free only when BOTH sides are bucketed on the join key with
the same bucket count and ``spark.sql.sources.bucketing.enabled`` is
on (default). Bucket pruning additionally serves point lookups on the
bucket key from one bucket's files.

Scale sizing: n_buckets fixes per-bucket file count × size for the
table's LIFETIME — size it to (expected table size) / (target
file size ≈ shuffle-partition target), and keep it a power of two so a
2× re-bucket can reuse half the hash space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_scan"]


def write_bucketed(df: DataFrame, table: str, path: str,
                   keys: list[str], n_buckets: int,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (+ in-bucket sorted) parquet table
    rooted at ``path`` and registered as ``table``. One repartition-
    by-bucket-hash shuffle now; every later equi-join between tables
    bucketed alike on ``keys`` runs exchange-free."""
    if n_buckets < 1:
        raise ValueError(f"write_bucketed: n_buckets must be >= 1, "
                         f"got {n_buckets}")
    (df.write.mode(mode).format("parquet").option("path", path)
       .bucketBy(n_buckets, *keys)
       .sortBy(*(sort_cols or keys))
       .saveAsTable(table))


def bucketed_scan(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` on the same files would lose it and
    reintroduce the join-time shuffle)."""
    return spark.table(table)
