"""Table maintenance: small-file compaction.

The classic 100 TB operational failure mode is not a slow query but a
table of millions of KB-sized files: every scan pays per-file open
cost, the driver pays listing time, and shuffle-partition planning
degrades. Streaming sinks, incremental appends, and over-parallel
writers all produce this. ``compact_parquet`` rewrites a directory at a
target file size, preserving (or re-laying) the partitioning scheme.

Design notes:
  * Sizing uses the real on-disk byte sizes from the Hadoop FileSystem
    API (works for local paths and any Hadoop-supported store), not row
    counts — compression ratios vary too much per table for row-based
    sizing.
  * The rewrite is a plain repartition(n) — one shuffle whose output IS
    the compacted layout. With ``sort_by`` it becomes the range-sorted
    layout (see sinks.sortBy) at no extra cost: compaction is the
    natural moment to impose order.
  * Output goes to a NEW directory (or replaces atomically-enough via
    overwrite of a separate path) — compaction must never destroy the
    source before the rewrite commits; the caller swaps directories
    after validation. This mirrors how table formats run OPTIMIZE into
    new files and commit a metadata swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _tree_size_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (correct
    for local disk, HDFS, and object stores alike)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_mb: int = 128,
                    partition_by: list[str] | None = None,
                    sort_by: list[str] | None = None,
                    zorder_by: list[str] | None = None) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with files of
    roughly ``target_file_mb``. Returns a summary dict
    (bytes, files_before, files_after, rows).

    ``partition_by`` re-lays the directory partitioning (pass the same
    columns to keep an existing scheme — Spark reads partition columns
    back from the directory names, so they round-trip). ``sort_by``
    range-sorts while compacting (global order ≙ sinks.sortBy);
    ``zorder_by`` multi-column-clusters instead (≙ sinks.zorderBy) —
    compaction is the natural moment to impose either layout.
    """
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    df: DataFrame = spark.read.parquet(src)
    total = _tree_size_bytes(spark, src)
    files_before = len(df.inputFiles())
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))  # ceil
    if sort_by:
        out = df.repartitionByRange(int(n), *sort_by) \
                .sortWithinPartitions(*sort_by)
    elif zorder_by:
        from etl_tool_spark.sources.sinks import _zorder

        out = _zorder(df, list(zorder_by), int(n))
    else:
        out = df.repartition(int(n))
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    back = spark.read.parquet(dst)
    return {
        "bytes": int(total),
        "files_before": files_before,
        "files_after": len(back.inputFiles()),
        "rows": back.count(),
    }
