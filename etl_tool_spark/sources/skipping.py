"""File-level data skipping over plain parquet directories.

Vanilla Spark prunes row groups via parquet footer stats but still
lists and opens every file; table formats (Delta/Iceberg) skip files
outright using a stats manifest. This module is that manifest pattern
without the format dependency — the natural companion to the sinks'
``sortBy``/``zorderBy`` layouts, whose whole point is making per-file
ranges tight:

  * ``write_manifest`` — one scan of the table records each file's
    per-column (min, max, has_null) into ``<dir>/_manifest``; run it at
    write/compaction time (the moment the files are already hot).
  * ``pruned_read`` — consult the manifest for a range predicate and
    read ONLY the overlapping files. At 100 TB with a sorted/z-ordered
    layout this turns a needle query from list-and-open-everything into
    a handful of file reads — and the planning cost is a manifest scan
    of one row per file, not a file-system crawl.

Correctness rule: a file is skipped only when the manifest PROVES no
row can match (its range is disjoint and the column has no nulls in
that file with null-matching semantics excluded — we prune for
non-null range predicates, which never match nulls anyway). Files
missing from the manifest (e.g. appended after the last manifest
refresh) are always read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_manifest", "pruned_read"]

MANIFEST_NAME = "_manifest"


def write_manifest(spark: SparkSession, table_dir: str,
                   cols: list[str]) -> None:
    """Record per-file min/max (and row count) for ``cols`` under
    ``table_dir/_manifest``. One scan, aggregated by input file."""
    df = spark.read.parquet(table_dir)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    (df.withColumn("_file", F.input_file_name())
       .groupBy("_file").agg(*aggs)
       .coalesce(1)
       .write.mode("overwrite").parquet(f"{table_dir}/{MANIFEST_NAME}"))


def pruned_read(spark: SparkSession, table_dir: str, col: str,
                lo, hi) -> DataFrame:
    """Read only the files whose [min_col, max_col] overlaps [lo, hi],
    then apply the exact predicate. Equivalent to
    ``spark.read.parquet(dir).filter(col BETWEEN lo AND hi)`` — assert-
    tested — but touches only overlapping files. Files absent from the
    manifest are read unconditionally (append-safety)."""
    man = spark.read.parquet(f"{table_dir}/{MANIFEST_NAME}")
    if f"min_{col}" not in man.columns:
        raise ValueError(f"manifest has no stats for column {col!r}")
    overlap = (F.col(f"max_{col}") >= F.lit(lo)) \
        & (F.col(f"min_{col}") <= F.lit(hi))
    # ONE collect answers both "which files overlap" and "which files
    # the manifest knows" (a null overlap verdict — all-null stats —
    # reads as not-overlapping, same as the filter it replaces); the
    # manifest is one row per file, so the collect is file-count-sized
    rows = man.select("_file", overlap.alias("_keep")).collect()
    keep = [r["_file"] for r in rows if r["_keep"]]
    known = {r["_file"] for r in rows}
    base = spark.read.parquet(table_dir)
    all_files = [f for f in base.inputFiles()
                 if f"/{MANIFEST_NAME}/" not in f]
    unknown = [f for f in all_files if f not in known]
    paths = keep + unknown
    if not paths:
        return base.filter(F.lit(False))
    out = spark.read.schema(base.schema).parquet(*paths)
    return out.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
