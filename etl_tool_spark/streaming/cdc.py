"""CDC merge: streaming upserts/deletes into a keyed snapshot table.

The missing half of a change-data-capture pipeline: a stream of change
records (op = I/U/D + a monotonically increasing sequence per key) is
folded into a queryable snapshot holding the LATEST surviving row per
key. On managed table formats this is ``MERGE INTO`` (Delta/Iceberg);
this is the format-agnostic copy-on-write rendition over plain parquet,
shaped so the rewrite cost scales with the CHANGE volume, not the
snapshot size:

  * the snapshot is hash-bucketed on the key (``_bucket`` partition
    column, ``pmod(xxhash64(keys), n_buckets)``);
  * each micro-batch reduces to its latest change per key (one window),
    computes the affected bucket list (≤ n_buckets values, driver-side),
    and reads ONLY those partition directories back (partition pruning
    on ``_bucket``);
  * merge = anti-join the old bucket contents against the batch's keys,
    union the surviving upserts, and dynamically overwrite JUST those
    bucket partitions (``partitionOverwriteMode=dynamic``). Untouched
    buckets are never read or written.

At 100 TB: n_buckets scales to thousands; a batch touching k distinct
buckets costs k bucket rewrites regardless of total snapshot size. The
read-merge-write per batch is materialized (``localCheckpoint``) before
the overwrite because Spark cannot lazily read the same files a job is
replacing.

Ordering contract: within a batch the greatest ``seq_col`` wins per key
(ties: delete loses to upsert, making replays idempotent-safe);
ACROSS batches later batches win unconditionally — the stream must be
per-key ordered batch-to-batch, which Structured Streaming's
source-offset ordering provides when the CDC feed is per-key ordered
(Kafka key-partitioning, Debezium per-table topics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def _snapshot_exists(spark: SparkSession, snapshot_dir: str) -> bool:
    # executor-free check via the Hadoop FS API (works for any scheme)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
    return path.getFileSystem(conf).exists(path)


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Current snapshot without the bucketing column."""
    return spark.read.parquet(snapshot_dir).drop(BUCKET_COL)


def merge_cdc_batch(batch: DataFrame, snapshot_dir: str,
                    keys: list[str], seq_col: str = "seq",
                    op_col: str = "op", n_buckets: int = 16) -> None:
    """Fold one batch of change records into the snapshot (see module
    docstring). ``batch`` columns: keys + seq_col + op_col + payload."""
    spark = batch.sparkSession

    # latest change per key this batch; on equal seq a delete loses
    op_rank = F.when(F.col(op_col) == "D", 0).otherwise(1)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), op_rank.desc())
    latest = (batch.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn")
                   .withColumn(BUCKET_COL,
                               F.pmod(F.xxhash64(*keys), F.lit(n_buckets))))

    upserts = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)

    if not _snapshot_exists(spark, snapshot_dir):
        (upserts.write.partitionBy(BUCKET_COL).mode("overwrite")
                .parquet(snapshot_dir))
        return

    affected = [r[0] for r in latest.select(BUCKET_COL).distinct().collect()]
    if not affected:
        return
    old = (spark.read.parquet(snapshot_dir)
                .filter(F.col(BUCKET_COL).isin(affected)))  # partition-pruned
    keep = old.join(latest.select(*keys), keys, "left_anti")
    merged = keep.unionByName(upserts).localCheckpoint(eager=True)

    overwrite_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                                    "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (merged.write.partitionBy(BUCKET_COL).mode("overwrite")
               .parquet(snapshot_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", overwrite_mode)

    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a bucket whose every key was deleted writes no partition and would
    # keep its stale files — remove those directories explicitly
    present = {r[0] for r in merged.select(BUCKET_COL).distinct().collect()}
    emptied = [b for b in affected if b not in present]
    if emptied:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        for b in emptied:
            p = jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/{BUCKET_COL}={b}")
            fs = p.getFileSystem(conf)
            if fs.exists(p):
                fs.delete(p, True)


def cdc_merge_stream(changes: DataFrame, snapshot_dir: str, checkpoint: str,
                     keys: list[str], seq_col: str = "seq",
                     op_col: str = "op", n_buckets: int = 16):
    """Attach the CDC merge to a streaming frame via foreachBatch.
    Returns the started StreamingQuery (exactly-once per batch id via
    the checkpoint; merge_cdc_batch itself is idempotent on replay of
    the same batch)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_cdc_batch(batch_df, snapshot_dir, keys=keys, seq_col=seq_col,
                        op_col=op_col, n_buckets=n_buckets)

    return (changes.writeStream.foreachBatch(_merge)
                   .option("checkpointLocation", checkpoint)
                   .trigger(availableNow=True)
                   .start())
