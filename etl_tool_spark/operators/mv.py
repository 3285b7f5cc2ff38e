"""Incremental materialized-view maintenance over the CDC snapshot store.

A grouped-aggregate MV (group → sum + row count) stays correct under a
stream of upserts/deletes WITHOUT recomputing from the base table: each
change batch contributes signed deltas — minus the OLD payload of every
touched key, plus the NEW payload — and sums/counts are abelian, so
folding the deltas into the MV is exact. Cost per batch:

  * base-table side: whatever ``merge_cdc_batch`` costs (bucketed
    rewrite ∝ change volume — streaming/cdc.py);
  * old/new payload lookups: the snapshot restricted to the batch's
    keys by a semi-join (the store is bucketed on the key, so this
    prunes to the touched buckets, ∝ batch);
  * MV fold: one outer join on a frame whose size is the number of
    TOUCHED groups, rewritten into a GROUP-CARDINALITY-sized table.

Nothing scales with the base-table size — that is the entire point of
an incremental MV at 100 TB, where "just re-aggregate" is a full scan
per refresh. The catalog's ``etl_incremental_mv_fold`` proves the fold
exact against a DuckDB full recompute of the final state.

Deletes shrink groups to zero membership; such groups leave the MV
(n > 0 filter), matching what a recompute would produce. The MV is
integer-exact by contract: callers pass an integral value column
(e.g. money in cents) so delta folding can never drift the way float
accumulation would.

The reference has no aggregation surface at all
(playbook_development_guide.md:461); this is north-star warehouse
functionality, designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["update_agg_mv"]


def _touched(snapshot: DataFrame, keys: list[str],
             touched_keys: DataFrame) -> DataFrame:
    return snapshot.join(touched_keys, keys, "semi")


def update_agg_mv(spark: SparkSession, snapshot_dir: str, mv_dir: str,
                  changes: DataFrame, keys: list[str], group_col: str,
                  value_col: str, batch_id: int,
                  seq_col: str = "seq", op_col: str = "op") -> DataFrame:
    """Apply one CDC batch to the base snapshot AND its grouped-sum MV.

    ``changes``: keys + seq_col + op_col + payload (must include
    ``group_col`` and an integral ``value_col``). Batch ids must be
    sequential from 0 (the MV version chain is ``mv_dir/v{batch_id}``;
    a production deployment would commit MV versions through the same
    manifest protocol as the snapshot store — the plain versioned dir
    keeps this operator focused on the delta algebra). Returns the new
    MV frame: (group_col, mv_sum, mv_n).
    """
    from etl_tool_spark.streaming.cdc import (list_versions,
                                              merge_cdc_batch,
                                              read_snapshot)

    tk = changes.select(*keys).distinct()

    def grouped(df: DataFrame, sign: int) -> DataFrame:
        return df.select(F.col(group_col).alias("_g"),
                         (F.col(value_col).cast("long")
                          * F.lit(sign)).alias("_v"),
                         F.lit(sign).cast("long").alias("_s"))

    if list_versions(spark, snapshot_dir):
        old_touched = grouped(_touched(read_snapshot(spark, snapshot_dir),
                                       keys, tk), -1)
    else:
        old_touched = grouped(changes.limit(0), -1)

    merge_cdc_batch(changes, snapshot_dir, keys=keys,
                    seq_col=seq_col, op_col=op_col, batch_id=batch_id)

    new_touched = grouped(_touched(read_snapshot(spark, snapshot_dir),
                                   keys, tk), 1)
    delta = (new_touched.unionByName(old_touched)
             .groupBy("_g")
             .agg(F.sum("_v").alias("_dv"), F.sum("_s").alias("_dn")))

    if batch_id > 0:
        prev = spark.read.parquet(f"{mv_dir}/v{batch_id - 1}")
    else:  # typed empty MV derived from the delta frame (any group type)
        prev = delta.limit(0).select(
            F.col("_g").alias(group_col),
            F.lit(0).cast("long").alias("mv_sum"),
            F.lit(0).cast("long").alias("mv_n"))
    merged = (prev.withColumnRenamed(group_col, "_g")
              .join(delta, "_g", "full_outer")
              .select(F.col("_g").alias(group_col),
                      (F.coalesce("mv_sum", F.lit(0))
                       + F.coalesce("_dv", F.lit(0))).alias("mv_sum"),
                      (F.coalesce("mv_n", F.lit(0))
                       + F.coalesce("_dn", F.lit(0))).alias("mv_n"))
              .filter(F.col("mv_n") > 0))
    merged.write.parquet(f"{mv_dir}/v{batch_id}")
    return spark.read.parquet(f"{mv_dir}/v{batch_id}")
