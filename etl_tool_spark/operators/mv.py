"""Incremental materialized-view maintenance over the CDC snapshot store.

A grouped-aggregate MV (group → sum + row count, optionally min/max)
stays correct under a stream of upserts/deletes WITHOUT recomputing
from the base table: each change batch contributes signed deltas —
minus the OLD payload of every touched key, plus the NEW payload — and
sums/counts are abelian, so folding the deltas into the MV is exact.
Cost per batch:

  * base-table side: whatever ``merge_cdc_batch`` costs (bucketed
    rewrite ∝ change volume — streaming/cdc.py);
  * old/new payload lookups: the snapshot restricted to the batch's
    keys by a semi-join (the store is bucketed on the key, so this
    prunes to the touched buckets, ∝ batch);
  * MV fold: one outer join on a frame whose size is the number of
    TOUCHED groups, rewritten into a GROUP-CARDINALITY-sized table.

MIN/MAX are not delta-foldable (a delete can remove the extreme, and
the second-best is not in the MV) — the textbook non-distributive IVM
case. ``track_minmax=True`` handles it with the standard refinement:
inserts fold for free (``least``/``greatest`` against the stored
extreme); a group re-aggregates ONLY when a removed old value tied or
beat its stored extreme (``lossy`` groups), and that recompute reads
just those groups' rows back from the snapshot (a group-keyed
semi-join — with a group-clustered layout this is a pruned scan; worst
case it is ∝ the affected groups' row counts, never the table).

Nothing scales with the base-table size — that is the entire point of
an incremental MV at 100 TB, where "just re-aggregate" is a full scan
per refresh. The catalog's ``etl_incremental_mv_fold`` /
``etl_incremental_mv_minmax_fold`` prove both folds exact against a
DuckDB full recompute of the final state.

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


def update_agg_mv(spark: SparkSession, snapshot_dir: str, mv_dir: str,
                  changes: DataFrame, keys: list[str], group_col: str,
                  value_col: str, batch_id: int,
                  seq_col: str = "seq", op_col: str = "op",
                  track_minmax: bool = False) -> DataFrame:
    """Apply one CDC batch to the base snapshot AND its grouped-sum MV.

    ``changes``: keys + seq_col + op_col + payload (must include
    ``group_col`` and an integral ``value_col``). Batch ids must be
    sequential from 0 (the MV version chain is ``mv_dir/v{batch_id}``;
    a production deployment would commit MV versions through the same
    manifest protocol as the snapshot store — the plain versioned dir
    keeps this operator focused on the delta algebra). Returns the new
    MV frame: (group_col, mv_sum, mv_n[, mv_min, mv_max]).

    Retry contract (the snapshot merge and the MV write cannot be one
    atomic commit across two stores): the old-side read is pinned to
    the snapshot VERSION PRECEDING the batch's merge, located through
    the manifests' batch_id — never to "current". So a re-run after a
    crash between the merge and the MV write recomputes the SAME delta
    (a current-snapshot read would see the batch already applied, fold
    a zero delta, and silently lose the batch from the MV forever). A
    fully-written MV version (_SUCCESS present) short-circuits the
    replay; a partial one is overwritten.
    """
    from etl_tool_spark.streaming.cdc import (_fs, _load_manifest,
                                              list_versions,
                                              merge_cdc_batch,
                                              read_snapshot)

    mv_path = f"{mv_dir}/v{batch_id}"
    fs, marker, _ = _fs(spark, f"{mv_path}/_SUCCESS")
    if fs.exists(marker):  # replay of a fully-applied batch: no-op
        return spark.read.parquet(mv_path)

    def batch_version() -> int | None:
        for n in reversed(list_versions(spark, snapshot_dir)):
            m = _load_manifest(spark, snapshot_dir, n)
            if m.get("batch_id") == batch_id:
                return n
        return None

    applied_at = batch_version()
    if applied_at is None:
        merge_cdc_batch(changes, snapshot_dir, keys=keys,
                        seq_col=seq_col, op_col=op_col, batch_id=batch_id)
        applied_at = batch_version()
    if applied_at is None:
        # batch touched no buckets → no version committed → zero delta:
        # pin old and new to the SAME (current) version so differences
        # from other batches can never leak into this fold
        vs = list_versions(spark, snapshot_dir)
        applied_at = vs[-1] if vs else None
        pre_versions = [applied_at] if applied_at is not None else []
    else:
        pre_versions = [n for n in list_versions(spark, snapshot_dir)
                        if n < applied_at]
        if applied_at > 1 and not pre_versions:
            raise RuntimeError(
                f"cannot refresh MV for batch {batch_id}: snapshot version "
                f"{applied_at - 1} (the pre-batch state) was vacuumed; keep "
                "at least 2 versions while MV refreshes can still be retried")

    tk = changes.select(*keys).distinct()

    def touched(snapshot: DataFrame) -> DataFrame:
        return (snapshot.join(tk, keys, "semi")
                .select(F.col(group_col).alias("_g"),
                        F.col(value_col).cast("long").alias("_val")))

    old_t = (touched(read_snapshot(spark, snapshot_dir,
                                   version=pre_versions[-1]))
             if pre_versions else touched(changes.limit(0)))
    snap = (read_snapshot(spark, snapshot_dir, version=applied_at)
            if applied_at is not None else changes.limit(0))
    new_t = touched(snap)

    def signed(df: DataFrame, sign: int) -> DataFrame:
        return df.select("_g", (F.col("_val") * sign).alias("_v"),
                         F.lit(sign).cast("long").alias("_s"))

    delta = (signed(new_t, 1).unionByName(signed(old_t, -1))
             .groupBy("_g")
             .agg(F.sum("_v").alias("_dv"), F.sum("_s").alias("_dn")))
    if track_minmax:
        ext = (new_t.groupBy("_g").agg(F.min("_val").alias("_nmin"),
                                       F.max("_val").alias("_nmax"))
               .join(old_t.groupBy("_g").agg(F.min("_val").alias("_omin"),
                                             F.max("_val").alias("_omax")),
                     "_g", "full_outer"))
        delta = delta.join(ext, "_g", "left")

    mv_cols = ["mv_sum", "mv_n"] + (["mv_min", "mv_max"]
                                    if track_minmax else [])
    if batch_id > 0:
        prev = spark.read.parquet(f"{mv_dir}/v{batch_id - 1}")
    else:  # typed empty MV derived from the delta frame (any group type)
        prev = delta.limit(0).select(
            F.col("_g").alias(group_col),
            *[F.lit(0).cast("long").alias(c) for c in mv_cols])

    merged = (prev.withColumnRenamed(group_col, "_g")
              .join(delta, "_g", "full_outer")
              .withColumn("mv_sum", F.coalesce("mv_sum", F.lit(0))
                          + F.coalesce("_dv", F.lit(0)))
              .withColumn("mv_n", F.coalesce("mv_n", F.lit(0))
                          + F.coalesce("_dn", F.lit(0)))
              .filter(F.col("mv_n") > 0))

    if track_minmax:
        # a removed value that tied/beat the stored extreme may expose a
        # second-best the MV never kept → that group re-aggregates from
        # the snapshot; every other group folds with least/greatest
        lossy = ((F.col("_omin").isNotNull() & F.col("mv_min").isNotNull()
                  & ((F.col("_omin") <= F.col("mv_min"))
                     | (F.col("_omax") >= F.col("mv_max")))))
        merged = merged.withColumn("_lossy", F.coalesce(lossy, F.lit(False)))
        redo = (snap.join(merged.filter("_lossy")
                          .select(F.col("_g").alias(group_col)).distinct(),
                          group_col, "semi")
                .groupBy(F.col(group_col).alias("_g"))
                .agg(F.min(F.col(value_col).cast("long")).alias("_rmin"),
                     F.max(F.col(value_col).cast("long")).alias("_rmax")))
        merged = (merged.join(redo, "_g", "left")
                  .withColumn("mv_min", F.when(F.col("_lossy"), F.col("_rmin"))
                              .otherwise(F.least(
                                  F.coalesce("mv_min", F.col("_nmin")),
                                  F.coalesce("_nmin", F.col("mv_min")))))
                  .withColumn("mv_max", F.when(F.col("_lossy"), F.col("_rmax"))
                              .otherwise(F.greatest(
                                  F.coalesce("mv_max", F.col("_nmax")),
                                  F.coalesce("_nmax", F.col("mv_max"))))))

    out = merged.select(F.col("_g").alias(group_col), *mv_cols)
    # overwrite, not error-if-exists: a crashed earlier attempt may have
    # left a partial v{batch_id} dir (no _SUCCESS — the short-circuit at
    # the top only accepts complete writes)
    out.write.mode("overwrite").parquet(mv_path)
    return spark.read.parquet(mv_path)
