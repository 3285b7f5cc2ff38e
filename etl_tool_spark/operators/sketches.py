"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark ≥3.5 as ``hll_sketch_agg`` / ``hll_union_agg``).

The incremental-analytics pattern a 100 TB deployment actually runs:
distinct users per (day, …) is needed daily, but re-scanning history
per query is O(corpus). Instead, build one HLL sketch per grain cell
ONCE (each day's job sketches only that day's data), persist the
sketches as a tiny table, and answer any coarser distinct-count
question — per week, per type, global — by MERGING sketches, never
rescanning rows. Sketch union is exact over the sketch state, so the
rollup estimate equals the estimate a direct sketch of the union would
give.

Estimates are approximate (~1.6% stdd at lgK=12) and the driver's
value-hash oracle cannot bind them — these are API + pytest surface
(tolerance vs exact counts), mirroring agg_approx_distinct's rows-only
stance in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_hll_sketches", "merge_distinct_estimate"]


def build_hll_sketches(df: DataFrame, keys: list[str], value_col: str,
                       out_dir: str, lg_k: int = 12) -> None:
    """Aggregate one HLL sketch of ``value_col`` per ``keys`` cell and
    persist them (binary sketch column + the grain keys). One shuffle on
    the grain keys with map-side partial sketching; the output is tiny
    (≈2^lg_k bytes per cell) regardless of input row count."""
    (df.groupBy(*keys)
       .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"))
       .write.mode("overwrite").parquet(out_dir))


def merge_distinct_estimate(spark: SparkSession, sketch_dir: str,
                            group_by: list[str] | None = None,
                            lg_k: int = 12) -> DataFrame:
    """Distinct-count estimates at ANY rollup of the sketched grain, by
    unioning the persisted sketches — no row rescan. ``group_by`` must
    be a subset of the build's ``keys`` (empty/None = the global
    estimate)."""
    sk = spark.read.parquet(sketch_dir)
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sketch"), F.lit(True))).alias("n_distinct")
    if group_by:
        return sk.groupBy(*group_by).agg(agg)
    return sk.agg(agg)
