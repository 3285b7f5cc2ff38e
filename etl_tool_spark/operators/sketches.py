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

__all__ = ["build_hll_sketches", "merge_distinct_estimate",
           "build_theta_sketches", "theta_set_estimate",
           "build_kll_sketches", "merge_quantile_estimate"]


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


def build_theta_sketches(df: DataFrame, keys: list[str], value_col: str,
                         out_dir: str) -> None:
    """Theta sketches per grain cell. Same build shape as HLL, but theta
    supports SET ALGEBRA at query time: union, intersection, and
    difference of cells — questions like 'distinct users who clicked
    AND purchased' that an HLL store cannot answer (HLL only unions)."""
    (df.groupBy(*keys)
       .agg(F.expr(f"theta_sketch_agg({value_col})").alias("sketch"))
       .write.mode("overwrite").parquet(out_dir))


def theta_set_estimate(spark: SparkSession, sketch_dir: str,
                       where_a: str, where_b: str,
                       op: str = "intersection") -> float:
    """Estimate |A ∘ B| from the theta store, where A and B are SQL
    predicates over the grain keys (each side unions its matching
    cells) and ``op`` is 'intersection', 'union', or 'difference'.
    Reads only the sketch table — never the source rows."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown theta op {op!r}")
    import uuid

    sk = spark.read.parquet(sketch_dir)
    # unique view name + cleanup: a fixed name would leak session state
    # and collide under concurrent callers of one SparkSession
    view = f"theta_store_{uuid.uuid4().hex}"
    sk.createOrReplaceTempView(view)
    try:
        a = f"(SELECT theta_union_agg(sketch) AS s FROM {view} WHERE {where_a})"
        b = f"(SELECT theta_union_agg(sketch) AS s FROM {view} WHERE {where_b})"
        row = spark.sql(
            f"SELECT theta_sketch_estimate(theta_{op}(a.s, b.s)) AS n "
            f"FROM {a} a CROSS JOIN {b} b").collect()[0]
    finally:
        spark.catalog.dropTempView(view)
    return float(row["n"])


def build_kll_sketches(df: DataFrame, keys: list[str], value_col: str,
                       out_dir: str) -> None:
    """KLL quantile sketches (double) per grain cell — the mergeable
    percentile analogue of the HLL store: per-day sketches built once
    answer any rollup's quantiles by merge, never rescanning rows."""
    (df.groupBy(*keys)
       .agg(F.expr(f"kll_sketch_agg_double({value_col})").alias("sketch"))
       .write.mode("overwrite").parquet(out_dir))


def merge_quantile_estimate(spark: SparkSession, sketch_dir: str,
                            probs: list[float],
                            group_by: list[str] | None = None) -> DataFrame:
    """Quantile estimates at any rollup of the sketched grain by KLL
    merge. Returns (group keys…, quantiles array<double> aligned with
    ``probs``)."""
    sk = spark.read.parquet(sketch_dir)
    qs = F.array(*[
        F.expr(f"kll_sketch_get_quantile_double(kll_merge_agg_double(sketch), "
               f"{float(p)!r}D)")
        for p in probs
    ]).alias("quantiles")
    if group_by:
        return sk.groupBy(*group_by).agg(qs)
    return sk.agg(qs)
