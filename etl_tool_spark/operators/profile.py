"""Data profiling: per-column statistics in ONE pass over the table.

The reference has no profiling at all (its closest notion is the
validation transforms, SURVEY §2.4); engines grow one because every
onboarding/debugging session starts with "what's in this column?".

Scale shape: a single wide aggregation computes every column's
counters simultaneously — one scan, one reduce — then a zero-shuffle
unpivot turns the 1-row wide result into (column, stat...) rows.
`count(DISTINCT c1), count(DISTINCT c2), ...` in one aggregate plans
through Catalyst's Expand (data duplicated once per distinct-column in
the map stage) — still one scan, and exact. For quick profiles of very
wide tables pass ``approx=True`` to swap in HLL sketches
(approx_count_distinct), which removes the Expand entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile"]


def profile(df: DataFrame, cols: list[str] | None = None,
            approx: bool = False) -> DataFrame:
    """Long-format profile: one row per column with row/null/distinct
    counts and min/max (rendered as strings so mixed column types share
    one schema). Deterministic unless ``approx=True``."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")
    distinct = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            distinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mn_{c}"),
            F.max(col).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(F.lit(c).alias("column"),
                 F.col("_n_rows").alias("n_rows"),
                 (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_null"),
                 F.col(f"_nd_{c}").alias("n_distinct"),
                 F.col(f"_mn_{c}").alias("min_value"),
                 F.col(f"_mx_{c}").alias("max_value"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*per_col)).alias("p"))
                .select("p.*"))
