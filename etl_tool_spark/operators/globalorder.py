"""Global-order operators without a global sort.

Spark expresses "running total over the WHOLE table" as a window with
no PARTITION BY — which executes on a single task and is therefore the
canonical 100 TB scale-killer. The operators here decompose any
prefix-aggregate over a global order into:

  1. a *band summary* — one partial-agg'd shuffle keyed by a coarse,
     order-consistent band (a score value, a price bucket, a date);
     its row count is bounded by the band-key cardinality, which by
     contract does NOT scale with the data volume;
  2. ONE tiny single-partition window over that summary (thousands of
     rows, not billions) to produce per-band prefix offsets;
  3. a broadcast join of the offsets back to the rows and a window
     PARTITIONED BY band for the intra-band prefix — fully parallel
     across bands.

The decomposition is exact (not approximate) whenever the band key is
monotone along the requested global order, i.e. global order ==
(band, intra-order) lexicographically. Callers pick the band: the
order key itself when its cardinality is bounded (a 4-decimal score →
≤10⁴ bands), else a coarsening (``floor(price)``, a date truncation).

Skew note: a band holding a large fraction of all rows serializes its
intra-band window onto few tasks. That is still strictly better than
the single-task global window, and when the band is a coarsening the
caller can always refine it (more bands → smaller partitions) without
changing results.

The reference engine (brian-c-moore/etl-tool) has no ordering/window
surface at all (playbook_development_guide.md:461); these operators are
part of the Spark-native north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["banded_cumsum", "banded_prefix_max", "budget_select"]


def banded_cumsum(df: DataFrame, band: str, intra_order: list[Column],
                  value: str, out: str = "cum",
                  band_desc: bool = False) -> DataFrame:
    """Exact running ``sum(value)`` along the global order
    ``(band ASC|DESC, *intra_order)`` — inclusive of the current row —
    without a single-partition window over the data.

    ``band`` must be a column of ``df`` whose cardinality is bounded
    (see module docstring). Adds column ``out``; preserves all others.
    """
    bcol = F.col(band).desc() if band_desc else F.col(band).asc()
    summary = df.groupBy(band).agg(F.sum(F.col(value)).alias("_mass"))
    w_bands = (Window.orderBy(bcol)
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = summary.select(
        band, F.coalesce(F.sum("_mass").over(w_bands), F.lit(0))
               .alias("_offset"))
    w_intra = (Window.partitionBy(band).orderBy(*intra_order)
               .rowsBetween(Window.unboundedPreceding, 0))
    return (df.join(F.broadcast(offsets), band)
              .withColumn(out, F.col("_offset")
                          + F.sum(F.col(value)).over(w_intra))
              .drop("_offset"))


def banded_prefix_max(df: DataFrame, band: str, intra_order: list[Column],
                      value: str, out: str = "prev_max",
                      band_desc: bool = False) -> DataFrame:
    """Exact running ``max(value)`` over the rows STRICTLY PRECEDING each
    row in the global order ``(band ASC|DESC, *intra_order)`` (exclusive
    prefix — the row's own value is not included; NULL for the first
    row). Same banding contract as :func:`banded_cumsum`.
    """
    bcol = F.col(band).desc() if band_desc else F.col(band).asc()
    summary = df.groupBy(band).agg(F.max(F.col(value)).alias("_bmax"))
    w_bands = (Window.orderBy(bcol)
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = summary.select(
        band, F.max("_bmax").over(w_bands).alias("_boffset"))
    w_intra = (Window.partitionBy(band).orderBy(*intra_order)
               .rowsBetween(Window.unboundedPreceding, -1))
    intra_prev = F.max(F.col(value)).over(w_intra)
    return (df.join(F.broadcast(offsets), band)
              .withColumn(out, F.greatest(
                  F.coalesce(F.col("_boffset"), intra_prev),
                  F.coalesce(intra_prev, F.col("_boffset"))))
              .drop("_boffset"))


def budget_select(df: DataFrame, band: str, intra_order: list[Column],
                  weight: str, budget: Column,
                  cum_out: str = "cum") -> DataFrame:
    """Greedy budget fill: walk ``df`` in the global order
    ``(band DESC, *intra_order)`` (best first) and keep every row whose
    PRECEDING cumulative ``weight`` is still under ``budget`` — i.e. the
    boundary row that crosses the budget is included, everything after
    it is dropped. ``budget`` may reference aggregate-derived columns
    already attached to ``df`` (e.g. a broadcast scalar).

    Keeps all input columns plus ``cum_out`` (the inclusive running
    weight). Only the band summary is globally ordered; the per-row
    work is one broadcast join plus a band-parallel window.
    """
    cum = banded_cumsum(df, band, intra_order, weight,
                        out=cum_out, band_desc=True)
    return cum.filter((F.col(cum_out) - F.col(weight)) < budget)
