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


BandSpec = str | list  # str | list[str | tuple[str, bool]]


def _band_levels(band: BandSpec, band_desc: bool) -> list[tuple[str, bool]]:
    """Normalize a band spec to [(column_name, descending)] levels.
    A bare ``str`` (the original single-level form) and bare strings
    inside a list inherit ``band_desc``."""
    if isinstance(band, str):
        return [(band, band_desc)]
    if not band:
        raise ValueError("banded_cumsum: band spec must name >= 1 level")
    return [(b, band_desc) if isinstance(b, str) else (b[0], bool(b[1]))
            for b in band]


def banded_cumsum(df: DataFrame, band: BandSpec, intra_order: list[Column],
                  value: str, out: str = "cum",
                  band_desc: bool = False) -> DataFrame:
    """Exact running ``sum(value)`` along the global order
    ``(*band levels, *intra_order)`` — inclusive of the current row —
    without a single-partition window over the data.

    ``band`` is either a single column name (ordered by ``band_desc``)
    or a list of HIERARCHICAL levels ``[name | (name, desc), ...]``,
    coarsest first, each a column of ``df``. Multi-level banding is the
    answer when one level cannot be both order-consistent and balanced:
    a Zipf vocabulary banded by ⌊log₂ count⌋ funnels roughly half of
    all types through the count=1 band's single window partition
    (round-5 advice), but (⌊log₂ c⌋ DESC, c DESC, first-char-of-token
    ASC) splits that hapax band ~alphabet-ways while staying monotone
    along (c DESC, token ASC). Exactness contract: the CONCATENATION of
    all band levels plus ``intra_order`` must equal the requested global
    order (each level constant-or-refining along it).

    Per-band offsets come from recursing on the band summary with the
    coarser prefix of levels as the band — so the only single-partition
    window anywhere runs over the TOP-level summary (cardinality =
    coarsest band count, ~dozens), never over the data and never over a
    fine summary. The offset join-back carries no broadcast hint beyond
    the single-level form: a fine composite summary can reach ~10⁸ rows
    on a web-scale vocabulary, where AQE's runtime-stats broadcast (or
    sort-merge) is the right call; the single-level form keeps the hint
    because its cardinality is bounded by contract.

    ``value``/``out`` also accept a list of ``(value_col, out_name)``
    pairs computing SEVERAL prefix sums along the same order in ONE
    summary/offset/window pass (``out`` is ignored then) — a rank
    (sum of ones) and a running mass share every shuffle instead of
    duplicating the whole decomposition.

    Adds the ``out`` column(s); preserves all others.
    """
    pairs = [(value, out)] if isinstance(value, str) else list(value)
    levels = _band_levels(band, band_desc)
    names = [n for n, _ in levels]
    masses = [f"_mass_{i}" for i in range(len(pairs))]
    offs = [f"_off_{i}" for i in range(len(pairs))]
    summary = df.groupBy(*names).agg(
        *[F.sum(F.col(v)).alias(m) for (v, _), m in zip(pairs, masses)])
    if len(levels) == 1:
        (n0, d0) = levels[0]
        w_bands = (Window.orderBy(F.col(n0).desc() if d0 else F.col(n0).asc())
                   .rowsBetween(Window.unboundedPreceding, -1))
        offsets = summary.select(
            n0, *[F.coalesce(F.sum(m).over(w_bands), F.lit(0)).alias(o)
                  for m, o in zip(masses, offs)])
        offsets = F.broadcast(offsets)
    else:
        last_n, last_d = levels[-1]
        last_order = [F.col(last_n).desc() if last_d
                      else F.col(last_n).asc()]
        cum = banded_cumsum(summary, levels[:-1], last_order,
                            [(m, f"_cum_{i}")
                             for i, m in enumerate(masses)])
        # exclusive offset of each finest band = inclusive cum − own mass
        offsets = cum.select(*names,
                             *[(F.col(f"_cum_{i}") - F.col(m)).alias(o)
                               for i, (m, o) in enumerate(zip(masses,
                                                              offs))])
    w_intra = (Window.partitionBy(*names).orderBy(*intra_order)
               .rowsBetween(Window.unboundedPreceding, 0))
    res = df.join(offsets, names)
    for (v, o_name), o in zip(pairs, offs):
        res = res.withColumn(o_name,
                             F.col(o) + F.sum(F.col(v)).over(w_intra))
    return res.drop(*offs)


def banded_prefix_max(df: DataFrame, band: str, intra_order: list[Column],
                      value: str, out: str = "prev_max",
                      band_desc: bool = False) -> DataFrame:
    """Exact running ``max(value)`` over the rows STRICTLY PRECEDING each
    row in the global order ``(band ASC|DESC, *intra_order)`` (exclusive
    prefix — the row's own value is not included; NULL for the first
    row). Same banding contract as :func:`banded_cumsum`'s single-level
    form (a bounded-cardinality band column name; the hierarchical
    list-of-levels spec is cumsum-only until a consumer needs it here).
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
