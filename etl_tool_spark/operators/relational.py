"""Relational operators Spark lacks as primitives — composed from
DataFrame ops, no UDFs.

as-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key group. The classic backfill/
point-in-time join (market data, feature stores). The reference has no
joins at all (playbook_development_guide.md:461); Spark has no ASOF
primitive; DuckDB does (the oracle uses it).

Implementation: the union-window ("piggyback") formulation —
  union(left tagged, right tagged)
  → window per key ordered by (ts, right-before-left)
  → last(right payload, ignorenulls) over rows unbounded-preceding
  → keep left rows.
ONE shuffle on the key (same cost as the groupBy both inputs already
need), no range-explosion, no per-key collect — at 100 TB this beats the
broadcast-and-filter or theta-join formulations by orders of magnitude
because state per key is a single running value."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "banded_range_join", "interval_overlap_join"]


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload_cols: list[str] | None = None,
              suffix: str = "_right", inclusive: bool = True,
              tolerance: str | int | float | None = None,
              direction: str = "backward") -> DataFrame:
    """Left as-of join. ``payload_cols`` are the right-side columns carried
    onto matching left rows (null when no prior right row exists).

    ``direction`` (pandas merge_asof semantics): "backward" matches the
    most recent right row at-or-before each left row; "forward" the
    earliest at-or-after. Both are the same union-window plan — forward
    just flips the frame (first over following) and the tie rule.
    "nearest" picks whichever side is closer (ties → backward, pandas
    rule); it composes the two single-pass joins, so it costs a second
    union-window shuffle — the one direction that can't share a frame
    ordering without shadowing under exclusive ties.

    ``tolerance`` bounds staleness (the kdb ``aj`` / pandas merge_asof
    tolerance): a match older than the bound is treated as no match
    (payloads null). Pass an interval string ("1 hour") for timestamp
    axes or a number for numeric axes. Computed from the SAME running
    window state — no extra shuffle.

    Ties: if several right rows share (key, ts), the one latest in the
    window order wins — make the right side unique per (key, ts) first if
    you need a deterministic contract (the catalog query does)."""
    payload_cols = payload_cols or [c for c in right.columns
                                    if c not in on and c != right_ts]

    lt = left.withColumn("_asof_ts", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    for c in payload_cols:
        lt = lt.withColumn(f"_p_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    lt = lt.withColumn("_p__rts",
                       F.lit(None).cast(dict(right.dtypes)[right_ts]))
    rt = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(right_ts).alias("_p__rts"))
    left_only_cols = [c for c in lt.columns if c not in rt.columns]
    rt = rt.select("*", *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(c)
                          for c in left_only_cols])

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts,
                             payload_cols, suffix, inclusive, tolerance)
    backward = direction == "backward"

    unioned = lt.unionByName(rt)
    # backward: right rows sort before left rows at equal ts when
    # inclusive (so right.ts == left.ts is inside the preceding frame),
    # after them when exclusive. forward mirrors both rules.
    if backward == inclusive:
        tie = F.col("_is_left").asc()
    else:
        tie = F.col("_is_left").desc()
    if backward:
        w = (Window.partitionBy(*on).orderBy(F.col("_asof_ts").asc(), tie)
                   .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last
    else:
        w = (Window.partitionBy(*on).orderBy(F.col("_asof_ts").asc(), tie)
                   .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first
    filled = unioned.select(
        "*",
        *[pick(f"_p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in payload_cols],
        pick("_p__rts", ignorenulls=True).over(w).alias("_matched_rts"))
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        tol = (F.expr(f"INTERVAL {tolerance}")
               if isinstance(tolerance, str) else F.lit(tolerance))
        if backward:
            fresh = F.col("_matched_rts").isNotNull() \
                & (F.col("_matched_rts") >= F.col(left_ts) - tol)
        else:
            fresh = F.col("_matched_rts").isNotNull() \
                & (F.col("_matched_rts") <= F.col(left_ts) + tol)
        out = out.select(
            *[c for c in out.columns
              if not any(c == f"{p}{suffix}" for p in payload_cols)],
            *[F.when(fresh, F.col(f"{p}{suffix}"))
               .alias(f"{p}{suffix}") for p in payload_cols])
    drop = ["_asof_ts", "_is_left", "_matched_rts"] \
        + [f"_p_{c}" for c in payload_cols] + ["_p__rts"]
    return out.drop(*drop)


def _asof_nearest(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_ts: str, payload_cols: list[str],
                  suffix: str, inclusive: bool,
                  tolerance) -> DataFrame:
    """nearest = closer of the backward and forward matches (ties →
    backward, pandas rule). Runs both single-pass joins with the
    matched timestamps carried, then selects per row."""
    rts = right.withColumn("_nrts", F.col(right_ts))
    pays = payload_cols + ["_nrts"]
    b = asof_join(left, rts, on, left_ts, right_ts, pays, "_b",
                  inclusive=inclusive, tolerance=tolerance,
                  direction="backward")
    f = asof_join(b, rts, on, left_ts, right_ts, pays, "_f",
                  inclusive=inclusive, tolerance=tolerance,
                  direction="forward")
    bd = F.col(left_ts) - F.col("_nrts_b")
    fd = F.col("_nrts_f") - F.col(left_ts)
    use_b = F.col("_nrts_b").isNotNull() \
        & (F.col("_nrts_f").isNull() | (bd <= fd))
    out = f.select(
        *[c for c in left.columns],
        *[F.when(use_b, F.col(f"{p}_b")).otherwise(F.col(f"{p}_f"))
           .alias(f"{p}{suffix}") for p in payload_cols])
    return out


def banded_range_join(points: DataFrame, ranges: DataFrame,
                      point_col: str, lo_col: str, hi_col: str,
                      band_size: int) -> DataFrame:
    """Interval-containment join (point BETWEEN lo AND hi) WITHOUT an
    equi key — the IP-to-geo / value-to-tier enrichment shape. Naive
    Spark plans a pure range predicate as BroadcastNestedLoop (or a
    cartesian when neither side broadcasts): every point × every range.

    The scale formulation bands the axis: points key on
    ``floor(point / band_size)``; each range explodes into one row per
    band it overlaps (``(hi - lo) / band_size + 1`` rows); candidates
    come from a plain equi-join on the band and the exact BETWEEN
    residual filters them. Pick ``band_size`` near the typical range
    width: the explode factor stays ~2 and each point meets only the
    ranges sharing its band — shuffle + join cost is linear in rows,
    never |points| × |ranges|.

    Column names must not overlap between the two frames (rename
    first); returns points' columns + ranges' columns for matches."""
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(
            f"banded_range_join: overlapping column names {sorted(overlap)}; "
            "rename one side first")
    if "_band" in points.columns or "_band" in ranges.columns:
        raise ValueError("banded_range_join: '_band' is reserved; rename "
                         "that column first")
    if band_size <= 0:
        raise ValueError("band_size must be positive")
    p = points.withColumn(
        "_band", F.floor(F.col(point_col) / F.lit(band_size)))
    r = ranges.withColumn(
        "_band", F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(band_size)),
            F.floor(F.col(hi_col) / F.lit(band_size)))))
    return (p.join(r, "_band")
             .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
             .drop("_band"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                          band_size: int) -> DataFrame:
    """Interval × interval OVERLAP join (closed intervals:
    ``l_lo <= r_hi AND r_lo <= l_hi``) without an equi key — the
    session-overlap / reservation-conflict / timeline-intersection
    shape. Naive Spark plans the pure theta predicate as a nested-loop
    over every pair.

    The scale formulation bands the shared axis on BOTH sides: each
    interval explodes into one row per band it covers, candidates come
    from the plain band equi-join, and the exact overlap predicate
    filters residuals. A pair overlapping k shared bands would surface
    k times, so instead of a distinct over the full output each pair is
    emitted only in its CANONICAL band — the band containing the
    overlap's start, ``floor(greatest(l_lo, r_lo) / band_size)``, which
    both sides necessarily cover. Pick ``band_size`` near the typical
    interval width: the explode factor stays ~2 and cost is linear in
    rows + true matches, never |left| × |right|.

    Column names must not overlap between the frames (rename first);
    returns left's columns + right's columns for overlapping pairs."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"interval_overlap_join: overlapping column names "
            f"{sorted(overlap)}; rename one side first")
    if "_band" in left.columns or "_band" in right.columns:
        raise ValueError("interval_overlap_join: '_band' is reserved; "
                         "rename that column first")
    if band_size <= 0:
        raise ValueError("band_size must be positive")

    def _banded(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_band", F.explode(F.sequence(
                F.floor(F.col(lo) / F.lit(band_size)),
                F.floor(F.col(hi) / F.lit(band_size)))))

    canon = F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / F.lit(band_size))
    return (_banded(left, l_lo, l_hi).join(_banded(right, r_lo, r_hi),
                                           "_band")
            .filter((F.col(l_lo) <= F.col(r_hi))
                    & (F.col(r_lo) <= F.col(l_hi))
                    & (F.col("_band") == canon))
            .drop("_band"))
