"""Skew-mitigation primitives for hot keys at scale.

Two standard levers, exposed as composable helpers (AQE's skew-join
handling covers sort-merge joins automatically; these cover aggregations
and broadcast-averse joins):

  * salted_agg — two-phase aggregation: explode each hot key into
    ``salt`` sub-keys (map-side random-ish salt derived from a stable row
    expression, so it stays deterministic), partial-aggregate on
    (key, salt), then final-aggregate on key. The first shuffle spreads a
    hot key over ``salt`` reducers instead of one.
  * salted_join — replicate the SMALL side ``salt`` times (salt column
    0..salt-1) and salt the big side's key the same deterministic way, so
    a hot join key fans out over ``salt`` reducers.

Correctness: both are algebraic rewrites — results equal the unsalted
form for the supported aggregates (sum/count/min/max; avg via sum+count).
The catalog exercises salted_agg against the plain-groupBy oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "gated_broadcast",
           "verify_spread", "BROADCAST_ROW_GATE"]

#: Max rows a frame may have and still get a broadcast hint from
#: gated_broadcast. Sized for narrow (two-long) rows: ~32 bytes of
#: UnsafeRow each → ~100 MB broadcast at the gate, well inside normal
#: executor headroom but far above autoBroadcastJoinThreshold (hinted
#: broadcasts bypass that threshold, which is exactly why they need a
#: gate).
BROADCAST_ROW_GATE = 3_000_000


def gated_broadcast(df: DataFrame, row_gate: int | None = None) -> DataFrame:
    """``broadcast(df)`` only when ``df`` is small enough to broadcast
    safely; otherwise the frame unchanged (letting the planner take a
    sort-merge join, with AQE free to re-decide from runtime stats).

    An UNgated broadcast hint on a frame whose size scales with the
    data is an executor/driver OOM at 100 TB, not a slow plan — the hint
    bypasses autoBroadcastJoinThreshold entirely. The gate costs one
    ``count()`` job; call this only on frames that are already
    materialized (checkpointed/cached), where the count is a cheap
    cached-block scan rather than a recompute."""
    gate = BROADCAST_ROW_GATE if row_gate is None else row_gate
    return F.broadcast(df) if df.count() <= gate else df


def verify_spread(df: DataFrame) -> DataFrame:
    """Pin a candidate-pair verify stage's parallelism COUNT-based, not
    byte-based. Candidate streams are narrow (two ids per row — a few
    bytes), so AQE coalesces the upstream distinct's shuffle by its ~MB
    byte size and funnels millions of per-row INTERPRETED evaluations
    (HOF dot products, array_intersect over gram arrays) onto 2-8
    tasks; measured swings of 5s ↔ 80s run-to-run came purely from
    AQE's partition pick. An explicit ``repartition(n)`` is exempt from
    AQE coalescing and restores cores-wide parallelism on any cluster.

    The extra full shuffle is wasted on a tiny/empty candidate set
    (e.g. incremental runs with few new rows) where AQE coalescing was
    the right answer — so it is a knob: set session conf
    ``spark.etl_tool_spark.verifySpread=false`` to skip it (estimating
    the candidate count up front would itself cost a job, which is why
    this is a conf and not a gate)."""
    spark = df.sparkSession
    if spark.conf.get("spark.etl_tool_spark.verifySpread",
                      "true").lower() == "false":
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)

# aggregates that re-combine losslessly: name -> (partial fn, final fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt in [0, salt): a cheap hash of all
    columns. Deterministic (not rand()) so retried tasks and resumed
    stages produce identical partitions."""
    return F.pmod(F.hash(*[F.col(f"`{c}`") for c in df.columns]), F.lit(salt))


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]],
               salt: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (agg_name, column), agg_name in
    {sum, count, min, max}. Example::

        salted_agg(li, ["l_returnflag"], {"qty": ("sum", "l_quantity")})
    """
    for name, (agg_name, _) in aggs.items():
        if agg_name not in _MERGEABLE:
            raise ValueError(f"{name}: aggregate {agg_name!r} is not mergeable "
                             f"(supported: {sorted(_MERGEABLE)})")
    salted = df.withColumn("_salt", _salt_col(df, salt))
    partial = (salted.groupBy(*keys, "_salt")
                     .agg(*[_MERGEABLE[a][0](c).alias(f"_p_{name}")
                            for name, (a, c) in aggs.items()]))
    final = (partial.groupBy(*keys)
                    .agg(*[_MERGEABLE[a][1](f"_p_{name}").alias(name)
                           for name, (a, c) in aggs.items()]))
    return final


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: the small side is replicated ``salt`` times
    (one copy per salt value) and the big side's rows are salted
    deterministically, so each (key, salt) bucket holds 1/salt of a hot
    key. Use when the small side is too big to broadcast but hot keys
    overwhelm single reducers. Cost: small side ×salt."""
    salts = small.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
    small_rep = small.crossJoin(salts)
    big_salted = big.withColumn("_salt", _salt_col(big, salt))
    out = big_salted.join(small_rep, [on, "_salt"], how)
    return out.drop("_salt")
