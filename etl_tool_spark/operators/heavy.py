"""Exact distributed top-k heavy hitters with bounded shuffle.

The naive plan — ``groupBy(key).count().orderBy(desc).limit(k)`` —
partially aggregates map-side, but still shuffles one row per DISTINCT
key. For heavy-hitter questions over high-cardinality keys (URLs,
n-grams, user ids at 100 TB: billions of distinct keys to rank a
top-100) that shuffle IS the job. This module bounds it: the shuffled
candidate volume is ``numPartitions × m`` rows regardless of key
cardinality, at the cost of a second (filtered, broadcast-pruned) pass
for exact counts.

Algorithm (two passes, both map-heavy):

1. **Candidate generation** — one Misra-Gries summary of at most ``m``
   counters per input partition (Misra & Gries 1982), built streamwise
   over the partition's Arrow batches with the merge-then-truncate rule
   of Agarwal et al., "Mergeable Summaries" (PODS 2012): add the batch's
   exact counts into the summary, and while more than ``m`` counters
   survive, subtract the (m+1)-th largest residual from all and drop the
   non-positives. Invariant: a key with true partition count
   ``> n_p/(m+1)`` keeps a positive residual, so by the averaging
   argument any key with GLOBAL count ``> n/(m+1)`` appears in at least
   one partition's summary. Each partition emits ONE row
   (candidate-key array + its row count) — the only data that crosses
   the wire from pass 1.
2. **Exact recount** — the raw rows are semi-joined (broadcast — the
   candidate set is ≤ partitions × m keys) and counted; only candidate
   keys enter the aggregation, so the second shuffle is bounded too.
3. **Exactness gate** — a ONE-ROW in-plan verdict (same shape as
   trigram_join's collision gate): the returned top-k is provably the
   true top-k iff k candidates survived and the k-th count strictly
   exceeds ``n/(m+1)`` (every non-candidate key is ≤ that bound, so
   none can outrank — or tie and displace — the k-th). Otherwise the
   plan raises with the remedy (increase ``m``) instead of returning a
   silently-approximate answer. ``raise_error`` rides a broadcast
   scalar, never the row-wise hot path.

Output counts are EXACT (pass 2 recounts from the raw rows; the lossy
MG residuals are used only for candidacy), so unlike the HLL/KLL/theta
stores in sketches.py this operator is value-hash oracle-bindable.

Determinism: the candidate SET may vary with input partitioning, but
the gated result cannot — any candidate superset that passes the gate
yields the same exact top-k (count desc, key asc tiebreak).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["top_k_heavy_hitters"]


def _mg_summaries(key: str, m: int):
    """mapInPandas partition function: one (keys array, np) row per
    partition — ≤ m candidate keys plus the partition's non-null row
    count (summed downstream into the gate's n without a third scan)."""

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            col = pdf[key].dropna()
            n_p += len(col)
            for val, c in col.value_counts().items():
                counters[val] = counters.get(val, 0) + int(c)
            if len(counters) > m:
                # merge-then-truncate (PODS'12): one sort of ≤ m+batch
                # counters per batch, O(m) memory for the whole pass.
                vals = sorted(counters.values(), reverse=True)
                delta = vals[m]
                counters = {k: v - delta for k, v in counters.items()
                            if v - delta > 0}
        yield pd.DataFrame({"keys": [list(counters.keys())], "np": [n_p]})

    return f


def _scan_partition_bound(df: DataFrame) -> int | None:
    """A provable UPPER bound on the plan's source partition count, or
    ``None`` when no cheap proof exists.

    For scan-free plans (in-memory frames, shuffle outputs) the bound is
    the session's parallelism knobs. For file scans, each file yields at
    most ``ceil(size / minSplit) + 1`` read splits, where ``minSplit =
    min(maxPartitionBytes, openCostInBytes)`` is the smallest split size
    Spark's ``maxSplitBytes`` formula can pick — ``len(inputFiles())``
    alone is NOT a bound (one large file splits into hundreds of 128 MB
    pieces; round-7 advisor finding). Sizes are statted for ``file:``
    URIs only; remote filesystems return ``None`` and the caller falls
    back to a counted gate."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        return None  # scan metadata unavailable: nothing is provable
    if not files:
        conf_bounds = [spark.sparkContext.defaultParallelism]
        try:
            # "auto" on AQE-managed clusters is not an int — just skip it
            conf_bounds.append(int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")))
        except ValueError:
            pass
        return max(conf_bounds)
    import os
    from urllib.parse import unquote, urlparse
    try:
        max_part = int(spark.conf.get("spark.sql.files.maxPartitionBytes",
                                      str(128 * 1024 * 1024)))
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes",
                                       str(4 * 1024 * 1024)))
    except ValueError:
        return None
    min_split = max(1, min(max_part, open_cost))
    splits = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return None  # remote URI: can't stat cheaply from the driver
        try:
            size = os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
        splits += size // min_split + 1
    return splits


def top_k_heavy_hitters(df: DataFrame, key: str, k: int,
                        m: int = 4096) -> DataFrame:
    """Exact top-``k`` most frequent non-null values of ``key`` (count
    desc, key asc), shuffling at most ``numPartitions × m`` candidate
    rows instead of one row per distinct key. Raises IN-PLAN if ``m``
    was too small to prove exactness (k-th count ≤ n/(m+1), or fewer
    than k candidates) — callers size ``m`` above n divided by the
    expected k-th heavy hitter's count."""
    if k < 1:
        raise ValueError(f"top_k_heavy_hitters: k must be >= 1, got {k}")
    if m < k:
        raise ValueError(
            f"top_k_heavy_hitters: m ({m}) must be >= k ({k}) — a summary "
            f"narrower than the answer cannot certify it")
    key_type = df.schema[key].dataType
    out_schema = T.StructType([
        T.StructField("keys", T.ArrayType(key_type)),
        T.StructField("np", T.LongType()),
    ])
    # lazily checkpointed: the P-row summary feeds both the candidate
    # explode and the gate's n — without truncation each action would
    # re-run the full MG scan twice.
    summ = (df.select(key)
              .mapInPandas(_mg_summaries(key, m), schema=out_schema)
              .localCheckpoint(eager=False))
    cand = summ.select(F.explode("keys").alias(key)).distinct()
    # Candidate volume is bounded by partitions × m. When that STATIC
    # bound fits the broadcast gate, hint for free; past it, pay one
    # eager count of the (materialized-by-then) summary to decide —
    # an ungated hint on a data-dependent frame is an OOM at scale,
    # not a slow plan (operators/skew.py). If even the true candidate
    # count is too big, the join degrades to sort-merge: correct, and
    # no worse than the baseline full-key shuffle this operator exists
    # to avoid in the common case.
    from etl_tool_spark.operators.skew import (BROADCAST_ROW_GATE,
                                               gated_broadcast)
    # The free-hint path is taken only when a TRUE upper bound on the
    # scan's partition count is provable (confs + statted file sizes,
    # never df.rdd.getNumPartitions(), which converts the whole plan to
    # an RDD just to read a number). Anything unprovable — remote URIs,
    # scan metadata errors — routes through gated_broadcast, which pays
    # one eager count of the (lazily-checkpointed, materialized-by-then)
    # summary: an over-cautious bound costs a job; an undercount would
    # cost the ungated-broadcast driver OOM this gate exists to prevent.
    static_bound = _scan_partition_bound(df)
    # /8 margin: bin-packing slack and conf races still deserve headroom
    # even on a provable bound.
    cand = (F.broadcast(cand)
            if static_bound is not None
            and static_bound * m <= BROADCAST_ROW_GATE // 8
            else gated_broadcast(cand))
    topk = (df.select(key)
              .where(F.col(key).isNotNull())
              .join(cand, key)
              .groupBy(key)
              .agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.col("cnt").desc(), F.col(key).asc())
              .limit(k)
              .localCheckpoint(eager=False))  # k rows, read twice below
    gate = (topk.agg(F.count(F.lit(1)).alias("_rows"),
                     F.min("cnt").alias("_kth"))
                .crossJoin(summ.agg(F.sum("np").alias("_n")))
                .select(
                    F.when(F.col("_rows") < k, F.raise_error(F.lit(
                        f"top_k_heavy_hitters: fewer than k={k} candidate "
                        f"keys survived the m={m} summaries; increase m")))
                     .when(F.col("_kth") * (m + 1) <= F.col("_n"),
                           F.raise_error(F.lit(
                        f"top_k_heavy_hitters: k-th count <= n/(m+1) with "
                        f"m={m} — a non-candidate key could outrank or tie "
                        f"it; increase m")))
                     .otherwise(F.lit(1)).alias("_gate"))
                .localCheckpoint(eager=False))
    # filtered (not dropped) so column pruning cannot elide the gate
    return (topk.crossJoin(F.broadcast(gate))
                .where(F.col("_gate") == 1)
                .drop("_gate"))
