"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for stateful logic the built-in operators can't express
(the reference has no streaming at all; Spark's built-ins cover windows/
dedup — this covers arbitrary per-key state machines).

Example operator: per-user running anomaly tracker — keeps (count, mean)
state per user and emits one row per batch with the user's cumulative
stats and how many events in the batch exceeded ``threshold``× the mean
seen so far. State is a tiny fixed-width tuple, so the state store stays
bounded by the key cardinality; GroupStateTimeout can evict idle users.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("n_anomalies", T.LongType()),
])


def running_anomaly_tracker(events: DataFrame, threshold: float = 3.0,
                            watermark: str = "2 hours") -> DataFrame:
    """Stateful per-user tracker (see module docstring). ``events`` must
    be a streaming frame with (user_id, ts, value)."""

    def track(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        anomalies = 0
        for pdf in pdfs:
            for v in pdf["value"]:
                v = float(v)
                mean = total / n if n else None
                if mean is not None and v > threshold * mean:
                    anomalies += 1
                n += 1
                total += v
        state.update((n, total))
        yield pd.DataFrame([{
            "user_id": user_id,
            "n_events": n,
            "mean_value": (total / n) if n else None,
            "n_anomalies": anomalies,
        }])

    return (events.withWatermark("ts", watermark)
                  .groupBy("user_id")
                  .applyInPandasWithState(
                      track,
                      outputStructType=OUTPUT_SCHEMA,
                      stateStructType=STATE_SCHEMA,
                      outputMode="update",
                      timeoutConf=GroupStateTimeout.NoTimeout))


TWS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
])


def has_tws_runtime() -> bool:
    """transformWithStateInPandas serializes state through the Python
    ``protobuf`` runtime; without it the query fails at START (not at
    plan time), so the capability must be probed up front."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_counts_fallback(events: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """``running_counts_tws``'s exact output contract on
    ``applyInPandasWithState`` — no protobuf / no RocksDB requirement.
    Same state (n, total) and same per-batch emission."""
    def stats(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame([{
            "user_id": key[0],
            "n_events": n,
            "mean_value": (total / n) if n else None,
        }])

    return (events.withWatermark("ts", watermark)
                  .groupBy("user_id")
                  .applyInPandasWithState(stats, TWS_OUTPUT_SCHEMA,
                                          STATE_SCHEMA, "update",
                                          GroupStateTimeout.NoTimeout))


def running_counts_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Same running per-user stats on the Spark 4 ``transformWithState``
    API (StatefulProcessor): typed ValueState instead of a raw tuple,
    per-key timers available for TTL/eviction. Preferred over
    applyInPandasWithState going forward; both kept for comparison.

    Runtime requirements beyond this container: the Python ``protobuf``
    package (state serialization) and the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider``).
    Where protobuf is absent this DEGRADES (with a log line) to
    ``running_counts_fallback`` — identical output contract, the
    applyInPandasWithState runtime — instead of failing at query start."""
    if not has_tws_runtime():
        import logging

        logging.getLogger("etl_tool_spark.streaming").warning(
            "transformWithState runtime unavailable (python protobuf "
            "missing); falling back to applyInPandasWithState")
        return running_counts_fallback(events, watermark)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame([{
                "user_id": key[0],
                "n_events": n,
                "mean_value": (total / n) if n else None,
            }])

        def close(self) -> None:
            pass

    return (events.withWatermark("ts", watermark)
                  .groupBy("user_id")
                  .transformWithStateInPandas(
                      RunningStats(),
                      outputStructType=TWS_OUTPUT_SCHEMA,
                      outputMode="Update",
                      timeMode="None"))


CAP_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])

CAP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def rate_cap_stream(events: DataFrame, cap: int = 2,
                    watermark: str = "1 day") -> DataFrame:
    """Streaming per-key rate cap — the real-time twin of the batch
    events_per_key_cap query: at most ``cap`` events per (user, day)
    pass through, first-arrived wins (within a micro-batch ties order
    by ts then event_id, matching the batch window). State per group is
    ONE counter, EVICTED by event-time timeout once the watermark passes
    the group's day plus the watermark delay — without the timeout every
    (user, day) counter would live for the stream's lifetime and the
    state store would grow by active-users rows per day, forever. The
    ingestion-throttling primitive for budgeted landing zones."""
    import datetime

    import pandas as pd  # noqa: F811 (executor-side import parity)
    from pyspark.sql import functions as F

    def capper(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # the watermark passed this day's eviction horizon: no more
            # rows can arrive for it (they'd be late beyond the
            # watermark), so the counter is dead — drop it
            state.remove()
            return
        user_id, day = key
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        take = max(0, cap - n)
        kept = batch.head(take)
        state.update((n + len(kept),))
        # evict when the watermark clears day-end + one extra day of
        # late-arrival slack (>= the 1-day default watermark delay); the
        # timestamp must sit above the CURRENT watermark or Spark rejects it
        day_end_ms = int(day.replace(tzinfo=datetime.timezone.utc)
                         .timestamp() * 1000) + 2 * 86_400_000
        state.setTimeoutTimestamp(max(day_end_ms,
                                      state.getCurrentWatermarkMs() + 60_000))
        if len(kept):
            yield pd.DataFrame({
                "user_id": kept["user_id"],
                "event_id": kept["event_id"],
                "ts": kept["ts"],
            })

    return (events.withWatermark("ts", watermark)
                  .withColumn("_day", F.date_trunc("day", F.col("ts")))
                  .groupBy("user_id", "_day")
                  .applyInPandasWithState(
                      capper,
                      outputStructType=CAP_OUTPUT_SCHEMA,
                      stateStructType=CAP_STATE_SCHEMA,
                      outputMode="append",
                      timeoutConf=GroupStateTimeout.EventTimeTimeout))
