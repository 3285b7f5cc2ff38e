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
