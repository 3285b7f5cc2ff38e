"""Event-stream operators: watermarked windows, session windows, stateful
dedup — the Structured Streaming counterpart of the batch queries in
catalog.py (events_window_agg / events_sessionize).

Design for scale: each operator is a pure readStream→transform pipeline;
state lives in the Spark state store keyed by (window, event_type) or
user_id, so a 1000-executor cluster shards state by key. Watermarks bound
state size — late events past the watermark are dropped per policy, which
is the knob the reference never had (it is batch-only,
playbook_development_guide.md:460).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_unit: str) -> T.StructType:
    # nanos parquet needs the long bridge (catalog._events); micros reads
    # directly as a naive timestamp
    ts_type = T.LongType() if ts_unit == "ns" else T.TimestampNTZType()
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])


def _ts_unit(events_path: str) -> str:
    """Physical unit of the ts column ('ns'/'us'/'ms') from the parquet
    footer — the driver's generator has shipped both nanos and micros."""
    import glob
    import os

    import pyarrow.parquet as pq

    f = events_path
    if os.path.isdir(events_path):
        f = sorted(glob.glob(os.path.join(events_path, "*.parquet")))[0]
    t = pq.read_schema(f).field("ts").type
    return getattr(t, "unit", "us")


def read_events_stream(spark: SparkSession, events_path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet; ts is normalized to a
    micro-precision timestamp whatever the file's physical unit, matching
    the batch reader. ``events_path`` may be a directory or a single file
    (the file source requires a directory, so a file path becomes
    parent-dir + glob filter)."""
    import os

    unit = _ts_unit(events_path)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_events_schema(unit))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    df = reader.parquet(events_path)
    if unit == "ns":
        # integer `div`: double division loses precision above 2^53 nanos
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) watermarked counts per
    event_type. Late events beyond ``watermark`` are dropped and the
    window's state is evicted once the watermark passes its end."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (events.withWatermark("ts", watermark)
                  .groupBy(win.alias("w"), "event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.round(F.sum("value"), 2).alias("total_value"))
                  .select(F.col("w.start").alias("window_start"),
                          F.col("w.end").alias("window_end"),
                          "event_type", "n", "total_value"))


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Session windows with a 30-minute inactivity gap — the streaming
    twin of catalog.events_sessionize. State per (user_id, open session);
    sessions merge as events arrive and close when the watermark passes
    session end + gap."""
    return (events.withWatermark("ts", watermark)
                  .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.round(F.sum("value"), 2).alias("total_value"))
                  .select("user_id",
                          F.col("s.start").alias("session_start"),
                          F.col("s.end").alias("session_end"),
                          "n_events", "total_value"))


def streaming_dedup(events: DataFrame, keys: list[str] | None = None,
                    watermark: str = "2 hours",
                    within_watermark: bool = True) -> DataFrame:
    """Stateful exact dedup on the stream. ``dropDuplicatesWithinWatermark``
    bounds state by the watermark horizon (unbounded key sets would
    otherwise OOM the state store at 100 TB/day rates)."""
    keys = keys or ["event_id"]
    wm = events.withWatermark("ts", watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys + ["ts"])


def interval_join_streams(left: DataFrame, right: DataFrame,
                          key: str = "user_id", window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each left event pairs with the right
    events of the same key whose timestamp falls in
    [left.ts - window, left.ts]. Both sides are watermarked and the
    range condition is what lets Spark garbage-collect join state — a
    right event can be dropped once the watermark passes its ts + window
    (without the bound, both state stores grow forever). The per-key
    state shards across executors exactly like the batch shuffle would.

    Output columns: key, l_id/l_ts/l_value, r_id/r_ts/r_value."""
    l = (left.select(F.col(key),
                     F.col("event_id").alias("l_id"),
                     F.col("ts").alias("l_ts"),
                     F.col("value").alias("l_value"))
             .withWatermark("l_ts", watermark))
    r = (right.select(F.col(key).alias("_rkey"),
                      F.col("event_id").alias("r_id"),
                      F.col("ts").alias("r_ts"),
                      F.col("value").alias("r_value"))
              .withWatermark("r_ts", watermark))
    cond = ((F.col(key) == F.col("_rkey"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window}"))
            & (F.col("r_ts") <= F.col("l_ts")))
    return l.join(r, cond, "inner").drop("_rkey")


def stream_foreach_batch(stream: DataFrame, sink_fn, checkpoint: str,
                         output_mode: str = "update"):
    """Micro-batch sink bridge: each batch is a normal DataFrame handed to
    ``sink_fn(batch_df, batch_id)`` — the route to JDBC/custom sinks with
    no native streaming writer (the streaming twin of the batch custom-DML
    loader). Exactly-once hinges on the checkpoint + an idempotent or
    transactional sink_fn keyed by batch_id."""
    q = (stream.writeStream.foreachBatch(sink_fn)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_to_memory(stream: DataFrame, name: str, output_mode: str = "append"):
    """Run a streaming frame to completion against the current files with
    the availableNow trigger and a memory sink — the test/CI harness path
    (a real deployment writes .format('parquet'/'kafka') + checkpoint)."""
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
