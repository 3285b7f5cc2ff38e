"""Structured Streaming tests: stream the events parquet with the
availableNow trigger into memory sinks and cross-check against the batch
formulations."""

import pytest
from pyspark.sql import functions as F

from etl_tool_spark.streaming import (  # noqa: F401
    read_events_stream,
    sessionize_stream,
    stream_to_memory,
    streaming_dedup,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, f"{SF_DIR}/events.parquet")


def test_windowed_counts_match_batch(spark, events_stream):
    stream_to_memory(windowed_counts(events_stream), "wc", output_mode="complete")
    streamed = spark.sql("SELECT window_start, event_type, n FROM wc").collect()

    from etl_tool_spark.catalog import _events

    batch = (_events(spark, SF_DIR)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.col("w.start").alias("window_start"), "event_type", "n")
             .collect())
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


def test_sessionize_stream_runs(spark, events_stream):
    stream_to_memory(sessionize_stream(events_stream), "sess", output_mode="complete")
    rows = spark.sql("SELECT * FROM sess").collect()
    assert len(rows) > 0
    # session windows are per-user and non-overlapping
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_streaming_dedup(spark, events_stream):
    stream_to_memory(streaming_dedup(events_stream, keys=["user_id"]), "dd")
    n_users = spark.sql("SELECT count(*) AS n FROM dd").collect()[0]["n"]
    from etl_tool_spark.catalog import _events

    n_distinct = _events(spark, SF_DIR).select("user_id").distinct().count()
    assert n_users == n_distinct


def test_foreach_batch_sink(spark, events_stream, tmp_path):
    """foreachBatch drives a batch sink (parquet here; JDBC in prod) with
    checkpointed progress."""
    out = str(tmp_path / "fb_out")
    from etl_tool_spark.streaming.events import stream_foreach_batch
    from etl_tool_spark.streaming import windowed_counts

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    stream_foreach_batch(windowed_counts(events_stream), sink,
                         checkpoint=str(tmp_path / "ckpt"))
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert set(written.columns) == {"window_start", "window_end", "event_type",
                                    "n", "total_value"}


def test_stateful_anomaly_tracker(spark, events_stream, tmp_path):
    """applyInPandasWithState custom stateful operator: cumulative per-user
    stats match the batch equivalent."""
    from etl_tool_spark.streaming.stateful import running_anomaly_tracker

    out = running_anomaly_tracker(events_stream.select("user_id", "ts", "value"))
    q = (out.writeStream.format("memory").queryName("anom")
         .outputMode("update").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], round(r["mean_value"], 6))
           for r in spark.sql("SELECT * FROM anom").collect()}

    from etl_tool_spark.catalog import _events

    batch = {r["user_id"]: (r["n"], round(r["m"], 6)) for r in
             _events(spark, SF_DIR).groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"))
             .collect()}
    assert got == batch


def test_tws_running_counts(spark, events_stream, tmp_path):
    """transformWithStateInPandas (Spark 4 API) matches the batch stats.
    Needs a working python protobuf + RocksDB provider — skipped where
    absent (this container's protobuf install is broken)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("python protobuf unavailable - transformWithState needs it")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    from etl_tool_spark.streaming.stateful import running_counts_tws

    out = running_counts_tws(events_stream.select("user_id", "ts", "value"))
    q = (out.writeStream.format("memory").queryName("tws")
         .outputMode("update").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], round(r["mean_value"], 6))
           for r in spark.sql("SELECT * FROM tws").collect()}

    from etl_tool_spark.catalog import _events

    batch = {r["user_id"]: (r["n"], round(r["m"], 6)) for r in
             _events(spark, SF_DIR).groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"))
             .collect()}
    assert got == batch
