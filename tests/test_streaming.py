"""Streaming operators: run each with availableNow over the parquet
events table into a memory sink and compare against the batch twin."""

import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.sources.readers import load_table
from vectorsearchutil_spark.streaming.windows import (
    read_events_stream,
    streaming_dedup,
    streaming_session_window,
    streaming_tumbling_counts,
)


def _run_stream(spark, sdf, name, mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = _run_stream(
        spark, streaming_tumbling_counts(stream), "t_tumble", mode="append"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # availableNow + watermark: all windows older than max(ts)-30min close;
    # compare the closed ones
    got_map = {(r["window_start"], r["event_type"]): r["n_events"]
               for r in got.collect()}
    batch_map = {(r["w"]["start"], r["event_type"]): r["n_events"]
                 for r in batch.collect()}
    assert len(got_map) > 0
    for k, v in got_map.items():
        assert batch_map[k] == v


def test_session_window_counts(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = _run_stream(
        spark, streaming_session_window(stream), "t_sess", mode="append"
    )
    rows = got.collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    # emitted (closed) sessions are a subset of all events
    assert 0 < total <= load_table(spark, sf_dir, "events").count()


def test_streaming_dedup(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = _run_stream(spark, streaming_dedup(stream), "t_dedup", mode="append")
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events  # event_id already unique → no drops
    assert got.select("event_id").distinct().count() == n_events
