"""Structured Streaming layer: bounded replay equals batch results."""

from pyield_spark.queries import QUERIES, load_all

load_all()


def test_stream_tumbling_matches_batch(spark, sf_dir):
    batch = QUERIES["q_events_tumbling"](spark, sf_dir)
    stream = QUERIES["q_stream_tumbling"](spark, sf_dir)
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    s = {(r.window_start, r.event_type): r.n_events for r in stream.collect()}
    assert b == s


def test_stream_dedup_rowcount(spark, sf_dir):
    out = QUERIES["q_stream_dedup"](spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() <= n_events
    assert out.select("event_id").distinct().count() == out.count()
