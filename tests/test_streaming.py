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


def test_foreach_batch_enrichment(spark, sf_dir):
    """T4: batch du engine applied inside foreachBatch micro-batches."""
    from pyield_spark.streaming.windows import enrich_with_batch_ops

    out = enrich_with_batch_ops(spark, sf_dir, "t4_demo")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["count"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
    # events span Jan 2024 incl. weekends: both flags must appear
    assert {r.eh_dia_util for r in rows} == {True, False}
