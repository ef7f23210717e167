"""Structured Streaming layer: bounded replay equals batch results."""

from pyspark.sql import functions as F

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


def test_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join replays to exactly the batch
    bucketed-interval-join pair set."""
    batch = QUERIES["q_error_purchase_window"](spark, sf_dir)
    stream = QUERIES["q_stream_join"](spark, sf_dir)
    b = {(r.error_id, r.purchase_id) for r in batch.collect()}
    s = {(r.error_id, r.purchase_id) for r in stream.collect()}
    assert b == s
    assert len(b) > 0


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


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    """applyInPandasWithState carries (n, sum) across micro-batches;
    the final emitted row per group equals the batch aggregate."""
    from pyspark.sql import functions as F

    from pyield_spark.streaming import windows as sw

    ev = sw.read_events_stream(spark, sf_dir)
    out = sw.running_totals_stateful(ev)
    got = sw.run_to_memory(out, "stateful_totals_out", mode="update")
    # multiple updates per group (one per micro-batch touching it);
    # the row with the max n_events is the final state
    final = {
        r.event_type: (r.n_events, r.sum_value)
        for r in got.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("event_type").orderBy(F.col("n_events").desc())
            ),
        ).filter(F.col("_rn") == 1).collect()
    }
    batch = {
        r.event_type: (r.n, r.s)
        for r in spark.read.schema(sw.EVENTS_SCHEMA)
        .parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0]
        assert abs(final[k][1] - batch[k][1]) < 1e-6 * max(1.0, abs(batch[k][1]))


def test_stream_sliding_matches_batch(spark, sf_dir):
    batch = QUERIES["q_events_sliding"](spark, sf_dir)
    stream = QUERIES["q_stream_sliding"](spark, sf_dir)
    b = {(r.window_start): (r.n_events, r.avg_value) for r in batch.collect()}
    s = {(r.window_start): (r.n_events, r.avg_value) for r in stream.collect()}
    assert b == s


import pytest


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (not in image"
    " and no vendorable pure-Python copy found — see conftest)",
)
def test_tws_running_totals_matches_batch(spark, sf_dir):
    """transformWithStateInPandas carries typed ValueState across
    micro-batches; the final emitted row per group equals the batch
    aggregate (same contract as the applyInPandasWithState twin).

    Runs under the RocksDB state store provider — TWS uses multiple
    column families, which HDFSBackedStateStoreProvider rejects (the
    rocksdbjni jar ships with PySpark). Scoped to this stream and
    restored after."""
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.bround(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
    )
    from pyspark.sql import Window

    from pyield_spark.streaming import windows as sw

    ev = sw.read_events_stream(spark, sf_dir)
    out = sw.running_totals_tws(ev)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = sw.run_to_memory(
            out, "tws_test_out", mode="update", shuffle_partitions=8
        )
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    final = (
        got.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "n_events", F.bround("sum_value", 6).alias("sum_value"))
    )
    b = {(r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    s = {(r.event_type): (r.n_events, r.sum_value) for r in final.collect()}
    assert b == s


def _stage_split(spark, sf_dir, base, n_files=4):
    """Split the events table into n parquet files under base/all and
    return their sorted paths (scratch lives in the gitignored
    .stream_cache, same as the stream staging)."""
    import glob
    import os
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(n_files).write.parquet(os.path.join(base, "all"))
    files = sorted(glob.glob(os.path.join(base, "all", "part-*.parquet")))
    assert len(files) == n_files
    return ev, files


def test_stream_restart_exactly_once(spark, sf_dir):
    """Durability: a checkpointed file-source stream stopped after the
    first half of its input and RESTARTED with the same checkpoint
    processes only the new files — the sink ends with exactly the batch
    row set (no loss, no duplicates). This is the recovery contract a
    production deployment leans on; the memory-sink replays elsewhere in
    this suite don't exercise it."""
    import os
    import shutil

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "restart_test",
    )
    ev, files = _stage_split(spark, sf_dir, base)
    src, ck, out = (os.path.join(base, d) for d in ("src", "ck", "out"))
    os.makedirs(src)

    def run():
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ck)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:2]:
        shutil.copy(f, src)
    run()
    n_first = spark.read.parquet(out).count()

    for f in files[2:]:
        shutil.copy(f, src)
    run()
    got = spark.read.parquet(out)
    total = ev.count()
    assert 0 < n_first < total
    assert got.count() == total
    assert (
        got.select("event_id").distinct().count()
        == ev.select("event_id").distinct().count()
    )


def test_foreach_batch_upsert_matches_batch(spark, sf_dir):
    """The foreachBatch MERGE body (q_merge_upsert's shape) maintained
    across micro-batches converges to the batch keep-latest dimension —
    keep-latest is associative, so micro-batch boundaries don't matter."""
    import os

    from pyield_spark.streaming.windows import foreach_batch_upsert

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "upsert_test",
    )
    ev, files = _stage_split(spark, sf_dir, base)
    target = os.path.join(base, "dim")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "all"))
    )
    q = (
        foreach_batch_upsert(stream, target)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.user_id: (r._cur_v.ts, r._cur_v.event_id, r._cur_v.value)
        for r in spark.read.parquet(target).collect()
    }
    exp = {
        r.user_id: (r._v.ts, r._v.event_id, r._v.value)
        for r in ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")
            ).alias("_v")
        )
        .collect()
    }
    assert got == exp


def test_foreach_batch_upsert_recovers_from_crashed_swap(spark, sf_dir):
    """Crash window: a swap that died between the two renames leaves the
    previous state under ._old only. The next batch must merge INTO that
    state, not silently rebuild from the replayed batch alone."""
    import os
    import shutil

    from pyield_spark.streaming.windows import foreach_batch_upsert

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "upsert_crash_test",
    )
    ev, files = _stage_split(spark, sf_dir, base)
    target = os.path.join(base, "dim")

    # run to completion once → full dimension state
    q = (
        foreach_batch_upsert(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(base, "all")),
            target,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    full = {r.user_id for r in spark.read.parquet(target).collect()}

    # simulate the crash: state moved aside, new target never landed
    os.rename(target, target + "._old")

    # a fresh run over the same files (at-least-once replay) must see
    # the ._old state and converge to the same dimension
    q = (
        foreach_batch_upsert(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(base, "all")),
            target,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.user_id for r in spark.read.parquet(target).collect()}
    assert got == full
    assert not os.path.isdir(target + "._old")  # cleaned up after swap
    shutil.rmtree(base, ignore_errors=True)


def test_read_events_stream_nanos_and_ntz_generations(spark, tmp_path):
    """The file-stream source must normalize ts exactly like the batch
    tables() helper for all shipped testdata generations: TIMESTAMP
    (micros), TIMESTAMP(NANOS) (reads as BIGINT under nanosAsLong), and
    TIMESTAMP_NTZ — a declared-schema mismatch would break every stream
    query in a regenerated-testdata environment."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyield_spark.streaming.windows import read_events_stream, run_to_memory

    base_ts = dt.datetime(2026, 1, 5, 12, 0, 0)
    rows = {
        "event_id": [1, 2],
        "ts": [base_ts, base_ts + dt.timedelta(minutes=1)],
        "user_id": [10, 11],
        "event_type": ["click", "click"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }

    def run(sf_dir):
        ev = read_events_stream(spark, sf_dir)
        got = run_to_memory(
            ev.select("event_id", "ts", "value"), "gen_probe", mode="append"
        ).collect()
        assert sorted(r["event_id"] for r in got) == [1, 2]
        assert {r["ts"] for r in got} == set(rows["ts"])

    # NANOS generation via pyarrow
    d1 = tmp_path / "nanos"
    d1.mkdir()
    t = pa.table(
        {**rows, "ts": pa.array(rows["ts"], type=pa.timestamp("ns"))}
    )
    pq.write_table(t, str(d1 / "events.parquet"), store_schema=False)
    run(str(d1))

    # NTZ generation via pyarrow micros (no tz → reads as TIMESTAMP_NTZ
    # under Spark's inferTimestampNTZ... declared probe handles either)
    d2 = tmp_path / "micros"
    d2.mkdir()
    t2 = pa.table(
        {**rows, "ts": pa.array(rows["ts"], type=pa.timestamp("us"))}
    )
    pq.write_table(t2, str(d2 / "events.parquet"))
    run(str(d2))


def test_upsert_crash_during_recovered_swap_preserves_state(
    spark, sf_dir, monkeypatch
):
    """Review regression: recovering from a crashed swap (state under
    ._old only) must PROMOTE ._old back to the target BEFORE the next
    swap runs. The pre-fix code read from ._old in place and rmtree'd it
    ahead of the tmp->target rename — a second crash in that window lost
    every prior key. Fault-inject exactly there (the target->._old
    rename) and assert the full state is still committed."""
    import os
    import shutil

    from pyield_spark.streaming.windows import foreach_batch_upsert

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "upsert_crash2_test",
    )
    ev, _files = _stage_split(spark, sf_dir, base)
    target = os.path.join(base, "dim")

    def run(patched):
        q = (
            foreach_batch_upsert(
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(base, "all")),
                target,
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception:
            assert patched, "unexpected failure in the unpatched run"

    run(patched=False)
    full = {r.user_id for r in spark.read.parquet(target).collect()}

    # crash window: state survives only under ._old
    os.rename(target, target + "._old")

    real_rename = os.rename

    def exploding_rename(src, dst):
        if str(dst).endswith("._old"):  # the swap's target->old step
            raise RuntimeError("injected crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", exploding_rename)
    run(patched=True)
    monkeypatch.undo()

    # the only committed copy was never deleted: target is readable and
    # carries the FULL prior dimension (restore-first), not nothing and
    # not a replayed-batch-only rebuild
    assert os.path.isdir(target)
    got = {r.user_id for r in spark.read.parquet(target).collect()}
    assert got == full
    shutil.rmtree(base, ignore_errors=True)


def test_streaming_index_add_matches_batch(spark, sf_dir):
    """Streaming SQ8 ingestion (foreach_batch_index_add) converges to
    the single-shot sq8_index_add of the concatenated remainder —
    frozen-stats encoding is per-row, so micro-batch boundaries and
    file-discovery order don't matter; a full at-least-once REPLAY
    of the stream leaves the index unchanged (anti-join idempotency)."""
    import os
    import shutil

    from pyield_spark.operators.similarity import sq8_encode, sq8_index_add
    from pyield_spark.streaming.windows import foreach_batch_index_add

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "index_add_test",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "batches")
    index_path = os.path.join(base, "index")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") < 250)
    rest = emb.filter(F.col("vec_id") >= 250)

    # bootstrap offline (the seed fixes the frozen stats)
    sq8_encode(seed).write.parquet(index_path)

    # three micro-batch files, written separately so the file source
    # triggers three epochs
    for lo, hi in ((250, 330), (330, 420), (420, 10**9)):
        rest.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            foreach_batch_index_add(stream, index_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def snap(df):
        return {
            r._vid: (tuple(r._codes), tuple(r._mn), tuple(r._mx))
            for r in df.select("_vid", "_codes", "_mn", "_mx").collect()
        }

    got = snap(spark.read.parquet(index_path))
    want = snap(sq8_index_add(sq8_encode(seed), rest))
    assert got == want

    # replay: a fresh run over the same files must be a no-op
    run_stream()
    assert snap(spark.read.parquet(index_path)) == got


def test_streaming_countmin_matches_batch(spark, sf_dir):
    """Streaming Count-Min maintenance (foreach_batch_countmin):
    merging per-micro-batch grids converges to the single batch build
    (grid linearity ⇒ boundary- and order-independent), and a replay
    of the same query lineage (same epoch ids) is a no-op via the
    epoch sidecar — counter merge is NOT idempotent, so this is the
    guard that keeps at-least-once from double-counting."""
    import os
    import shutil

    from pyield_spark.operators import sketch as sk
    from pyield_spark.operators.text import tokens_expr
    from pyield_spark.streaming.windows import foreach_batch_countmin

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stream_cache",
        "countmin_test",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "batches")
    grid_path = os.path.join(base, "grid")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = docs.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("gram")
    )
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        grams.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema(grams.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            foreach_batch_countmin(stream, grid_path, item="gram", w=128, d=4)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()

    def snap(df):
        return {(r.row, r.pos): r.cnt for r in df.collect()}

    got = snap(spark.read.parquet(grid_path))
    want = snap(sk.countmin_build(grams.select("gram"), "gram", 128, 4))
    assert got == want

    # replayed lineage: same epoch ids → sidecar skips every batch
    run_stream()
    assert snap(spark.read.parquet(grid_path)) == got
