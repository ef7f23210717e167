"""Structured Streaming layer over the ``events`` table.

The reference has no real streaming engine — its "live" surface is
TTL-cached snapshot polling (SURVEY §2.10: 10s intradia TTL
pyield/b3/derivativos_intradia.py:80, market-hours gate
pyield/b3/_validar_pregao.py:35-44). This module is the Spark-native
extension: tumbling/sliding/session windows with watermarks, stateful
dedup, and a foreachBatch hook so every batch operator of the engine
can run inside a stream.

For tests/local verification the parquet events table drives a real
``readStream`` to completion via the memory sink
(``processAllAvailable``) — the same topology works against Kafka by
swapping the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events parquet as a (bounded) stream source.

    The file-stream source requires a directory, so a symlink to the
    (read-only) events file is staged under the repo's gitignored
    stream-cache dir.
    """
    import hashlib
    import os

    # stage dir keyed by the ABSOLUTE source path (basename alone would
    # collide for two sf_dirs with the same leaf name and silently keep
    # a stale symlink to the wrong data)
    target = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    key = hashlib.sha1(target.encode()).hexdigest()[:12]
    stage = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".stream_cache",
        f"{os.path.basename(os.path.normpath(sf_dir))}-{key}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.islink(link) and os.readlink(link) != target:
        os.remove(link)
    if not os.path.lexists(link):
        try:
            os.symlink(target, link)
        except FileExistsError:
            pass  # concurrent caller staged the same link (TOCTOU)
    # same session conventions as queries.tables(): UTC keeps
    # timestamp values aligned with the (tz-naive) DuckDB oracles even
    # when a stream query is the first thing a fresh session runs, and
    # nanosAsLong keeps the TIMESTAMP(NANOS) testdata generation
    # readable. The file-stream source needs a DECLARED schema, so the
    # actual ts physical type is sniffed with a driver-side batch probe
    # (footer-only) and the stream normalizes to TIMESTAMP exactly as
    # tables() does — all three shipped generations stream identically.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # probe memoized per (session, file): six stream queries otherwise
    # pay a redundant footer-listing job each (df_cache_get also evicts
    # entries of stopped sessions)
    from pyield_spark.calendar_br import df_cache_get

    ts_type = df_cache_get(
        spark,
        ("events_ts_type", target),
        lambda: dict(spark.read.parquet(target).dtypes).get("ts"),
    )
    if ts_type == "bigint":  # NANOS generation under nanosAsLong
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA.replace("ts TIMESTAMP", "ts BIGINT"))
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type == "timestamp_ntz":
        raw = (
            spark.readStream.schema(
                EVENTS_SCHEMA.replace("ts TIMESTAMP", "ts TIMESTAMP_NTZ")
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def tumbling_counts(
    events: DataFrame,
    window_size: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with a late-data
    watermark (append-safe)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    # decimal accumulation + one double division: the bounded replay
    # reproduces the batch twin bit-exactly regardless of micro-batch
    # partial-aggregation order
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("win"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sum"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            (F.col("_sum").cast("double") / F.col("n_events")).alias("avg_value"),
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows with an inactivity gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful duplicate suppression keyed by event_id."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_interval_join(
    events: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: purchases at most ``max_delay`` after
    an error by the same user, with BOTH sides live streams (a
    self-join over one source — Spark consumes the source once and
    buffers each side in join state).

    This is the streaming twin of the batch bucketed interval join
    (queries/events.py::q_error_purchase_window): same equi key, same
    time-range predicate, same output columns. State stays bounded
    because each side carries a watermark and the join condition
    time-bounds the match window — the engine derives an eviction
    horizon (error state older than watermark + max_delay is dropped),
    which is exactly what makes stream-stream joins feasible on an
    unbounded source.
    """
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    ).withWatermark("error_ts", watermark)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return (
        errors.join(
            purchases,
            (F.col("user_id") == F.col("_p_user"))
            & (F.col("purchase_ts") > F.col("error_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("error_ts") + F.expr(f"INTERVAL {max_delay}")
            ),
            "inner",
        )
        .select("error_id", "purchase_id", "error_ts", "purchase_ts")
    )


def market_hours_filter(
    ts: str = "ts",
    open_time: str = "09:16:00",
    close_time: str = "18:00:00",
):
    """T1 (SURVEY §2.10): event-time trading-session gate — within
    opening hours and not on the Dec 24/31 half-holidays
    (pyield/b3/_validar_pregao.py:7-44 restated as a stream-safe
    Column predicate)."""
    t = F.date_format(F.col(ts), "HH:mm:ss")
    not_special = ~(
        (F.month(ts) == 12) & (F.dayofmonth(ts).isin(24, 31))
    )
    return (t >= open_time) & (t <= close_time) & not_special


def enrich_with_batch_ops(
    spark: SparkSession, sf_dir: str, name: str, sink_dir: str | None = None
) -> DataFrame:
    """T4 (SURVEY §2.10): every batch operator of the engine is
    stream-safe via ``foreachBatch`` — here each micro-batch of events
    is enriched with the business-day engine (eh_dia_util on the event
    date), exactly the reference's intraday-snapshot enrichment pattern
    (pyield/futuro/intradia.py:143-172) restated on a real stream.

    Each micro-batch writes its enriched aggregate to a parquet sink
    (the production ``foreachBatch`` shape — executors write, nothing
    accumulates on the driver); the bounded-replay result is the sink
    read back with per-epoch partials merged (a date split across two
    micro-batches emits two partial counts — summing them is exactly
    what a downstream MERGE/compaction would do).
    """
    import tempfile

    from pyield_spark import du as du_mod

    ev = read_events_stream(spark, sf_dir)
    out_dir = sink_dir or tempfile.mkdtemp(prefix=f"pyield_enrich_{name}_")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        enriched = du_mod.eh_dia_util(
            batch_df.withColumn("event_date", F.to_date("ts")), "event_date"
        )
        (
            enriched.groupBy("event_date", "eh_dia_util")
            .agg(F.count("*").alias("n"))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = ev.writeStream.foreachBatch(handle).start()
    q.processAllAvailable()
    q.stop()
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_date", "eh_dia_util")
        .agg(F.sum("n").alias("count"))
    )


def foreach_batch_upsert(
    events: DataFrame,
    target_path: str,
    key_col: str = "user_id",
    ord_cols: tuple[str, str] = ("ts", "event_id"),
    value_cols: tuple[str, ...] = ("ts", "event_id", "value"),
):
    """Streaming dimension maintenance: each micro-batch MERGEs into a
    parquet target — the ``foreachBatch`` body of the batch
    ``q_merge_upsert`` shape (pre-aggregate the batch to one row per
    key, full-outer against the target, keep the later version by the
    ordering columns).

    Exactly the upsert loop a real deployment runs against a table
    format; on plain parquet the swap is a rewrite (small dimension),
    with Delta/Iceberg it becomes ``MERGE INTO`` with the same batch
    body. Keep-latest is associative ((ts, id) max-struct), so the
    result is independent of micro-batch boundaries — the restart test
    and the batch twin rely on that.

    Returns the configured ``DataStreamWriter`` (NOT a started query):
    the caller picks the trigger and calls ``.start()`` — e.g.
    ``foreach_batch_upsert(ev, path).trigger(availableNow=True).start()
    .awaitTermination()`` as the tests do.
    """
    import os
    import shutil

    spark = events.sparkSession
    old_path = target_path + "._old"

    def _restore_then_current() -> str | None:
        # crash-safe read: if a swap died between the two renames, the
        # previous state survives under ._old. PROMOTE it back to the
        # target before doing anything else — reading from ._old in
        # place would let the swap below rmtree the only committed copy
        # before the new target exists (a second crash there would lose
        # every prior key; review finding, mirrors compact_parquet's
        # roll-back-first discipline in sources/sinks.py)
        if not os.path.isdir(target_path) and os.path.isdir(old_path):
            os.rename(old_path, target_path)
        return target_path if os.path.isdir(target_path) else None

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        upd = (
            batch_df.groupBy(key_col)
            .agg(
                F.max(F.struct(*ord_cols)).alias("_o"),
                F.max_by(
                    F.struct(*[F.col(c) for c in value_cols]),
                    F.struct(*ord_cols),
                ).alias("_v"),
            )
            .select(key_col, "_o", "_v")
        )
        cur_path = _restore_then_current()
        if cur_path is not None:
            cur = spark.read.parquet(cur_path)
            merged = (
                cur.join(upd, key_col, "full_outer")
                .select(
                    key_col,
                    F.when(
                        F.col("_o").isNull()
                        | (F.col("_cur_o").isNotNull() & (F.col("_cur_o") >= F.col("_o"))),
                        F.col("_cur_v"),
                    )
                    .otherwise(F.col("_v"))
                    .alias("_nv"),
                    F.greatest(F.col("_cur_o"), F.col("_o")).alias("_no"),
                )
                .select(
                    key_col,
                    F.col("_nv").alias("_cur_v"),
                    F.col("_no").alias("_cur_o"),
                )
            )
        else:
            merged = upd.select(
                key_col,
                F.col("_v").alias("_cur_v"),
                F.col("_o").alias("_cur_o"),
            )
        # swap with the previous state kept aside until the new one is
        # in place: a crash at ANY point leaves either target or ._old
        # readable (keep-latest merge is idempotent under the replayed
        # batch, so at-least-once delivery still converges). The rmtree
        # below only ever removes a STALE ._old from a completed swap —
        # the restore above guarantees the live state is at target
        tmp = target_path + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old_path, ignore_errors=True)
        if os.path.isdir(target_path):
            os.rename(target_path, old_path)
        os.rename(tmp, target_path)
        shutil.rmtree(old_path, ignore_errors=True)

    return events.writeStream.foreachBatch(handle)


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drive a bounded stream to completion into a memory sink and
    return the materialized result (test/local harness only).

    mode="complete" for windowed aggregations (emits every window even
    though the watermark never passes the last one on a bounded replay);
    mode="append" for row streams like stateful dedup.

    shuffle_partitions: stateful operators materialize ONE state store
    per shuffle partition, fixed at stream start. For a low-cardinality
    group key (e.g. ~10 event types) the session default of 32 pays 32
    store inits + python-worker rounds per micro-batch for nothing;
    pass a small value to scope the conf around this stream only. On a
    real cluster you'd size this to key cardinality × skew headroom.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


def running_totals_stateful(
    events: DataFrame,
    group_col: str = "event_type",
) -> DataFrame:
    """T-custom: arbitrary stateful aggregation with
    ``applyInPandasWithState`` — running (n_events, sum_value) per group
    carried across micro-batches in explicit GroupState, the API for
    operators Spark's built-in windows can't express (the reference's
    intraday running-snapshot shape, pyield/futuro/intradia.py:143-172).

    Decimal-free by design: the per-batch partial sums accumulate in a
    deterministic order (batch arrival within the bounded replay), and
    the batch twin used for verification aggregates in decimal — the
    test asserts equality after a 6dp portable round.

    Emits one updated row per group per micro-batch (update mode); the
    LAST row per group equals the batch aggregate over everything seen.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, n_events bigint, sum_value double, batch_rows bigint"
    )
    state_schema = "n bigint, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "batch_rows": [batch_rows],
            }
        )

    return (
        events.select(group_col, "value")
        .groupBy(group_col)
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(
    events: DataFrame,
    group_col: str = "event_type",
) -> DataFrame:
    """The same running-totals operator on the modern
    ``transformWithStateInPandas`` API (Spark 4): typed ValueState
    replaces the tuple GroupState, the processor owns its lifecycle
    (init/close), and the engine adds timers/TTL and state-schema
    evolution for free — the forward-looking home for custom stateful
    operators (applyInPandasWithState is the 3.x-era API kept above for
    parity).

    Environment requirements: the operator's state-server protocol
    needs ``google.protobuf``, and its multiple state column families
    need the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``; the rocksdbjni jar ships with
    PySpark). This image has no protobuf wheel, but the test harness
    locates a vendorable pure-Python copy (tests/conftest.py) — the
    round-6 env-skip is a RUN test since round 7. The test skips only
    when no protobuf can be found at all.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, s = self._totals.get()
            else:
                n, s = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {group_col: [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return (
        events.select(group_col, "value")
        .groupBy(group_col)
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def foreach_batch_index_add(
    batches: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    drift: str = "warn",
    drift_tol: float = 0.0,
):
    """Streaming ANN index ingestion — the ``foreachBatch`` body around
    ``operators/similarity.py::sq8_index_add``: each micro-batch of
    vectors encodes against the persisted index's FROZEN per-dimension
    stats and appends, so a live embedding feed maintains the same
    index an offline rebuild would produce (the FAISS add-vs-search
    split, now fed by Structured Streaming).

    Contract:

    - the index must be BOOTSTRAPPED offline first (``sq8_encode`` on a
      seed corpus, written to ``index_path``) — the seed fixes the
      stats; an empty path raises rather than silently training on
      whatever micro-batch arrives first (stats would then depend on
      file-discovery order);
    - idempotent under at-least-once replay: batch ids already present
      in the index are anti-joined away before encoding, so a replayed
      micro-batch converges instead of duplicating rows — and because
      frozen-stats encoding is per-row, the final index is independent
      of micro-batch boundaries AND order (test-pinned against the
      single-shot ``sq8_index_add`` of the concatenated remainder);
    - the ``bits`` build parameter is cross-checked against the schema
      metadata ``sq8_encode`` stamped on ``_codes`` — Spark persists
      column metadata through parquet, so the build-vs-serve guard
      survives the round trip;
    - same crash-safe swap discipline as :func:`foreach_batch_upsert`
      (target/._old two-rename protocol; on plain parquet the append
      is a rewrite — with Delta/Iceberg the body becomes a true
      append of only the new rows).

    Returns the configured ``DataStreamWriter`` (caller picks trigger
    and calls ``.start()``).
    """
    import os
    import shutil

    from pyield_spark.operators.similarity import sq8_index_add

    spark = batches.sparkSession
    old_path = index_path + "._old"

    def _restore_then_current() -> str | None:
        if not os.path.isdir(index_path) and os.path.isdir(old_path):
            os.rename(old_path, index_path)
        return index_path if os.path.isdir(index_path) else None

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if _restore_then_current() is None:
            raise ValueError(
                "foreach_batch_index_add: no index at "
                f"{index_path!r} — bootstrap with sq8_encode first"
            )
        cur = spark.read.parquet(index_path)
        # null ids would defeat the replay-idempotency anti-join below
        # (NULL never equi-matches, so the same row re-appends on every
        # at-least-once replay) — drop them before the seen-id filter
        fresh = batch_df.filter(F.col(id_col).isNotNull()).join(
            cur.select(F.col("_vid").alias(id_col)), id_col, "left_anti"
        )
        merged = sq8_index_add(
            cur, fresh, id_col, vec_col, dim,
            drift=drift, drift_tol=drift_tol, bits=bits,
        )
        tmp = index_path + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old_path, ignore_errors=True)
        if os.path.isdir(index_path):
            os.rename(index_path, old_path)
        os.rename(tmp, index_path)
        shutil.rmtree(old_path, ignore_errors=True)

    return batches.writeStream.foreachBatch(handle)


def foreach_batch_countmin(
    batches: DataFrame,
    grid_path: str,
    item: str = "gram",
    w: int | None = None,
    d: int | None = None,
):
    """Streaming Count-Min maintenance — the canonical streaming-sketch
    loop: each micro-batch builds its own grid (map-side combinable,
    ≤ d·w rows) and cell-sum merges into the persisted grid, so a live
    item feed answers heavy-hitter/frequency queries from bounded
    state that a batch job can also union with (`countmin_merge` —
    grids are linear).

    Exactly-once discipline: unlike the index add (idempotent via the
    seen-id anti-join — ids either exist or they don't), counter MERGE
    is associative but NOT idempotent — replaying a micro-batch would
    double-count. ``foreachBatch`` replays carry the same ``epoch_id``,
    so processed epochs are recorded in a ``_epochs`` sidecar under the
    grid path and a replayed epoch is skipped — the standard
    epoch-id-dedup recipe from the Structured Streaming guide, applied
    to a mergeable sketch. (With a transactional sink the epoch check
    and the merge would be one atomic commit; on plain parquet the
    sidecar is written AFTER the swapped grid, so a crash between the
    two replays the batch into a grid that does not yet record it —
    at-least-once never under-counts, and the window is one rename.)
    The dedup keys on ``epoch_id`` alone — the guide's ``batchId``
    recipe — which assumes ONE checkpointed query lineage per grid: a
    brand-new query (fresh checkpoint) restarts epochs at 0 and would
    be skipped against an old sidecar. Point a new lineage at a fresh
    grid+sidecar, or clear ``._epochs`` when the old lineage is
    retired.

    (w, d) default to the persisted grid's recorded shape (or the
    module defaults when bootstrapping); passing a mismatched shape
    raises via the countmin metadata guard at merge time.

    Returns the configured ``DataStreamWriter`` (caller picks trigger
    and calls ``.start()``).
    """
    import os
    import shutil

    from pyield_spark.operators import sketch as sk

    spark = batches.sparkSession
    old_path = grid_path + "._old"
    epochs_path = grid_path + "._epochs"

    def _restore_then_current() -> str | None:
        if not os.path.isdir(grid_path) and os.path.isdir(old_path):
            os.rename(old_path, grid_path)
        return grid_path if os.path.isdir(grid_path) else None

    def _seen(epoch_id: int) -> bool:
        marker = os.path.join(epochs_path, str(epoch_id))
        return os.path.exists(marker)

    def _mark(epoch_id: int) -> None:
        os.makedirs(epochs_path, exist_ok=True)
        with open(os.path.join(epochs_path, str(epoch_id)), "w"):
            pass

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if _seen(epoch_id):
            return  # replayed micro-batch: merging again would double-count
        cur_path = _restore_then_current()
        use_w = w if w is not None else sk.WIDTH
        use_d = d if d is not None else sk.DEPTH
        if cur_path is not None:
            cur = spark.read.parquet(cur_path)
            meta = {}
            try:
                meta = cur.schema["cnt"].metadata or {}
            except Exception:
                pass
            if w is None and meta.get("w") is not None:
                use_w = meta["w"]
            if d is None and meta.get("d") is not None:
                use_d = meta["d"]
        fresh = sk.countmin_build(batch_df, item, use_w, use_d)
        if cur_path is not None:
            merged = sk.countmin_merge(
                spark.read.parquet(cur_path), fresh
            )
        else:
            merged = fresh
        tmp = grid_path + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old_path, ignore_errors=True)
        if os.path.isdir(grid_path):
            os.rename(grid_path, old_path)
        os.rename(tmp, grid_path)
        shutil.rmtree(old_path, ignore_errors=True)
        _mark(epoch_id)

    return batches.writeStream.foreachBatch(handle)
