"""Event-stream queries: windowed aggregation, sessionization, dedup —
batch twins (oracle-checked) plus true Structured Streaming variants
(rows-only checks; the driver records the weaker gate for those).

The reference's "streaming" is snapshot polling (SURVEY §2.10); these
are the Spark-native extension over the driver's ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pyield_spark.queries import query, tables
from pyield_spark.queries.oracle_helpers import pround_sql
from pyield_spark.streaming import windows as sw


# === tumbling window aggregation (batch twin of the streaming op) =========


@query(
    "q_events_tumbling",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000)
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark, sf_dir):
    ev = tables(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "5 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# === sessionization: gap > 30 min splits a session ========================


@query(
    "q_events_sessionize",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY 1, 2
    """,
)
def q_events_sessionize(spark, sf_dir):
    ev = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .withColumn(
            "new_s",
            F.when(F.col("gap_us").isNull() | (F.col("gap_us") > 1800000000), 1).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_s").over(wc))
        .groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


# === keep-latest dedup per (user, event_type) =============================


@query(
    "q_events_dedup_latest",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_events_dedup_latest(spark, sf_dir):
    ev = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


# === true Structured Streaming variants ===================================
# Round 4: these carry ORACLES now. The streams are bounded replays and
# every operator here is either order-independent (windowed decimal
# aggregations, inner interval join, key-dedup over a corpus with no
# conflicting duplicates) or rounded at the edge — so the memory-sink
# result is deterministic and equals the batch semantics the SQL
# states. Replay-equals-batch is ALSO asserted in tests/test_streaming.py;
# the oracle upgrades the driver's check from rows-only to value-hash.


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000)
             AS window_start,
           make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) + 1) * 300 * 1000000)
             AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark, sf_dir):
    ev = sw.read_events_stream(spark, sf_dir)
    agg = sw.tumbling_counts(ev, "5 minutes", "10 minutes")
    return sw.run_to_memory(agg, "stream_tumbling_out", mode="complete")


@query(
    "q_stream_sessions",
    # session_window boundary semantics: ranges are [first, last+gap) and
    # MERGE on overlap, so a gap of exactly the gap-duration starts a NEW
    # session — hence >= here where the batch lag/cumsum twin uses > (its
    # own convention); session_end extends gap past the last event
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {psum6} AS sum_value
    FROM numbered GROUP BY user_id, s
    """.format(
        psum6=pround_sql("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)", 6)
    ),
)
def q_stream_sessions(spark, sf_dir):
    ev = sw.read_events_stream(spark, sf_dir)
    agg = sw.session_windows(ev, "30 minutes", "10 minutes")
    out = sw.run_to_memory(agg, "stream_sessions_out", mode="complete")
    # the stream's per-session sum accumulates in doubles (tiny per-
    # session row counts); the portable 6dp round makes it hash-stable
    # against the oracle's decimal sum
    from pyield_spark.functions.numbers import pround_expr

    return out.select(
        "session_start",
        "session_end",
        "user_id",
        "n_events",
        pround_expr(F.col("sum_value"), 6).alias("sum_value"),
    )


@query(
    "q_stream_dedup",
    # the corpus has no conflicting duplicate event_ids (asserted by the
    # n_events parity below hashing every column), so first-seen dedup
    # is a deterministic identity projection of the stream
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
)
def q_stream_dedup(spark, sf_dir):
    ev = sw.read_events_stream(spark, sf_dir)
    dedup = sw.dedup_within_watermark(ev, "10 minutes")
    return sw.run_to_memory(dedup, "stream_dedup_out", mode="append")


@query(
    "q_stream_stateful",
    # the final state per group equals the batch aggregate over all
    # events; the stream's float accumulation and the oracle's decimal
    # sum coincide at the portable 6dp round (micro-batch partials add
    # ~1e-11 relative error on these magnitudes)
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {psum6} AS sum_value
    FROM events GROUP BY 1
    """.format(
        psum6=pround_sql("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)", 6)
    ),
)
def q_stream_stateful(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): final running
    totals per event type — one row per group, the cross-batch state
    after the bounded replay (replay-equals-batch also asserted in
    tests/test_streaming.py)."""
    from pyspark.sql import Window

    from pyield_spark.functions.numbers import pround_expr

    ev = sw.read_events_stream(spark, sf_dir)
    out = sw.running_totals_stateful(ev)
    got = sw.run_to_memory(
        out, "stream_stateful_out", mode="update", shuffle_partitions=8
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    return (
        got.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            "n_events",
            pround_expr(F.col("sum_value"), 6).alias("sum_value"),
        )
    )


@query(
    "q_stream_join",
    # inner interval joins emit matches as found — a deterministic SET
    # equal to the batch interval join (q_error_purchase_window's SQL)
    oracle="""
    SELECT e.event_id AS error_id, p.event_id AS purchase_id,
           e.ts AS error_ts, p.ts AS purchase_ts
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
    """,
)
def q_stream_join(spark, sf_dir):
    """Stream-stream interval self-join (replay-equals-batch vs
    q_error_purchase_window also asserted in tests/test_streaming.py)."""
    ev = sw.read_events_stream(spark, sf_dir)
    j = sw.stream_stream_interval_join(ev, "10 minutes", "10 minutes")
    # join state = 2 stores per shuffle partition, re-opened every
    # micro-batch — scope the partition count to the key cardinality
    # (same sizing note as run_to_memory's docstring)
    return sw.run_to_memory(
        j, "stream_join_out", mode="append", shuffle_partitions=8
    )


# === sliding (hopping) window: 10-min windows every 5 min =================


@query(
    "q_events_sliding",
    oracle="""
    WITH expanded AS (
      SELECT make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) - off)
                            * 300 * 1000000) AS window_start,
             value
      FROM events, unnest([0, 1]) t(off)
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_value
    FROM expanded GROUP BY window_start
    """,
)
def q_events_sliding(spark, sf_dir):
    """Hopping-window average: every event lands in exactly two
    10-minute windows 5 minutes apart. Spark's ``window(size, slide)``
    expands rows window-count times BEFORE the aggregation (same as the
    oracle's unnest) — partial aggregation still collapses map-side, so
    the shuffle carries one row per (window, partition), not per event.
    Average = decimal sum ÷ count (one IEEE division, engine-exact)."""
    ev = tables(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sum"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "n_events",
            (F.col("_sum").cast("double") / F.col("n_events")).alias("avg_value"),
        )
    )


@query(
    "q_stream_sliding",
    # decimal accumulation + one IEEE division: bit-equal to the batch
    # twin regardless of micro-batch partial-aggregation order
    oracle="""
    WITH expanded AS (
      SELECT make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) - off)
                            * 300 * 1000000) AS window_start,
             value
      FROM events, unnest([0, 1]) t(off)
    )
    SELECT window_start,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM expanded GROUP BY window_start
    """,
)
def q_stream_sliding(spark, sf_dir):
    """Structured Streaming twin of ``q_events_sliding``
    (replay-equals-batch also asserted in tests/test_streaming.py)."""
    ev = sw.read_events_stream(spark, sf_dir)
    agg = sw.sliding_avg(ev, "10 minutes", "5 minutes", "10 minutes")
    return sw.run_to_memory(agg, "stream_sliding_out", mode="complete")


# === funnel analysis: signup → click → purchase ordering per user =========


@query(
    "q_event_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, t_signup, t_click, t_purchase,
           (t_signup IS NOT NULL AND t_click IS NOT NULL
            AND t_signup <= t_click) AS reached_click,
           (t_signup IS NOT NULL AND t_click IS NOT NULL
            AND t_purchase IS NOT NULL
            AND t_signup <= t_click AND t_click <= t_purchase)
             AS reached_purchase
    FROM firsts ORDER BY user_id
    """,
)
def q_event_funnel(spark, sf_dir):
    """Ordered-funnel analysis: per user, the first occurrence of each
    stage and whether the stages happened in funnel order. One
    conditional-min groupBy over the fact table (map-side combinable) —
    no self-joins, no windows; the canonical scalable funnel shape."""
    ev = tables(spark, sf_dir, "events")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    f = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    reached_click = (
        F.col("t_signup").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_signup") <= F.col("t_click"))
    )
    reached_purchase = (
        reached_click
        & F.col("t_purchase").isNotNull()
        & (F.col("t_click") <= F.col("t_purchase"))
    )
    return f.select(
        "user_id",
        "t_signup",
        "t_click",
        "t_purchase",
        reached_click.alias("reached_click"),
        reached_purchase.alias("reached_purchase"),
    ).orderBy("user_id")


# === cohort retention: first-seen day × activity-day offset ===============


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_day f USING (user_id)
    )
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Classic cohort-retention triangle: users bucketed by first-seen
    day, activity counted per day offset.

    Two aggregations share the user_id partitioning: the first-day
    groupBy and the per-(user, offset) distinct both hash on user_id, so
    the join between them is co-partitioned (one fact shuffle reused);
    the final (cohort, offset) aggregate is tiny."""
    ev = tables(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.select("user_id", F.col("ts").cast("date").alias("_day"))
        .join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# === bucketed range join: purchases within 10 min after an error ==========


@query(
    "q_error_purchase_window",
    oracle="""
    SELECT e.event_id AS error_id, p.event_id AS purchase_id,
           e.ts AS error_ts, p.ts AS purchase_ts
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
    ORDER BY error_id, purchase_id
    """,
)
def q_error_purchase_window(spark, sf_dir):
    """Interval join — purchases at most 10 minutes after an error by
    the same user — via the bucketed range-join pattern.

    A naive non-equi join degenerates to a nested-loop / broadcast scan
    of every (error, purchase) pair per user. Instead both sides are
    binned to 10-minute epochs; a purchase within (t, t+10min] can only
    land in the error's bin or the next one, so the right side is
    duplicated twice (explode of a 2-element array), the join becomes a
    pure EQUI join on (user_id, bin) — shuffle-hash, AQE-skew-safe —
    and the exact interval predicate filters inside the matched bins.
    Pair blowup is bounded by per-(user, bin) density, not per-user
    totals. This is the standard time-range co-location recipe at
    100 TB (same reasoning as the as-of range buckets)."""
    ev = tables(spark, sf_dir, "events")
    bin_ = (F.unix_micros("ts") / F.lit(600_000_000)).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        bin_.alias("_bin"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            bin_.alias("_pbin"),
        )
        # a purchase answers probes from its own bin and the previous one
        .withColumn("_bin", F.explode(F.array(F.col("_pbin"), F.col("_pbin") - 1)))
    )
    return (
        errors.join(purchases, ["user_id", "_bin"])
        .filter(
            (F.col("purchase_ts") > F.col("error_ts"))
            & (
                F.unix_micros("purchase_ts")
                <= F.unix_micros("error_ts") + F.lit(600_000_000)
            )
        )
        .select("error_id", "purchase_id", "error_ts", "purchase_ts")
        .orderBy("error_id", "purchase_id")
    )


# === semi-structured JSON column processing ===============================


@query(
    "q_json_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                                IS NOT NULL THEN 1 END) AS BIGINT) AS n_with_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_json_props(spark, sf_dir):
    """Semi-structured column processing: the ``props`` JSON string is
    parsed with a declared schema (``from_json`` — vectorized Jackson in
    the JVM, no Python) and aggregated per event type.

    A declared schema beats ``get_json_object`` per field at scale: one
    parse per row regardless of field count, and nulls are well-typed.
    Integer aggregates keep the oracle comparison exact."""
    ev = tables(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "_p", F.from_json("props", "k BIGINT")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.col("_p.k")).alias("n_with_k"),
            F.sum(F.col("_p.k")).alias("sum_k"),
            F.max(F.col("_p.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )
