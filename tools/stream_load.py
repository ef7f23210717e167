"""Streaming throughput / state census (VERDICT r6 ask #5).

Drives the engine's three stateful streaming topologies — session
windows, watermark dedup, stream-stream interval join — from a `rate`
source at increasing event rates, and records per topology:

- sustained throughput (median processedRowsPerSecond over the steady
  tail) vs the offered rate,
- state-store size (rows + bytes) at end of lap,
- watermark lag (wall clock − committed watermark).

Two modes:

  python tools/stream_load.py rates [secs_per_lap]
      60 s laps at 1k/10k/100k rows/s per topology (9 laps).

  python tools/stream_load.py plateau [secs]
      ONE lap (default 600 s) with all three topologies running
      CONCURRENTLY at 10k rows/s each, 2-minute watermarks: state must
      PLATEAU once the eviction horizon passes — rows at end within a
      few % of rows two minutes earlier (watermark-bounded, not
      unbounded). Prints the state trajectory per topology.

Results are recorded in PLANS.md ("Round-7 addition: streaming load
census").
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pyield_spark.session import get_session  # noqa: E402
from pyield_spark.streaming import windows as sw  # noqa: E402

USERS = 10_000


def synth_events(spark, rows_per_sec: int):
    """Rate source → the events schema the topologies expect."""
    v = F.col("value")
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            v.alias("event_id"),
            F.col("timestamp").alias("ts"),
            (v % USERS).alias("user_id"),
            F.when(v % 17 == 0, "error")
            .when(v % 5 == 0, "purchase")
            .otherwise("view")
            .alias("event_type"),
            ((v % 1000) / F.lit(7.0)).alias("value"),
            F.lit("").alias("props"),
        )
    )


def topology(name: str, ev, watermark: str):
    if name == "sessions":
        # session-window aggs only support append (emit on close) or
        # complete; append keeps state = open sessions (≤ USERS)
        return sw.session_windows(ev, gap="5 minutes", watermark=watermark), "append"
    if name == "dedup":
        return sw.dedup_within_watermark(ev, watermark), "append"
    if name == "join":
        return (
            sw.stream_stream_interval_join(ev, max_delay="2 minutes", watermark=watermark),
            "append",
        )
    raise ValueError(name)


def start_query(spark, name: str, rate: int, watermark: str):
    df, mode = topology(name, synth_events(spark, rate), watermark)
    return (
        df.writeStream.outputMode(mode)
        .format("noop")
        # without a trigger interval the micro-batch loop spins ~2
        # batches/s mostly draining nothing — metrics per batch are
        # meaningless and stop() races mid-commit; 5 s batches give
        # clean per-batch rows/s
        .trigger(processingTime="5 seconds")
        .queryName(f"load_{name}_{rate}")
        .start()
    )


def json_load(b):
    """recentProgress entries are dicts in PySpark 4; tolerate JSON
    strings for older harnesses."""
    if isinstance(b, dict):
        return b
    import json

    return json.loads(str(b))


def snap(q):
    """One metrics sample from lastProgress (None until first batch)."""
    p = q.lastProgress
    if not p:
        return None
    state = p.get("stateOperators") or []
    rows = sum(s.get("numRowsTotal", 0) for s in state)
    mem = sum(s.get("memoryUsedBytes", 0) for s in state)
    wm = (p.get("eventTime") or {}).get("watermark")
    proc = p.get("processedRowsPerSecond") or 0.0
    inp = p.get("inputRowsPerSecond") or 0.0
    batch_ms = (p.get("durationMs") or {}).get("triggerExecution", 0)
    return {
        "proc": proc, "inp": inp, "state_rows": rows, "state_mb": mem / 1e6,
        "watermark": wm, "batch_ms": batch_ms,
    }


def wm_lag_seconds(wm_iso):
    if not wm_iso or wm_iso.startswith("1970"):
        return None
    import datetime as dt

    wm = dt.datetime.fromisoformat(wm_iso.replace("Z", "+00:00"))
    return (dt.datetime.now(dt.timezone.utc) - wm).total_seconds()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rates_mode(secs: int, provider: str | None = None):
    spark = get_session("stream_load")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    if provider:
        # session SQL conf — each NEW streaming query picks it up at
        # start; this is the provider a 100 TB deployment runs (state
        # off-heap + spillable, changelog checkpointing available)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        print(f"state-store provider: {provider}", flush=True)
    for name in ("sessions", "dedup", "join"):
        for rate in (1_000, 10_000, 100_000):
            q = start_query(spark, name, rate, watermark="2 minutes")
            t_start = time.time()
            time.sleep(secs)
            # recentProgress holds the completed batches; sustained
            # throughput = input rows actually processed / wall time,
            # skipping the first (ramp-up) batch
            batches = [json_load(b) for b in q.recentProgress]
            last = snap(q) or {}
            try:
                q.stop()
            except Exception:
                pass
            rows = sum(b.get("numInputRows", 0) for b in batches[1:])
            span = max(time.time() - t_start, 1e-9)
            proc = [
                b.get("processedRowsPerSecond", 0.0)
                for b in batches
                if b.get("numInputRows", 0) > 0
            ]
            per_batch = statistics.median(proc) if proc else 0.0
            lag = wm_lag_seconds(last.get("watermark"))
            print(
                f"{name} @{rate:>6}/s: sustained={rows / span:,.0f} rows/s"
                f" (per-batch median {per_batch:,.0f})"
                f" state={last.get('state_rows', 0):,} rows"
                f" ({last.get('state_mb', 0.0):.1f} MB)"
                f" batch={last.get('batch_ms', 0)}ms"
                f" wm_lag={lag if lag is None else round(lag, 1)}s",
                flush=True,
            )


def plateau_mode(secs: int):
    spark = get_session("stream_load")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    qs = {
        name: start_query(spark, name, 10_000, watermark="2 minutes")
        for name in ("sessions", "dedup", "join")
    }
    t0 = time.time()
    traj: dict[str, list[tuple[float, int]]] = {n: [] for n in qs}
    while time.time() - t0 < secs:
        time.sleep(15)
        for name, q in qs.items():
            s = snap(q)
            if s:
                traj[name].append((round(time.time() - t0), s["state_rows"]))
    for name, q in qs.items():
        q.stop()
    ok = True
    for name, points in traj.items():
        print(f"{name} state-rows trajectory: {points}", flush=True)
        # plateau check: last sample within 5% of the sample ~2 min
        # earlier (both past the eviction horizon)
        past = [r for t, r in points if t >= secs - 150]
        if len(past) >= 2 and past[0] > 0:
            growth = (past[-1] - past[0]) / past[0]
            verdict = "PLATEAU" if abs(growth) < 0.05 else "GROWING"
            ok = ok and abs(growth) < 0.05
            print(f"{name}: last-2min growth {growth:+.1%} -> {verdict}", flush=True)
    print("RESULT:", "no unbounded state growth" if ok else "STATE GREW", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "rates"
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else (60 if mode == "rates" else 600)
    if mode == "rates":
        rates_mode(secs)
    elif mode == "rocksdb":
        rates_mode(secs, provider=ROCKSDB_PROVIDER)
    else:
        plateau_mode(secs)
