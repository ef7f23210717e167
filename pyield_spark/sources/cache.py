"""TTL-keyed dataset cache — the reference's in-process caching layer
re-expressed for Spark.

Reference (pyield/_internal/data_cache.py:43-83): remote release
parquets are memoized per (dataset, today); general API calls use a
60-second TTL (pyield/_internal/cache.py:8-40); intraday snapshots a
10-second TTL (pyield/b3/derivativos_intradia.py:80).

On Spark the cached object is a materialized DataFrame (``.cache()``),
keyed by (name, time-bucket): a new bucket triggers a fresh read and an
unpersist of the stale entry — the same refresh-on-TTL behavior with
cluster-resident storage instead of process memory.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, tuple[int, DataFrame]] = {}


def _bucket(ttl_seconds: float, now: float | None = None) -> int:
    return int((now if now is not None else time.time()) // ttl_seconds)


def get_dataset(
    spark: SparkSession,
    name: str,
    loader,
    ttl_seconds: float = 86400.0,
    now: float | None = None,
) -> DataFrame:
    """Load-or-reuse a cached DataFrame for ``name``.

    ``loader(spark) -> DataFrame`` runs only when the TTL bucket rolls
    over; the previous entry is unpersisted. ``now`` is injectable for
    tests.

    Keys use the applicationId:startTime session token (shared with
    ``calendar_br.df_cache_get``) — ``id(sparkContext)`` is unsafe
    because a stopped context's address can be re-allocated to a fresh
    session, serving cached plans bound to the dead one. Dead-session
    entries are purged on every miss.
    """
    from pyield_spark.calendar_br import _session_token

    token = _session_token(spark)
    key = (token, name)
    bucket = _bucket(ttl_seconds, now)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] == bucket:
        return hit[1]
    if hit is not None:
        try:
            hit[1].unpersist()
        except Exception:
            pass
    for k in [k for k in _CACHE if k[0] != token]:
        del _CACHE[k]  # plans bound to dead sessions: never reusable
    df = loader(spark).cache()
    _CACHE[key] = (bucket, df)
    return df


def clear() -> None:
    for _, df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()
