"""Whole-result query cache + scheduler hints.

Reference: Druid caches per-segment and whole results keyed by the query's
cache key (query/CacheStrategy.java; broker cache in
server/.../client/CachingClusteredClient.java, Caffeine-backed
client/cache/CaffeineCache.java), controlled per-query by context flags
useCache / populateCache (query/QueryContexts.java).  Here the analogue is a
bounded registry of PERSISTED DataFrames keyed by the canonicalized query
JSON: populateCache persists the plan's result (memory-and-disk, spilling
like Tungsten does), useCache returns the persisted frame so repeated
dashboards hit executor block storage instead of re-scanning parquet.

Query prioritization (server/.../QueryScheduler.java laning,
QueryContexts.getPriority) maps to Spark fair-scheduler pools: context.lane
names the pool, context.priority picks between built-in "high"/"low" pools.
Pool assignment is a thread-local Spark property, matching the
one-query-per-request execution model.
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_MAX_ENTRIES = 64
_CACHE: OrderedDict[str, DataFrame] = OrderedDict()
# ThreadingHTTPServer serves concurrent requests: the OrderedDict's
# move_to_end/pop/popitem must not interleave
_LOCK = threading.Lock()


def cache_key(query: dict) -> str:
    """Canonical cache key: the query JSON minus cache/priority context flags
    (two queries differing only in cache directives share results — same rule
    as CacheKey generation skipping context).  The registered-lookup version
    is folded in: Druid refuses to cache lookup-dependent queries
    (CacheStrategy), since a lookup re-registration would serve stale
    results — versioning the key achieves the same safety while still
    caching between lookup updates."""
    q = dict(query)
    ctx = dict(q.pop("context", None) or {})
    for k in ("useCache", "populateCache", "priority", "lane", "timeout",
              "queryId"):
        ctx.pop(k, None)
    if ctx:
        q["context"] = ctx
    from incubator_druid_spark.functions.lookups import lookup_version
    return json.dumps(q, sort_keys=True, default=str) + \
        f"#lkv{lookup_version()}"


def lookup(query: dict) -> DataFrame | None:
    ctx = query.get("context") or {}
    if not ctx.get("useCache"):
        return None
    key = cache_key(query)
    with _LOCK:
        df = _CACHE.get(key)
        if df is not None:
            _CACHE.move_to_end(key)
    return df


def populate(query: dict, df: DataFrame) -> DataFrame:
    ctx = query.get("context") or {}
    if not ctx.get("populateCache"):
        return df
    key = cache_key(query)
    df = df.persist()
    evicted = []
    with _LOCK:
        old = _CACHE.pop(key, None)
        if old is not None:
            evicted.append(old)
        _CACHE[key] = df
        while len(_CACHE) > _MAX_ENTRIES:
            _, e = _CACHE.popitem(last=False)
            evicted.append(e)
    for e in evicted:  # unpersist outside the lock (py4j roundtrip)
        e.unpersist()
    return df


def clear() -> None:
    with _LOCK:
        entries = list(_CACHE.values())
        _CACHE.clear()
    for df in entries:
        df.unpersist()


def apply_scheduling(query: dict, spark: SparkSession) -> None:
    """context.lane / context.priority → fair-scheduler pool for jobs this
    thread triggers (QueryScheduler lane semantics; priority >0 → 'high',
    <0 → 'low', matching QueryContexts.getPriority default 0)."""
    ctx = query.get("context") or {}
    pool = ctx.get("lane")
    if pool is None and "priority" in ctx:
        p = int(ctx["priority"])
        pool = "high" if p > 0 else "low" if p < 0 else None
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
