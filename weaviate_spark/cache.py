"""Per-query cache registry.

Operators cache intermediate frames that are read more than once inside a
single query plan (the BM25 wide doc-term frame, dedup shingle sets, the
hybrid shared scan). The reference engine holds the equivalent state in
its long-lived index structures; a batch engine must instead release those
blocks when the query is done or a long-lived session accumulates cached
RDDs until executor storage evicts under pressure.

Contract: building blocks call ``register_cache(df.cache())``; every
top-level query entry point calls ``release_caches()`` first, so the
previous query's scratch caches are dropped exactly when the next query
starts (results are always materialized by then). Long-lived, deliberately
persistent state (the BM25 corpus-stats tables — the prop-length-tracker
analogue) is NOT registered here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live_caches: list[DataFrame] = []


def session_key(spark) -> int:
    """Stable identity for per-session registries: the SparkContext, not
    the SparkSession wrapper. Structured Streaming runs foreachBatch
    under a CLONED session (isolated SQL confs, shared context + cache
    manager), and PySpark hands the batch a fresh wrapper object — so
    ``id(sparkSession)`` silently misses registry entries built on the
    main session. Cached/checkpointed state is context-scoped, which is
    exactly the sharing cloned sessions should see."""
    return id(spark.sparkContext)


def register_cache(df: DataFrame) -> DataFrame:
    _live_caches.append(df)
    return df


def release_caches() -> None:
    global _live_caches
    for df in _live_caches:
        try:
            df.unpersist()
        except Exception:
            pass
    _live_caches = []
