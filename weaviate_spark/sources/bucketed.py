"""Physical bucketed fact-table layout (ingest-time artifact).

SCALING.md's central 100-TB layout claim: fact tables are WRITTEN
bucketed + sorted on their primary join key, so reference-resolution
joins between two fact tables run as SortMergeJoins with ZERO
ShuffleExchange on either bucketed side. Reference analogue: the
per-shard key-ordered LSM segment layout
(adapters/repos/db/lsmkv/strategies.go:24-29) — data pre-organised by
key at write time so reads never re-partition.

Spark mechanics: ``df.write.bucketBy(n, key).sortBy(key).saveAsTable``
records the bucket spec in the catalog. A join of two tables bucketed
on their join keys with the same bucket count already satisfies both
sides' required hash-clustered distribution, so EnsureRequirements
inserts no Exchange (proof: tests/test_bucketed.py asserts the executed
plan has a SortMergeJoin, `Bucketed: true` scans, and zero shuffle
exchanges below the join). ``repartition(n, key)`` before the write
uses the same Murmur3 hash as the bucket spec, so each task holds
exactly one bucket -> one file per bucket, which also lets Spark trust
the ``sortBy`` order and skip the pre-join Sort.

At 100 TB this write runs ONCE at ingest (the reference compacts LSM
segments the same way); here the artifact is built per (session,
sf_dir) under .artifacts/ and reused by every subsequent query in the
session.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from weaviate_spark.sources.tables import load_table

from weaviate_spark.cache import session_key

ARTIFACT_ROOT = "/root/repo/.artifacts/bucketed"

# table -> default bucket key (the join key its ref-resolution uses)
BUCKET_KEYS: dict[str, str] = {
    "orders": "o_custkey",      # customer<-orders ref resolution
    "customer": "c_custkey",
    "lineitem": "l_orderkey",   # orders<-lineitem ref resolution
}
N_BUCKETS = 16

# (session id, sf_dir, name, key, buckets) -> catalog table name
_built: dict[tuple, str] = {}
# every catalog table ever registered, per session id (for invalidation)
_registered: dict[int, set[str]] = {}


def invalidate_bucketed() -> None:
    """Called on every CRUD write: forget the memo AND drop the catalog
    tables, so the next bucketed read re-resolves against the source's
    CURRENT fingerprint (the artifact path/table name embeds an
    mtime+size fingerprint — a rewritten source can never be served
    from the stale layout even across sessions)."""
    from pyspark.sql import SparkSession

    _built.clear()
    spark = SparkSession.getActiveSession()
    if spark is not None:
        for tbl in _registered.get(session_key(spark), set()):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            except Exception:
                pass
    _registered.clear()


def _source_fingerprint(sf_dir: str, name: str) -> str:
    import os

    path = f"{sf_dir}/{name}.parquet"
    if not os.path.exists(path):
        return "na"
    if os.path.isdir(path):
        stats = [os.stat(os.path.join(path, f)) for f in sorted(os.listdir(path))]
    else:
        stats = [os.stat(path)]
    import hashlib

    raw = str(sum(s.st_mtime_ns + s.st_size for s in stats))
    return hashlib.md5(raw.encode()).hexdigest()[:10]


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str | None = None,
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Load `name` from its bucketed physical layout, building the
    artifact on first use in this session. The returned frame's scan is
    `Bucketed: true`: joins on `key` against an equally-bucketed side
    need no Exchange."""
    from pyspark.sql import functions as F

    key = key or BUCKET_KEYS[name]
    cache_key = (session_key(spark), sf_dir, name, key, buckets)
    if cache_key in _built:
        return spark.table(_built[cache_key])

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    fp = _source_fingerprint(sf_dir, name)
    tbl = f"ws_b{buckets}_{tag}_{name}_{key}_{fp}"
    path = f"{ARTIFACT_ROOT}/{tag}/b{buckets}/{name}_{key}_{fp}"
    _registered.setdefault(session_key(spark), set()).add(tbl)
    if not spark.catalog.tableExists(tbl):
        df = load_table(spark, sf_dir, name)
        (
            df.repartition(buckets, F.col(key))
            .write.format("parquet")
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    _built[cache_key] = tbl
    return spark.table(tbl)


def bucketed_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Co-located fact-fact join over two bucketed frames. The `merge`
    hint pins SortMergeJoin (at test scale the optimizer would broadcast
    the smaller side; at 100 TB neither fact side fits a broadcast, and
    SMJ over the shared bucket layout is the exchange-free plan)."""
    return left.join(right.hint("merge"), on, how)
