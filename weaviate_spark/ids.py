"""Deterministic object identity (`_id`) synthesis.

Weaviate objects carry a UUID primary key (reference:
entities/storobj/, adapters/repos/db/shard_read.go:498). The driver's
TPC-H-ish testdata has integer keys, so we synthesize a canonical
lowercase uuid-shaped id from ``md5(table || ':' || rowkey)`` — md5 is
available identically in both Spark (`F.md5`) and DuckDB (`md5`), which
makes `_id` oracle-checkable (FIXTURES.md §B).

The uuid shaping is plain substring slicing of the 32-char md5 hex:
8-4-4-4-12. This is NOT RFC-4122 versioned — it is a stable, sortable,
uniformly distributed key, which is all the engine semantics need
(cursor pagination, tie-breaks, ref beacons).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid_col(table: str, key: Column) -> Column:
    """Spark expression: canonical uuid-shaped md5 of ``table:key``."""
    h = F.md5(F.concat(F.lit(table + ":"), key.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def uuid_sql(table: str, key_expr: str) -> str:
    """DuckDB SQL fragment computing the identical `_id` string."""
    h = f"md5('{table}:' || CAST({key_expr} AS VARCHAR))"
    return (
        f"(substr({h},1,8) || '-' || substr({h},9,4) || '-' || "
        f"substr({h},13,4) || '-' || substr({h},17,4) || '-' || substr({h},21,12))"
    )
