"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — duckdb-equivalent SQL per query key.

Column names are aliased identically on both sides; every query has a
deterministic result SET (ties broken by a unique key before any LIMIT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weaviate_spark.entry_queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filter + multi-key sort + limit over customer (M1 slice)."""
    return QUERIES["filter_sort_limit"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
