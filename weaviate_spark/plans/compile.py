"""GetSpec -> DataFrame compiler.

Stage ordering is the reference's fixed pipeline
(usecases/traverser/explorer.go:135-353, adapters/repos/db/index.go:2293-2329):
filter -> search leg(s) -> fusion -> autocut -> sort -> cursor/offset/limit
-> projection.

Sorting semantics (entities/filters/sort.go, sorter/basic_comparators.go:60-382):
nulls first on ascending, nulls last on descending — Spark's
``asc_nulls_first`` / ``desc_nulls_last`` match exactly.

Pagination (entities/filters/pagination.go:14-29): offset+limit is executed
as ``limit(offset+limit)`` then a window-free slice; cursor ("after",
entities/filters/cursor.go:14-37) is keyset pagination on `_id` — at scale
this beats offset pagination because the predicate pushes down to the scan
instead of materializing offset+limit rows.

Scale notes: sort+limit compiles to TakeOrderedAndProject (per-partition
top-k then a single merge — no global sort shuffle); cursor pagination is a
pushed-down range scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark.filters import apply_where
from weaviate_spark.plans.spec import (
    DEFAULT_LIMIT,
    QUERY_MAXIMUM_RESULTS,
    GetSpec,
    SortKey,
)
from weaviate_spark.sources.tables import load_table


def sort_cols(keys) -> list[Column]:
    out = []
    for k in keys:
        c = F.col(".".join(k.path))
        # reference null rule (sorter handleNils): asc -> nulls first,
        # desc -> nulls last. Matches Spark defaults but be explicit.
        out.append(c.asc_nulls_first() if k.order == "asc" else c.desc_nulls_last())
    return out


def paginate(df: DataFrame, spec: GetSpec, default_limit: int = DEFAULT_LIMIT) -> DataFrame:
    limit = spec.limit if spec.limit is not None else default_limit
    limit = min(limit, QUERY_MAXIMUM_RESULTS)
    if spec.offset:
        # offset+limit with the server cap (explorer.go:383-398)
        total = min(spec.offset + limit, QUERY_MAXIMUM_RESULTS)
        return df.offset(spec.offset).limit(total - spec.offset)
    return df.limit(limit)


def compile_get(spark: SparkSession, sf_dir: str, spec: GetSpec) -> DataFrame:
    needs_id = spec.after is not None or any(k.path == ["_id"] for k in spec.sort)
    df = load_table(spark, sf_dir, spec.collection, with_id=needs_id or bool(spec.extra.get("with_id")))

    df = apply_where(df, spec.where)

    if spec.near_vector is not None or spec.bm25 is not None or spec.hybrid is not None:
        # search legs are compiled by their operator modules; the entry
        # points in operators/ are used directly for those queries.
        raise NotImplementedError("use operators.vector / operators.bm25 / operators.hybrid")

    if spec.after is not None:
        # scroll API: keyset pagination, exclusive start, id order
        # (explorer_validate_scroll.go forbids combining with sort/search)
        if spec.sort:
            raise ValueError("cursor (after) cannot be combined with sort")
        df = df.where(F.col("_id") > F.lit(spec.after)).orderBy(F.col("_id").asc())
    elif spec.sort:
        df = df.orderBy(*sort_cols(spec.sort))

    df = paginate(df, spec)

    if spec.select:
        df = df.select(*spec.select)
    return df
