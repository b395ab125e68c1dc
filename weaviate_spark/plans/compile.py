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


def sort_cols(keys, df: DataFrame | None = None) -> list[Column]:
    from pyspark.sql import types as T

    out = []
    for k in keys:
        name = ".".join(k.path)
        c = F.col(name)
        # reference string sort is CASE-INSENSITIVE
        # (sorter/basic_comparators.go:72-80 compareStrings: EqualFold /
        # ToLower) — fold text keys; fold-equal values tie and fall to
        # the next key / id tiebreak
        if df is not None:
            try:
                dt = df.schema[k.path[0]].dataType
                for p in k.path[1:]:
                    dt = dt[p].dataType if isinstance(dt, T.StructType) else None
            except Exception:
                dt = None
            if isinstance(dt, T.StringType):
                c = F.lower(c)
            elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType):
                c = F.transform(c, F.lower)
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


def _compile_search(spark: SparkSession, sf_dir: str, spec: GetSpec) -> DataFrame:
    """Dispatch the search leg(s) of a GetSpec (explorer.go:135-206
    routing: KeywordRanking -> bm25, near params -> vector search,
    hybrid -> fused)."""
    id_col = spec.extra.get("id_col", "_id")
    vector_col = spec.extra.get("vector_col", "embedding")
    limit = min(spec.limit if spec.limit is not None else DEFAULT_LIMIT,
                QUERY_MAXIMUM_RESULTS)

    if spec.hybrid is not None:
        from weaviate_spark.operators.bm25 import BM25Prop
        from weaviate_spark.operators.hybrid import HybridSpec, hybrid_search

        h = spec.hybrid
        # MetadataRequest.explain_score (search_get.proto:85) flows from
        # the parsed metadata block into the fusion's explain lines
        meta = spec.extra.get("metadata") or {}
        out = hybrid_search(spark, sf_dir, HybridSpec(
            collection=spec.collection, query=h.query, vector=h.vector or [],
            properties=[BM25Prop(p) for p in (h.properties or ["text"])],
            id_col=id_col, vector_col=vector_col, alpha=h.alpha,
            fusion="ranked" if h.fusion == "ranked" else "relativeScore",
            limit=limit, max_vector_distance=h.max_vector_distance,
            where=spec.where,
            explain=bool(meta.get("explain_score")),
        ))
    elif spec.bm25 is not None:
        from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_search

        b = spec.bm25
        props = []
        for p in (b.properties or ["text"]):
            name, _, boost = p.partition("^")
            props.append(BM25Prop(name, boost=float(boost) if boost else 1.0))
        out = bm25_search(spark, sf_dir, BM25Spec(
            collection=spec.collection, query=b.query, properties=props,
            id_col=id_col, limit=limit, search_operator=b.search_operator,
            minimum_or_tokens_match=b.minimum_or_tokens_match,
            where=spec.where,
        ))
    else:
        from weaviate_spark.operators.vector import NearVectorSpec, near_vector

        nv = spec.near_vector
        out = near_vector(spark, sf_dir, NearVectorSpec(
            collection=spec.collection, vector=nv.vector,
            vector_col=vector_col, id_col=id_col, metric=nv.metric,
            limit=limit, distance=nv.distance, certainty=nv.certainty,
            where=spec.where,
            # front-end queries follow the reference's flat-index
            # default: compression OFF (DefaultCompressionEnabled=false,
            # entities/vectorindex/flat/config.go:25) — the BQ plan is a
            # per-collection opt-in, not a silent corpus-size flip
            quantize="off",
        ))

    if spec.autocut > 0:
        from weaviate_spark.operators.search_post import apply_autocut

        score_col = "_score" if "_score" in out.columns else "_distance"
        out = apply_autocut(out, score_col, spec.autocut)
    if spec.select:
        out = out.select(*spec.select, *(
            [id_col] if id_col not in spec.select
            and spec.extra.get("feature_projection") is not None else []))
    fp = spec.extra.get("feature_projection")
    if fp is not None:
        # _additional { featureProjection } — t-SNE over the ≤limit
        # window (projector post-stage; params from the GraphQL args)
        from weaviate_spark.operators.projector import (
            FeatureProjectionParams)
        from weaviate_spark.operators.search_post import (
            attach_feature_projection)

        out = attach_feature_projection(
            spark, out, sf_dir, spec.collection, id_col, vector_col,
            params=FeatureProjectionParams(**fp))
    return out


def compile_get(spark: SparkSession, sf_dir: str, spec: GetSpec) -> DataFrame:
    needs_id = spec.after is not None or any(k.path == ["_id"] for k in spec.sort)
    df = load_table(spark, sf_dir, spec.collection, with_id=needs_id or bool(spec.extra.get("with_id")))

    df = apply_where(df, spec.where)

    if spec.near_vector is not None or spec.bm25 is not None or spec.hybrid is not None:
        # search queries: sort is illegal in combination with ranked
        # search (explorer.go sort validation), results ordered by
        # score/distance with id tie-break instead
        if spec.sort:
            raise ValueError("sort cannot be combined with bm25/near/hybrid search")
        if spec.after is not None:
            raise ValueError("cursor (after) cannot be combined with search")
        return _compile_search(spark, sf_dir, spec)

    if spec.after is not None:
        # scroll API: keyset pagination, exclusive start, id order
        # (explorer_validate_scroll.go forbids combining with sort/search)
        if spec.sort:
            raise ValueError("cursor (after) cannot be combined with sort")
        df = df.where(F.col("_id") > F.lit(spec.after)).orderBy(F.col("_id").asc())
    elif spec.sort:
        df = df.orderBy(*sort_cols(spec.sort, df))

    df = paginate(df, spec)

    if spec.select:
        df = df.select(*spec.select)
    return df
