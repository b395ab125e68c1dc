"""JSON/DSL -> GetSpec parser, completing the SURVEY §3.1 lifecycle
("serialized query -> parser -> QuerySpec -> compiler").

The wire shape mirrors the reference's gRPC SearchRequest field names
(grpc/proto/v1/search_get.proto:14-52: collection, tenant, limit,
offset, autocut, after, sort_by, filters, bm25_search, near_vector,
hybrid_search, properties) and its Filters message
(grpc/proto/v1/base.proto:78-115: operator enum, path/on/target, the
value_* oneof), so specs produced by a proto-JSON dump of a reference
request parse directly. Validation errors reproduce the reference's
messages where it has one (explorer.go:224 search-leg conflict,
filters.go unknown operator).

Only parsing lives here — the output is a plain GetSpec; compile_get
lowers it to a DataFrame, so every Catalyst optimization applies
identically to parsed and hand-built specs.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from weaviate_spark.filters import Clause, GeoRange
from weaviate_spark.plans.spec import BM25, GetSpec, Hybrid, NearVector, SortKey

# proto enum name -> internal operator name (base.proto Filters.Operator)
_OPERATOR_ENUM = {
    "OPERATOR_EQUAL": "Equal",
    "OPERATOR_NOT_EQUAL": "NotEqual",
    "OPERATOR_GREATER_THAN": "GreaterThan",
    "OPERATOR_GREATER_THAN_EQUAL": "GreaterThanEqual",
    "OPERATOR_LESS_THAN": "LessThan",
    "OPERATOR_LESS_THAN_EQUAL": "LessThanEqual",
    "OPERATOR_AND": "And",
    "OPERATOR_OR": "Or",
    "OPERATOR_WITHIN_GEO_RANGE": "WithinGeoRange",
    "OPERATOR_LIKE": "Like",
    "OPERATOR_IS_NULL": "IsNull",
    "OPERATOR_CONTAINS_ANY": "ContainsAny",
    "OPERATOR_CONTAINS_ALL": "ContainsAll",
    "OPERATOR_CONTAINS_NONE": "ContainsNone",
    "OPERATOR_NOT": "Not",
}
_INTERNAL_OPERATORS = set(_OPERATOR_ENUM.values())

_VALUE_KEYS = (
    "value_text", "value_int", "value_boolean", "value_number",
    "value_text_array", "value_int_array", "value_boolean_array",
    "value_number_array", "value_geo",
)

_TOP_LEVEL_KEYS = {
    "collection", "tenant", "properties", "metadata", "group_by",
    "limit", "offset", "autocut", "after", "sort_by",
    "filters", "hybrid_search", "bm25_search", "near_vector",
}

_FUSION_ENUM = {
    "FUSION_TYPE_RANKED": "ranked",
    "FUSION_TYPE_RELATIVE_SCORE": "relativeScore",
    "ranked": "ranked",
    "relativeScore": "relativeScore",
}

_SEARCH_OP_ENUM = {
    "OPERATOR_OR": "Or", "OPERATOR_AND": "And", "Or": "Or", "And": "And",
}


def _operator(name: str) -> str:
    if name in _OPERATOR_ENUM:
        return _OPERATOR_ENUM[name]
    if name in _INTERNAL_OPERATORS:
        return name
    raise ValueError(f"unknown where operator: {name!r}")


def _filter_path(node: Mapping[str, Any]) -> list[str]:
    # preference order mirrors the gRPC handler: target.property, then
    # path, then the deprecated "on"
    target = node.get("target")
    if target:
        prop = target.get("property")
        if prop:
            return [prop]
        raise ValueError("filter target: only 'property' targets are supported")
    return list(node.get("path") or node.get("on") or [])


def _filter_value(node: Mapping[str, Any]):
    present = [k for k in _VALUE_KEYS if k in node]
    if len(present) > 1:
        raise ValueError(
            f"filters: at most one value_* field allowed, got {present}"
        )
    if not present:
        return None
    key = present[0]
    raw = node[key]
    if key.endswith("_array"):
        # proto3 JSON wraps repeated wrappers as {"values": [...]}; accept
        # a plain list too
        return list(raw["values"]) if isinstance(raw, Mapping) else list(raw)
    if key == "value_geo":
        dist = raw.get("distance")
        if isinstance(dist, Mapping):  # GeoCoordinatesParameters{distance{max}}
            dist = dist.get("max")
        return GeoRange(
            latitude=float(raw["latitude"]), longitude=float(raw["longitude"]),
            distance_meters=float(dist),
        )
    return raw


def parse_filters(node: Mapping[str, Any]) -> Clause:
    """One Filters message (base.proto:78-115) -> Clause tree."""
    op = _operator(node.get("operator", ""))
    operands = [parse_filters(f) for f in node.get("filters", [])]
    return Clause(
        operator=op,
        path=_filter_path(node),
        value=_filter_value(node),
        operands=operands,
        tokenization=node.get("tokenization"),
    )


def _parse_sort(entries) -> list[SortKey]:
    out = []
    for e in entries:
        # SortBy{ascending, path} (search_get.proto:69-77)
        out.append(SortKey(
            path=list(e["path"]),
            order="asc" if e.get("ascending", True) else "desc",
        ))
    return out


def _parse_bm25(node: Mapping[str, Any]) -> BM25:
    so = node.get("search_operator") or {}
    return BM25(
        query=node["query"],
        properties=list(node.get("properties", ())),
        search_operator=_SEARCH_OP_ENUM[so.get("operator", "Or")],
        minimum_or_tokens_match=int(so.get("minimum_or_tokens_match", 0)),
    )


def _single_target(node: Mapping[str, Any]) -> str | None:
    targets = node.get("targets") or {}
    tv = list(targets.get("target_vectors", ()))
    if len(tv) > 1:
        raise ValueError(
            "multi-target search is not expressible as a GetSpec; use the "
            "multi-target operators directly"
        )
    return tv[0] if tv else None


def _parse_near_vector(node: Mapping[str, Any]) -> NearVector:
    return NearVector(
        vector=[float(v) for v in node["vector"]],
        distance=node.get("distance"),
        certainty=node.get("certainty"),
        target_vector=_single_target(node),
        metric=node.get("metric", "cosine"),
    )


def _parse_hybrid(node: Mapping[str, Any]) -> Hybrid:
    alpha = node.get("alpha", 0.75)
    if node.get("use_alpha_param") and node.get("alpha_param") is not None:
        alpha = node["alpha_param"]
    fusion = node.get("fusion_type", "FUSION_TYPE_RELATIVE_SCORE")
    if fusion not in _FUSION_ENUM:
        raise ValueError(f"unknown hybrid fusion_type: {fusion!r}")
    return Hybrid(
        query=node.get("query", ""),
        vector=[float(v) for v in node["vector"]] if node.get("vector") else None,
        alpha=float(alpha),
        fusion=_FUSION_ENUM[fusion],
        properties=list(node.get("properties", ())),
        max_vector_distance=node.get("vector_distance"),
    )


def parse_query(payload: Mapping[str, Any] | str, **extra: Any) -> GetSpec:
    """SearchRequest-shaped JSON (dict or string) -> GetSpec.

    ``extra`` merges into GetSpec.extra — engine-side configuration
    (id_col, vector_col) that is not part of the wire format.
    """
    if isinstance(payload, str):
        payload = json.loads(payload)
    unknown = set(payload) - _TOP_LEVEL_KEYS
    if unknown:
        raise ValueError(f"unknown SearchRequest fields: {sorted(unknown)}")
    collection = payload.get("collection")
    if not collection:
        raise ValueError("invalid params: collection is required")

    legs = [k for k in ("hybrid_search", "bm25_search", "near_vector")
            if payload.get(k)]
    if len(legs) > 1:
        # explorer.go:224
        raise ValueError(
            "conflict: both near<Media> and keyword-based (bm25) arguments "
            "present, choose one"
        )

    props = payload.get("properties") or {}
    select = list(props.get("non_ref_properties", ()))

    merged_extra = dict(extra)
    if payload.get("tenant"):
        merged_extra["tenant"] = payload["tenant"]
    if payload.get("group_by"):
        merged_extra["group_by"] = payload["group_by"]
    if payload.get("metadata"):
        merged_extra["metadata"] = payload["metadata"]

    return GetSpec(
        collection=collection,
        where=parse_filters(payload["filters"]) if payload.get("filters") else None,
        near_vector=(
            _parse_near_vector(payload["near_vector"])
            if payload.get("near_vector") else None
        ),
        bm25=_parse_bm25(payload["bm25_search"]) if payload.get("bm25_search") else None,
        hybrid=(
            _parse_hybrid(payload["hybrid_search"])
            if payload.get("hybrid_search") else None
        ),
        sort=_parse_sort(payload.get("sort_by", ())),
        limit=int(payload["limit"]) if payload.get("limit") else None,
        offset=int(payload.get("offset", 0)),
        after=payload.get("after") or None,
        select=select,
        autocut=int(payload.get("autocut", 0)),
        extra=merged_extra,
    )
