"""GraphQL -> spec parser for the reference's primary query surface.

The reference serves queries as GraphQL documents (`{ Get { Class(...)
{ props } } }`, adapters/handlers/graphql/ — Get/Aggregate/Explore
roots built in graphql/local/get/get.go and graphql/local/aggregate/).
This module parses that surface directly into the SAME GetSpec /
AggregateSpec that the JSON SearchRequest parser (plans/parse.py) and
hand-built queries use, so one compiler (plans/compile.py,
operators/aggregate.py) serves every entry point and all Catalyst
optimizations apply identically.

Scope: the query language subset the reference's resolvers accept —
where-filter objects (operator enums, value* keys incl. valueGeoRange,
nested operands), nearVector, bm25, hybrid, sort, pagination
(limit/offset/after), autocut, property selections, `_additional`
metadata, Aggregate's meta{count} / groupBy / per-property aggregator
selections. Variables, fragments, directives, and mutations are
rejected with explicit errors (the reference routes writes through
REST/gRPC, not GraphQL mutations).

The grammar implemented is the public GraphQL spec's expression core
(SelectionSet / Field / Arguments / Value) — a ~150-line recursive
descent lexer+parser, no external dependency.
"""

from __future__ import annotations

import re
from typing import Any

from weaviate_spark.filters import Clause, GeoRange
from weaviate_spark.operators.aggregate import AggregateSpec, PropertyAgg
from weaviate_spark.plans.parse import _FUSION_ENUM, _operator
from weaviate_spark.plans.spec import BM25, GetSpec, Hybrid, NearVector, SortKey

# ---------------------------------------------------------------------------
# Lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[\s,]+|\#[^\n]*)
  | (?P<punct>[{}()\[\]:!])
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
  | (?P<dollar>\$)
  | (?P<at>@)
  | (?P<spread>\.\.\.)
    """,
    re.VERBOSE,
)

_ESCAPES = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t"}


class _Enum(str):
    """A bare GraphQL name used in value position (operator: Equal)."""


def _unquote(raw: str) -> str:
    out, i = [], 1
    while i < len(raw) - 1:
        c = raw[i]
        if c == "\\":
            e = raw[i + 1]
            if e == "u":
                out.append(chr(int(raw[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(e, e))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _lex(src: str) -> list[tuple[str, Any]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise ValueError(f"GraphQL syntax error at offset {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "punct":
            toks.append((m.group(), None))
        elif kind == "string":
            toks.append(("value", _unquote(m.group())))
        elif kind == "number":
            text = m.group()
            toks.append(("value", float(text) if any(c in text for c in ".eE") else int(text)))
        elif kind == "name":
            toks.append(("name", m.group()))
        elif kind == "dollar":
            raise ValueError("GraphQL variables are not supported; inline the value")
        elif kind == "at":
            raise ValueError("GraphQL directives are not supported")
        elif kind == "spread":
            raise ValueError("GraphQL fragments are not supported")
    return toks


# ---------------------------------------------------------------------------
# Parser (SelectionSet / Field / Arguments / Value)


class _Parser:
    def __init__(self, toks: list[tuple[str, Any]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, Any]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", None)

    def next(self) -> tuple[str, Any]:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str) -> Any:
        k, v = self.next()
        if k != kind:
            raise ValueError(f"GraphQL parse error: expected {kind!r}, got {k!r}")
        return v

    def value(self) -> Any:
        k, v = self.next()
        if k == "value":
            return v
        if k == "name":
            if v == "true":
                return True
            if v == "false":
                return False
            if v == "null":
                return None
            return _Enum(v)
        if k == "[":
            out = []
            while self.peek()[0] != "]":
                out.append(self.value())
            self.next()
            return out
        if k == "{":
            out = {}
            while self.peek()[0] != "}":
                name = self.expect("name")
                self.expect(":")
                out[name] = self.value()
            self.next()
            return out
        raise ValueError(f"GraphQL parse error: unexpected {k!r} in value position")

    def arguments(self) -> dict[str, Any]:
        args: dict[str, Any] = {}
        if self.peek()[0] != "(":
            return args
        self.next()
        while self.peek()[0] != ")":
            name = self.expect("name")
            self.expect(":")
            args[name] = self.value()
        self.next()
        return args

    def selection_set(self) -> list[dict]:
        self.expect("{")
        fields = []
        while self.peek()[0] != "}":
            name = self.expect("name")
            args = self.arguments()
            sub = self.selection_set() if self.peek()[0] == "{" else []
            fields.append({"name": name, "args": args, "fields": sub})
        self.next()
        return fields


def parse_document(src: str) -> list[dict]:
    """GraphQL document -> field tree. Accepts an optional leading
    `query [Name]` keyword; rejects mutations/subscriptions."""
    toks = _lex(src)
    p = _Parser(toks)
    if p.peek() == ("name", "mutation") or p.peek() == ("name", "subscription"):
        raise ValueError(f"{p.peek()[1]} operations are not supported")
    if p.peek()[0] == "name" and p.peek()[1] == "query":
        p.next()
        if p.peek()[0] == "name":  # operation name
            p.next()
    fields = p.selection_set()
    if p.peek()[0] != "eof":
        raise ValueError("GraphQL parse error: trailing content after document")
    return fields


# ---------------------------------------------------------------------------
# Conversion: field tree -> GetSpec / AggregateSpec

# GraphQL where-filter value keys (graphql/local/common_filters/filters.go)
_VALUE_KEYS = {
    "valueText", "valueString", "valueInt", "valueNumber", "valueBoolean",
    "valueDate", "valueGeoRange",
}

_GQL_FUSION = {
    "rankedFusion": "ranked",
    "relativeScoreFusion": "relativeScore",
    **_FUSION_ENUM,
}


def _convert_where(node: dict) -> Clause:
    present = [k for k in _VALUE_KEYS if k in node]
    if len(present) > 1:
        raise ValueError(f"where: at most one value* field allowed, got {present}")
    value = None
    if present:
        raw = node[present[0]]
        if present[0] == "valueGeoRange":
            geo = raw["geoCoordinates"]
            dist = raw["distance"]
            value = GeoRange(
                latitude=float(geo["latitude"]), longitude=float(geo["longitude"]),
                distance_meters=float(dist["max"] if isinstance(dist, dict) else dist),
            )
        else:
            value = raw
    path = node.get("path", [])
    if isinstance(path, (str, _Enum)):
        path = [str(path)]
    return Clause(
        operator=_operator(str(node.get("operator", ""))),
        path=[str(p) for p in path],
        value=value,
        operands=[_convert_where(o) for o in node.get("operands", [])],
        tokenization=node.get("tokenization"),
    )


def _convert_sort(raw) -> list[SortKey]:
    entries = raw if isinstance(raw, list) else [raw]
    out = []
    for e in entries:
        path = e["path"]
        if isinstance(path, (str, _Enum)):
            path = [str(path)]
        out.append(SortKey(path=[str(p) for p in path],
                           order=str(e.get("order", "asc"))))
    return out


def _convert_near_vector(node: dict) -> NearVector:
    tv = node.get("targetVectors") or []
    if len(tv) > 1:
        raise ValueError(
            "multi-target search is not expressible as a GetSpec; use the "
            "multi-target operators directly"
        )
    return NearVector(
        vector=[float(v) for v in node["vector"]],
        distance=node.get("distance"),
        certainty=node.get("certainty"),
        target_vector=str(tv[0]) if tv else None,
        metric=str(node.get("metric", "cosine")),
    )


def _convert_bm25(node: dict) -> BM25:
    so = node.get("searchOperator") or {}
    return BM25(
        query=str(node["query"]),
        properties=[str(p) for p in node.get("properties", [])],
        search_operator=str(so.get("operator", "Or")),
        minimum_or_tokens_match=int(so.get("minimumOrTokensMatch", 0)),
    )


def _convert_hybrid(node: dict) -> Hybrid:
    fusion = str(node.get("fusionType", "relativeScore"))
    if fusion not in _GQL_FUSION:
        raise ValueError(f"unknown hybrid fusionType: {fusion!r}")
    return Hybrid(
        query=str(node.get("query", "")),
        vector=[float(v) for v in node["vector"]] if node.get("vector") else None,
        alpha=float(node.get("alpha", 0.75)),
        fusion=_GQL_FUSION[fusion],
        properties=[str(p) for p in node.get("properties", [])],
        max_vector_distance=node.get("maxVectorDistance"),
    )


_EXPLORE_FIELDS = {"className", "beacon", "distance", "certainty"}


def _explore_spec(root: dict) -> dict:
    """Explore{} root -> cross-class search spec: the reference's
    Explore resolver takes the search argument on the ROOT field (no
    class selection — it fans out over every vector-capable class,
    adapters/handlers/graphql/local/explore/) and projects from the
    fixed field set className/beacon/distance/certainty."""
    args = root["args"]
    known = {"nearVector", "limit", "offset"}
    unknown = set(args) - known
    if unknown:
        raise ValueError(f"Explore: unsupported arguments {sorted(unknown)}")
    if "nearVector" not in args:
        raise ValueError("Explore requires a nearVector argument")
    fields = [f["name"] for f in root["fields"]]
    bad = [f for f in fields if f not in _EXPLORE_FIELDS]
    if bad or not fields:
        raise ValueError(
            f"Explore selections must be from {sorted(_EXPLORE_FIELDS)}; "
            f"got {fields}"
        )
    return {
        "root": "Explore",
        "near_vector": _convert_near_vector(args["nearVector"]),
        "limit": int(args.get("limit", 20)),
        "offset": int(args.get("offset", 0)),
        "fields": fields,
    }


def _get_spec(class_field: dict, **extra: Any) -> GetSpec:
    args = class_field["args"]
    known = {"where", "nearVector", "bm25", "hybrid", "sort", "limit",
             "offset", "after", "autocut", "tenant", "groupBy"}
    unknown = set(args) - known
    if unknown:
        raise ValueError(f"unknown Get arguments: {sorted(unknown)}")

    legs = [k for k in ("hybrid", "bm25", "nearVector") if args.get(k)]
    if len(legs) > 1:
        # explorer.go:224
        raise ValueError(
            "conflict: both near<Media> and keyword-based (bm25) arguments "
            "present, choose one"
        )

    select, metadata = [], []
    feature_projection = None
    for f in class_field["fields"]:
        if f["name"] == "_additional":
            metadata = [sf["name"] for sf in f["fields"]]
            for sf in f["fields"]:
                # featureProjection(dimensions:…, perplexity:…, …)
                # (projector_graphql_field.go argument set) — parsed
                # into the post-stage's params
                if sf["name"] == "featureProjection":
                    a = sf["args"]
                    feature_projection = {
                        snake: a[camel]
                        for camel, snake in (
                            ("algorithm", "algorithm"),
                            ("dimensions", "dimensions"),
                            ("perplexity", "perplexity"),
                            ("iterations", "iterations"),
                            ("learningRate", "learning_rate"),
                        ) if camel in a
                    }
        elif not f["fields"]:
            select.append(f["name"])
        # ref-resolution subselections compile via operators/refs.py;
        # surfacing them from GraphQL selections is not wired yet
    merged_extra = dict(extra)
    if metadata:
        merged_extra["metadata"] = metadata
    if feature_projection is not None:
        merged_extra["feature_projection"] = feature_projection
    if args.get("tenant"):
        merged_extra["tenant"] = str(args["tenant"])
    if args.get("groupBy"):
        merged_extra["group_by"] = args["groupBy"]

    return GetSpec(
        collection=class_field["name"],
        where=_convert_where(args["where"]) if args.get("where") else None,
        near_vector=_convert_near_vector(args["nearVector"]) if args.get("nearVector") else None,
        bm25=_convert_bm25(args["bm25"]) if args.get("bm25") else None,
        hybrid=_convert_hybrid(args["hybrid"]) if args.get("hybrid") else None,
        sort=_convert_sort(args["sort"]) if args.get("sort") else [],
        limit=int(args["limit"]) if args.get("limit") is not None else None,
        offset=int(args.get("offset", 0)),
        after=str(args["after"]) if args.get("after") else None,
        select=select,
        autocut=int(args.get("autocut", 0)),
        extra=merged_extra,
    )


# GraphQL aggregator field name -> AggregateSpec aggregator name
_AGG_FIELDS = {
    "count", "type", "sum", "mean", "median", "mode", "minimum", "maximum",
    "totalTrue", "totalFalse", "percentageTrue", "percentageFalse",
    "pointingTo", "topOccurrences",
}


def _aggregate_spec(class_field: dict) -> AggregateSpec:
    args = class_field["args"]
    known = {"where", "groupBy", "limit", "objectLimit", "tenant"}
    unknown = set(args) - known
    if unknown:
        raise ValueError(f"unknown Aggregate arguments: {sorted(unknown)}")
    group_by = None
    if args.get("groupBy"):
        gb = args["groupBy"]
        path = gb["path"] if isinstance(gb, dict) else gb
        if isinstance(path, (str, _Enum)):
            path = [str(path)]
        if len(path) != 1:
            raise ValueError("Aggregate groupBy: exactly one property path supported")
        group_by = str(path[0])

    include_meta = False
    props: list[PropertyAgg] = []
    for f in class_field["fields"]:
        if f["name"] == "meta":
            if any(sf["name"] == "count" for sf in f["fields"]):
                include_meta = True
            continue
        if f["name"] == "groupedBy":
            continue  # implied by groupBy arg
        aggs = [sf["name"] for sf in f["fields"]]
        bad = [a for a in aggs if a not in _AGG_FIELDS]
        if bad:
            raise ValueError(f"unknown aggregators for {f['name']}: {bad}")
        props.append(PropertyAgg(prop=f["name"], aggregators=aggs))

    return AggregateSpec(
        collection=class_field["name"],
        properties=props,
        where=_convert_where(args["where"]) if args.get("where") else None,
        group_by=group_by,
        include_meta_count=include_meta,
        limit=int(args["limit"]) if args.get("limit") is not None else None,
    )


def parse_graphql(src: str, **extra: Any):
    """GraphQL document -> GetSpec (for `Get`) or AggregateSpec (for
    `Aggregate`). Exactly one root and one class selection, matching the
    per-resolver execution of the reference's handler."""
    roots = parse_document(src)
    if len(roots) != 1:
        raise ValueError("expected exactly one root field (Get or Aggregate)")
    root = roots[0]
    if root["name"] == "Explore":
        if extra:
            raise ValueError("extra spec options are not supported for Explore")
        return _explore_spec(root)
    if len(root["fields"]) != 1:
        raise ValueError(f"{root['name']}: expected exactly one class selection")
    cls = root["fields"][0]
    if root["name"] == "Get":
        return _get_spec(cls, **extra)
    if root["name"] == "Aggregate":
        if extra:
            raise ValueError("extra spec options are not supported for Aggregate")
        return _aggregate_spec(cls)
    raise ValueError(
        f"unsupported root field {root['name']!r}; use Get, Aggregate, or Explore"
    )
