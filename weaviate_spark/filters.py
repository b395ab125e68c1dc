"""The `where` filter algebra: a recursive clause tree compiled to a single
Catalyst ``Column`` predicate.

Mirrors weaviate's filter IR (reference: entities/filters/filters.go:24-40
operator enum, :155-160 Clause{operator, path ("on"), value, operands}) and
the execution semantics of adapters/repos/db/inverted/searcher.go — but the
execution is entirely Catalyst: every predicate compiles to built-in column
expressions, so predicate pushdown to the Parquet scan, partition pruning,
and whole-stage codegen are free. No UDFs anywhere in this module.

Semantics pinned from the reference:

* ``Like`` (inverted/like_regexp.go:40-57): ``?`` = exactly one char,
  ``*`` = zero-or-more, anchored both ends. We additionally rewrite the
  pure-prefix pattern ``abc*`` to ``startswith`` so Catalyst pushes a
  StartsWith filter into the scan (the reference's "prefix optimization").
  With ``tokenization`` set on the clause, Like matches PER TOKEN
  (row_reader.go:152-190 — the regex runs against inverted-index keys),
  so Like 'qui*' matches 'The quick fox' on a word-tokenized property.
* ``NotEqual`` / ``Not`` (inverted/searcher.go:1609-1655): weaviate's
  bitmap complement is TWO-VALUED — a row whose property is null is
  simply "not in the match set", so NOT(match) INCLUDES null rows.
  Spark's 3-valued logic would drop them, so every negation wraps its
  operand in ``coalesce(expr, false)`` first.
* ``ContainsAny/All/None`` (searcher.go:1253-1455): on scalar columns,
  desugared OR/AND of equals (= ``isin``); on array columns, element
  overlap / superset tests.
* ``WithinGeoRange`` (vector/geo/geo.go:77-110 with the haversine
  distancer hnsw/distancer/geo_spatial.go): closed-form haversine on the
  struct fields, compared in meters.
* ``len(prop)`` (entities/schema/data_types.go:136-143): char count for
  text, element count for arrays.
* Three-valued logic at the root: the final predicate is wrapped in
  ``coalesce(pred, false)`` so a filter never *keeps* a null-valued row.

Scale: all of this is row-local (narrow); no shuffles. Filters on
partition columns (e.g. `_tenant`) prune partitions for free.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# IR

OPERATORS = {
    "Equal", "NotEqual", "GreaterThan", "GreaterThanEqual", "LessThan",
    "LessThanEqual", "Like", "IsNull", "WithinGeoRange", "ContainsAny",
    "ContainsAll", "ContainsNone", "And", "Or", "Not",
}


@dataclass
class GeoRange:
    """entities/filters/filters.go:162-167."""

    latitude: float
    longitude: float
    distance_meters: float


@dataclass
class Clause:
    """One node of the where tree (entities/filters/filters.go:155-160).

    ``tokenization``: set to the property's tokenization mode to get
    weaviate's tokenized-Equal semantics on text (row_reader.go:76-91 —
    Equal on a word-tokenized property matches per-token, so
    Equal("Quick") hits "the quick fox").
    """

    operator: str
    path: Sequence[str] = ()
    value: Any = None
    operands: Sequence["Clause"] = field(default_factory=list)
    tokenization: str | None = None

    def __post_init__(self) -> None:
        if self.operator not in OPERATORS:
            raise ValueError(f"unknown where operator: {self.operator!r}")


# ---------------------------------------------------------------------------
# Like translation (inverted/like_regexp.go:40-46)

_LIKE_PREFIX = re.compile(r"^[^*?]*\*$")


def like_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def compile_like(col: Column, pattern: str) -> Column:
    if "*" not in pattern and "?" not in pattern:
        return col == F.lit(pattern)
    if _LIKE_PREFIX.match(pattern):
        # prefix optimization (like_regexp.go:48-57) -> pushdown-able
        return col.startswith(pattern[:-1])
    return col.rlike(like_to_regex(pattern))


def compile_like_tokenized(col: Column, pattern: str, mode: str) -> Column:
    """Tokenization-aware Like: the reference evaluates the Like regex
    against inverted-index KEYS (row_reader.go:152-190), i.e. per-token
    on tokenized text properties — Like 'qui*' matches 'The quick fox'.
    The PATTERN is tokenized with wildcards preserved
    (TokenizeWithWildcardsForClass, searcher.go:890-897: 'qui* fo?'
    becomes the terms ['qui*', 'fo?']) and multi-term patterns AND —
    every pattern term must match at least one token (searcher.go:937).
    Same prefix optimization, applied per term per token."""
    from weaviate_spark.functions.text import (
        tokenize, tokenize_with_wildcards_py,
    )

    toks = tokenize(col, mode)
    terms = tokenize_with_wildcards_py(pattern, mode) or [pattern]

    def term_pred(term: str) -> Column:
        if "*" not in term and "?" not in term:
            return F.array_contains(toks, term)
        if _LIKE_PREFIX.match(term):
            prefix = term[:-1]
            return F.exists(toks, lambda t: t.startswith(prefix))
        rx = like_to_regex(term)
        return F.exists(toks, lambda t: t.rlike(rx))

    pred = term_pred(terms[0])
    for term in terms[1:]:
        pred = pred & term_pred(term)
    return pred


# ---------------------------------------------------------------------------
# Geo (hnsw/distancer/geo_spatial.go — haversine, meters)

EARTH_RADIUS_M = 6_371_000.0


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


# ---------------------------------------------------------------------------
# Compiler

def _two_valued_not(pred: Column) -> Column:
    """Negate under weaviate's two-valued bitmap semantics: null -> matches."""
    return ~F.coalesce(pred, F.lit(False))


_LEN_PATH = re.compile(r"^len\((.+)\)$")


def _resolve(df: DataFrame, path: Sequence[str]) -> tuple[Column, Any]:
    """Resolve a property path to (Column, Spark DataType).

    Supported path shapes (entities/filters/filters.go path resolution):
    * direct columns and nested-struct fields (a.b.c);
    * ``len(prop)`` pseudo-path (schema/data_types.go:136-143): char
      count for text, element count for arrays;
    * reserved `_id` / `_creationTimeUnix` / `_lastUpdateTimeUnix`
      (searcher.go:789,816) — plain columns here.
    Ref-property paths (semi-joins, searcher_ref_filter.go) are handled
    a level up (operators/refs.py) because they need a second table.
    """
    if len(path) == 1 and (m := _LEN_PATH.match(path[0])):
        inner, dtype = _resolve(df, m.group(1).split("."))
        if isinstance(dtype, T.ArrayType):
            return F.size(inner), T.IntegerType()
        return F.length(inner), T.IntegerType()

    name = ".".join(path)
    col = F.col(name)
    dtype: Any = None
    cur: Any = dict(zip(df.schema.fieldNames(), df.schema.fields))
    for p in path:
        if isinstance(cur, dict):
            f_ = cur.get(p)
        elif isinstance(cur, T.StructType):
            f_ = cur[p] if p in cur.fieldNames() else None
        else:
            f_ = None
        if f_ is None:
            dtype = None
            break
        dtype = f_.dataType
        cur = dtype
    return col, dtype


def _is_array(dtype: Any) -> bool:
    return isinstance(dtype, T.ArrayType)


def _compile_on_struct(x: Column, stype: T.StructType, clause: Clause) -> Column:
    """Compile a scalar sub-clause against a struct lambda variable
    (nested object[] filters, searcher_nested_executor_recursive.go)."""
    col: Column = x
    dtype: Any = stype
    for p in clause.path:
        col = col[p]
        if isinstance(dtype, T.StructType) and p in dtype.fieldNames():
            dtype = dtype[p].dataType
        else:
            dtype = None
    op, v = clause.operator, clause.value
    if op == "Equal":
        return col == F.lit(v)
    if op == "NotEqual":
        return _two_valued_not(col == F.lit(v))
    if op == "GreaterThan":
        return col > F.lit(v)
    if op == "GreaterThanEqual":
        return col >= F.lit(v)
    if op == "LessThan":
        return col < F.lit(v)
    if op == "LessThanEqual":
        return col <= F.lit(v)
    if op == "Like":
        return compile_like(col, v)
    if op == "IsNull":
        want_null = bool(v) if v is not None else True
        return col.isNull() if want_null else col.isNotNull()
    raise ValueError(f"operator {op} not supported inside object[] paths")


def compile_where(df: DataFrame, clause: Clause) -> Column:
    """Compile a clause tree to a Column predicate (not yet null-wrapped)."""
    op = clause.operator

    if op in ("And", "Or"):
        if not clause.operands:
            raise ValueError(f"{op} requires operands")
        preds = [compile_where(df, c) for c in clause.operands]
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if op == "And" else (out | p)
        return out
    if op == "Not":
        if len(clause.operands) != 1:
            raise ValueError("Not takes exactly one operand")
        return _two_valued_not(compile_where(df, clause.operands[0]))

    # nested object[] path: [arrayProp, sub, ...] -> exists(arr, x -> pred)
    # (searcher_nested.go / nested plan+executor; object[] semantics:
    # the row matches if ANY element matches)
    if len(clause.path) > 1:
        head_dtype = (
            df.schema[clause.path[0]].dataType if clause.path[0] in df.columns else None
        )
        if isinstance(head_dtype, T.ArrayType) and isinstance(
            head_dtype.elementType, T.StructType
        ):
            sub = Clause(
                operator=op, path=list(clause.path[1:]), value=clause.value,
                tokenization=clause.tokenization,
            )
            return F.exists(
                F.col(clause.path[0]),
                lambda x: _compile_on_struct(x, head_dtype.elementType, sub),
            )

    col, dtype = _resolve(df, clause.path)
    v = clause.value

    if op == "IsNull":
        want_null = bool(v) if v is not None else True
        return col.isNull() if want_null else col.isNotNull()
    if _is_array(dtype) and op in (
        "Equal", "NotEqual", "GreaterThan", "GreaterThanEqual",
        "LessThan", "LessThanEqual", "Like",
    ):
        # scalar operators on ARRAY properties match per ELEMENT — the
        # reference's inverted index stores one key per element, so
        # Equal/range/Like on text[]/number[] is an EXISTS over elements
        # (filters_value.go array branches; row readers see element
        # keys). NotEqual keeps two-valued semantics over the exists.
        et = dtype.elementType

        if (
            op in ("Equal", "NotEqual")
            and clause.tokenization
            and isinstance(et, T.StringType)
        ):
            # tokenized Equal on text[]: the inverted index is DOC-level —
            # one posting per token regardless of which element produced
            # it, and searcher.go ANDs the per-token doc bitmaps
            # (inverted/searcher.go OperatorAnd over propValuePairs). So
            # each query token must appear in SOME element, not all in
            # one: ['quick fox','lazy dog'] matches Equal 'quick dog'.
            from weaviate_spark.functions.text import tokenize, tokenize_py

            target = tokenize_py(str(v), clause.tokenization)
            if not target:
                tok_pred = F.lit(False)
            else:
                def _has_token(t: str) -> Column:
                    return F.exists(
                        col,
                        lambda e: F.array_contains(
                            tokenize(e, clause.tokenization), t
                        ),
                    )

                tok_pred = _has_token(target[0])
                for t in target[1:]:
                    tok_pred = tok_pred & _has_token(t)
            return _two_valued_not(tok_pred) if op == "NotEqual" else tok_pred

        def _elem(e: Column) -> Column:
            if op in ("Equal", "NotEqual"):
                return e == F.lit(v)
            if op == "Like":
                if clause.tokenization and isinstance(et, T.StringType):
                    return compile_like_tokenized(e, v, clause.tokenization)
                return compile_like(e, v)
            if op == "GreaterThan":
                return e > F.lit(v)
            if op == "GreaterThanEqual":
                return e >= F.lit(v)
            if op == "LessThan":
                return e < F.lit(v)
            return e <= F.lit(v)

        exists = F.exists(col, _elem)
        return _two_valued_not(exists) if op == "NotEqual" else exists
    if op == "Equal":
        if clause.tokenization and isinstance(dtype, T.StringType):
            # tokenized Equal: per-token match (row_reader.go:76-91)
            from weaviate_spark.functions.text import tokenize, tokenize_py

            toks = tokenize(col, clause.tokenization)
            target = tokenize_py(str(v), clause.tokenization)
            if not target:
                return F.lit(False)
            out = F.array_contains(toks, target[0])
            for t in target[1:]:
                out = out & F.array_contains(toks, t)
            return out
        return col == F.lit(v)
    if op == "NotEqual":
        return _two_valued_not(col == F.lit(v))
    if op == "GreaterThan":
        return col > F.lit(v)
    if op == "GreaterThanEqual":
        return col >= F.lit(v)
    if op == "LessThan":
        return col < F.lit(v)
    if op == "LessThanEqual":
        return col <= F.lit(v)
    if op == "Like":
        if clause.tokenization and isinstance(dtype, T.StringType):
            return compile_like_tokenized(col, v, clause.tokenization)
        return compile_like(col, v)
    if op == "WithinGeoRange":
        g = v if isinstance(v, GeoRange) else GeoRange(**v)
        d = haversine_meters(
            col.getField("latitude"), col.getField("longitude"),
            F.lit(g.latitude), F.lit(g.longitude),
        )
        pred = d <= F.lit(g.distance_meters)
        # bounding-box prefilter: a strict SUPERSET of the circle, as
        # simple comparisons on the struct fields — these push into the
        # parquet scan (nested predicate pushdown + row-group min/max
        # pruning), so at scale the haversine only runs on rows inside
        # the box instead of the whole table. 110 574 m/deg is the
        # MINIMUM meridian degree length; dividing by it over-covers.
        import math as _math

        dlat = g.distance_meters / 110_574.0
        lo, hi = g.latitude - dlat, g.latitude + dlat
        pred = (
            (col.getField("latitude") >= F.lit(lo))
            & (col.getField("latitude") <= F.lit(hi))
            & pred
        )
        max_abs_lat = min(max(abs(lo), abs(hi)), 90.0)
        if max_abs_lat < 89.0:
            # longitude degree length shrinks by cos(lat); use the
            # band's worst case and over-cover slightly
            dlon = g.distance_meters / (
                111_320.0 * _math.cos(_math.radians(max_abs_lat))
            ) * 1.001
            wlo, whi = g.longitude - dlon, g.longitude + dlon
            if wlo > -180.0 and whi < 180.0:  # skip on antimeridian wrap
                pred = (
                    (col.getField("longitude") >= F.lit(wlo))
                    & (col.getField("longitude") <= F.lit(whi))
                    & pred
                )
        return pred
    if op in ("ContainsAny", "ContainsAll", "ContainsNone"):
        vals = list(v)
        if _is_array(dtype):
            arr = F.array(*[F.lit(x) for x in vals])
            if op == "ContainsAny":
                return F.arrays_overlap(col, arr)
            if op == "ContainsAll":
                return F.forall(arr, lambda x: F.array_contains(col, x))
            return _two_valued_not(F.arrays_overlap(col, arr))
        if op == "ContainsAny":
            return col.isin(vals)
        if op == "ContainsAll":
            # scalar ContainsAll: AND of equals (searcher.go:414) — only
            # satisfiable when all values equal; keep reference semantics.
            out = col == F.lit(vals[0])
            for x in vals[1:]:
                out = out & (col == F.lit(x))
            return out
        return _two_valued_not(col.isin(vals))

    raise ValueError(f"unhandled operator {op}")


_TEXT_ONLY_OPS = {"Like"}
_COMPOUND_OPS = {"And", "Or", "Not"}
_LIST_VALUE_OPS = {"ContainsAny", "ContainsAll", "ContainsNone"}


def validate_where(df: DataFrame, clause: Clause) -> None:
    """Pre-compile validation mirroring entities/filters/filters_validator.go:
    operator/type compatibility, operand arity, value shape. Raises
    ValueError with a weaviate-style message; compile_where would often
    surface these as opaque Spark analysis errors instead."""
    op = clause.operator
    if op in _COMPOUND_OPS:
        if op == "Not" and len(clause.operands) != 1:
            raise ValueError("operator Not requires exactly one operand")
        if op in ("And", "Or") and not clause.operands:
            raise ValueError(f"operator {op} requires at least one operand")
        for c in clause.operands:
            validate_where(df, c)
        return
    if not clause.path:
        raise ValueError(f"operator {op} requires a property path")
    if op in _LIST_VALUE_OPS and not isinstance(clause.value, (list, tuple)):
        raise ValueError(f"operator {op} requires a list value")
    if op in _LIST_VALUE_OPS and not clause.value:
        raise ValueError(f"operator {op} requires a non-empty value list")
    # reference validator rules (filters_validator.go:118-143)
    if op == "IsNull" and not isinstance(clause.value, bool):
        raise ValueError(
            f"operator IsNull requires a booleanValue, got {type(clause.value).__name__} instead"
        )
    if len(clause.path) == 1 and (m := _LEN_PATH.match(clause.path[0])):
        if isinstance(clause.value, bool) or not isinstance(clause.value, int):
            raise ValueError(
                "Filtering for property length requires IntValue, "
                f"got {type(clause.value).__name__!r} instead"
            )
        if op not in ("Equal", "NotEqual", "GreaterThan", "GreaterThanEqual",
                      "LessThan", "LessThanEqual"):
            raise ValueError(
                "Filtering for property length supports operators (not) equal "
                f"and greater/less than (equal), got {op} instead"
            )
        if clause.value < 0:
            raise ValueError(
                f"Can only filter for positive property length got {clause.value} instead"
            )
        inner = m.group(1).split(".")
        if inner[0] not in df.columns:
            raise ValueError(f'no such prop with name {inner[0]!r} found in class')
        return
    # full path resolution: the head segment must exist; nested segments
    # must resolve through struct fields (filters_validator.go:70-93 —
    # the resolver rejects unknown classes/properties up front instead
    # of surfacing an opaque execution error)
    head = clause.path[0]
    if head not in df.columns:
        raise ValueError(f'no such prop with name {head!r} found in class')
    if len(clause.path) > 1:
        # lenient walk that also descends through object[] hops
        # (array<struct>), which compile handles via lambda recursion
        cur: Any = df.schema
        ok = True
        for p in clause.path:
            if isinstance(cur, T.ArrayType):
                cur = cur.elementType
            if isinstance(cur, T.StructType):
                if p not in cur.fieldNames():
                    ok = False
                    break
                cur = cur[p].dataType
            else:
                ok = False
                break
        if not ok:
            raise ValueError(
                f'no such nested prop path {".".join(clause.path)!r} found in class'
            )
    _, dtype = _resolve(df, clause.path)
    if dtype is not None:
        is_texty = isinstance(dtype, T.StringType) or (
            isinstance(dtype, T.ArrayType)
            and isinstance(dtype.elementType, T.StringType)
        )
        if op in _TEXT_ONLY_OPS and not is_texty:
            raise ValueError(
                f"operator Like is only supported on text properties, "
                f"but {'.'.join(clause.path)} is {dtype.simpleString()}"
            )
        if op == "WithinGeoRange" and not isinstance(dtype, T.StructType):
            raise ValueError(
                f"operator WithinGeoRange requires a geoCoordinates property, "
                f"but {'.'.join(clause.path)} is {dtype.simpleString()}"
            )


def apply_where(df: DataFrame, clause: Clause | None) -> DataFrame:
    """Filter df by the clause tree.

    No null-wrapping at the root: SQL WHERE already drops rows whose
    predicate is NULL, and a ``coalesce(pred, false)`` wrapper would block
    Parquet filter pushdown (observed: PushedFilters becomes empty).
    Two-valued negation semantics are handled inside Not/NotEqual/
    ContainsNone, the only places they matter.
    """
    if clause is None:
        return df
    validate_where(df, clause)
    return df.where(compile_where(df, clause))
