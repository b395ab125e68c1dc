"""Object validation (POST /v1/objects/validate + the per-write gate).

Reference: usecases/objects/validation/model_validation.go (Object,
ValidateSingleRef, ErrorMissingClass :51, ErrorNotFoundInDatabase
:61), properties_validation.go (per-type validators :255-770 with
their exact wrapper texts), phone_numbers.go, vector_validation.go.

``validate_object`` checks ONE json-decoded object against the
collection schema and raises ``ObjectValidationError`` with the
reference's error string (first error wins, like Validator.Object).
``validate_objects_df`` is the ingest-scale variant: an Arrow-batched
pass over a JSON column producing (ok, error) per row — the gate a
100-TB semi-structured load runs before ``insert_batch_with_report``
(which handles the per-object SUCCESS/FAILED report and the upsert).

Type-name rendering: Go's ``%T`` prints the json-decoded Go type; the
python analogue maps str→string, bool→bool, float→float64, int→int64,
dict→``map[string]interface {}``, list→``[]interface {}``,
None→``<nil>`` so the common error strings match the reference
byte-for-byte on json-shaped input (a json.Number never reaches the
python decoder, so int renders as int64 — documented divergence).
"""

from __future__ import annotations

import base64
import binascii
import re
import uuid as _uuid
from datetime import datetime
from typing import Callable, Optional

from weaviate_spark.schema import WEAVIATE_TO_SPARK, Collection

ERROR_MISSING_CLASS = "the given class is empty"

_GO_TYPES = {str: "string", bool: "bool", float: "float64", int: "int64",
             dict: "map[string]interface {}", list: "[]interface {}",
             type(None): "<nil>"}


class ObjectValidationError(ValueError):
    pass


def _t(v) -> str:
    return _GO_TYPES.get(type(v), type(v).__name__)


def _err(msg: str) -> "ObjectValidationError":
    return ObjectValidationError(msg)


def _rfc3339(s) -> bool:
    if not isinstance(s, str):
        return False
    try:
        datetime.fromisoformat(s.replace("Z", "+00:00"))
        return "T" in s
    except ValueError:
        return False


def _is_uuid(s) -> bool:
    if not isinstance(s, str):
        return False
    try:
        _uuid.UUID(s)
        return True
    except ValueError:
        return False


_BASE64_RE = re.compile(
    r"^(?:[A-Za-z0-9+/]{4})*"
    r"(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$")


def _coordinate(raw, which: str) -> float:
    # parseCoordinate: json.Number or float
    if isinstance(raw, bool) or not isinstance(raw, (int, float)):
        raise _err(f"invalid {which}: must be json.Number or float, "
                   f"but got {_t(raw)}")
    return float(raw)


def _scalar(dt: str, p: str, c: str, v, exists_fn, tenant):
    """validateDataValueAndType's per-type switch with the exact
    wrapper texts (properties_validation.go:255-365)."""
    def wrap(kind: str, inner: str):
        raise _err(f"invalid {kind} property '{p}' on class '{c}': {inner}")

    if dt in ("text", "string"):
        if not isinstance(v, str):
            wrap(dt, f"not a string, but {_t(v)}")
    elif dt == "uuid":
        if not _is_uuid(v):
            wrap("uuid", "requires a string of UUID format, but the "
                 f"given value is '{v}'")
    elif dt == "int":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            wrap("integer", f"requires an integer, the given value is '{v}'")
        if isinstance(v, float) and v != int(v):
            wrap("integer", f"requires an integer, the given value is '{v}'")
    elif dt == "number":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            wrap("number", f"requires a float, the given value is '{v}'")
    elif dt == "boolean":
        if not isinstance(v, bool):
            wrap("boolean", f"not a bool, but {_t(v)}")
    elif dt == "date":
        if not _rfc3339(v):
            wrap("date", "requires a string with a RFC3339 formatted "
                 f"date, but the given value is '{v}'")
    elif dt == "geoCoordinates":
        if not isinstance(v, dict):
            wrap("geoCoordinates",
                 f"geoCoordinates must be a map, but got: {_t(v)}")
        for fld in ("longitude", "latitude"):
            if fld not in v:
                wrap("geoCoordinates", "geoCoordinates is missing "
                     f"required field '{fld}'")
        try:
            _coordinate(v["longitude"], "longitude")
            _coordinate(v["latitude"], "latitude")
        except ObjectValidationError as ex:
            wrap("geoCoordinates", str(ex))
    elif dt == "phoneNumber":
        if not isinstance(v, dict):
            wrap("phoneNumber",
                 f"phoneNumber must be a map, but got: {_t(v)}")
        if "input" not in v:
            wrap("phoneNumber",
                 "phoneNumber is missing required field 'input'")
        if not isinstance(v["input"], str):
            wrap("phoneNumber", "phoneNumber.input must be a string")
        dc = v.get("defaultCountry", "")
        if not isinstance(dc, str):
            wrap("phoneNumber",
                 "phoneNumber.defaultCountry must be a string")
        # phone_numbers.go:28-32: a number in national format (no
        # +/00 international prefix) REQUIRES defaultCountry; the full
        # struct parse lives in functions/phone.parse_phone
        digits = re.sub(r"[^0-9+]", "", v["input"])
        intl = digits.startswith("+") or digits.startswith("00")
        if not intl and not dc:
            wrap("phoneNumber", "invalid phone number: invalid or "
                 "missing defaultCountry - this field is optional if "
                 "the specified number is in the international format, "
                 "but required if the number is in national format, "
                 "use ISO 3166-1 alpha-2")
    elif dt in ("blob", "blobHash"):
        if not isinstance(v, str):
            wrap(dt, f"not a blob base64 string, but {_t(v)}")
        if not _BASE64_RE.match(v):
            wrap(dt, "not a valid blob base64 string")
        try:
            base64.b64decode(v, validate=True)
        except (binascii.Error, ValueError):
            wrap(dt, "not a valid blob base64 string")
    else:
        raise _err(f"unrecognized data type '{dt}'")


_ARRAY_KIND = {"text[]": ("text", "text"), "string[]": ("string", "string"),
               "int[]": ("integer", "integer"),
               "number[]": ("number", "integer"),  # numberArrayVal reuses
               # the integer texts (properties_validation.go:698-708)
               "boolean[]": ("boolean", "boolean"),
               "date[]": ("date", "date"), "uuid[]": ("uuid", "uuid")}


def _array(dt: str, p: str, c: str, v):
    kind, inner_kind = _ARRAY_KIND[dt]
    base = dt[:-2]
    article = "an" if inner_kind == "integer" else "a"

    def wrap(inner: str):
        raise _err(f"invalid {kind} array property '{p}' on class "
                   f"'{c}': {inner}")

    if not isinstance(v, list):
        wrap(f"not {article} {inner_kind} array, but {_t(v)}")
    for item in v:
        ok = {
            "text": lambda x: isinstance(x, str),
            "string": lambda x: isinstance(x, str),
            "int": lambda x: not isinstance(x, bool)
            and isinstance(x, (int, float))
            and (not isinstance(x, float) or x == int(x)),
            "number": lambda x: not isinstance(x, bool)
            and isinstance(x, (int, float)),
            "boolean": lambda x: isinstance(x, bool),
            "date": _rfc3339,
            "uuid": _is_uuid,
        }[base](item)
        if not ok:
            wrap(f"invalid {inner_kind} array value: {item}")


def _cref(p: str, c: str, v, exists_fn: Optional[Callable],
          tenant: str) -> None:
    """cRef + parseAndValidateSingleRef
    (properties_validation.go:370-405,583-630)."""
    if isinstance(v, dict):
        raise _err("invalid cref: reference must be an array, but got "
                   f"a map: {v!r}")
    if not isinstance(v, list):
        raise _err("invalid cref: invalid ref type. Needs to be []map, "
                   f"got {_t(v)}")
    for ref in v:
        if not isinstance(ref, dict):
            raise _err(f"invalid cref: multiple references in {c}.{p} "
                       f"should be a list of maps, but we got: {_t(ref)}")
        ref = {k: x for k, x in ref.items() if k != "href"}
        if len(ref) != 1:
            raise _err(
                "invalid cref: only direct references supported at the "
                "moment, concept references not supported yet: class "
                f"'{c}' with property '{p}' requires exactly 1 "
                f"arguments: 'beacon'. Check your input schema, got: "
                f"{ref!r}")
        if "beacon" not in ref:
            raise _err(
                "invalid cref: only direct references supported at the "
                "moment, concept references not supported yet:  class "
                f"'{c}' with property '{p}' requires exactly 1 "
                "argument: 'beacon' is missing, check your input schema")
        beacon = ref["beacon"]
        m = re.match(
            r"^weaviate://(?P<host>[^/]+)/((?P<cls>[A-Z][\w]*)/)?"
            r"(?P<id>[0-9a-fA-F-]{36})$", str(beacon))
        if not m or not _is_uuid(m.group("id")):
            raise _err("invalid cref: invalid reference: expected "
                       f"beacon in the weaviate://localhost/<className>"
                       f"/<uuid> format, but got: {beacon}")
        if m.group("host") != "localhost":
            raise _err("invalid cref: unrecognized cross-ref ref format")
        if exists_fn is not None:
            target_cls = m.group("cls") or ""
            target_id = m.group("id").lower()
            if not exists_fn(target_cls, target_id, tenant):
                raise _err(f"invalid cref: 'cref' {c}:{p}: no object "
                           f"with id {target_id} found")


DEFAULT_NAMED_VECTOR = "default"  # modelsext.DefaultNamedVectorName


def _is_float_array(v) -> bool:
    return isinstance(v, list) and all(
        isinstance(x, (int, float)) and not isinstance(x, bool)
        for x in v)


def _validate_vector(obj: dict, coll: Collection) -> None:
    """Validator.vector (vector_validation.go:22-89), in the
    reference's check order. Our Collection maps: legacy single index
    = ``vector_dim`` set; named spaces = ``named_vectors``; a dropped
    index = index type 'none' (vector_index_type /
    named_vector_index_types)."""
    vectors = obj.get("vectors") or {}
    has_legacy = coll.vector_dim is not None
    # default-named vector transports the legacy vector (:27-34)
    if DEFAULT_NAMED_VECTOR in vectors and has_legacy:
        vec = vectors[DEFAULT_NAMED_VECTOR]
        if not _is_float_array(vec):
            raise _err(f"vector {DEFAULT_NAMED_VECTOR} has to be a "
                       "float32 array")
        obj["vector"] = vec
        vectors = {k: v for k, v in vectors.items()
                   if k != DEFAULT_NAMED_VECTOR}
        obj["vectors"] = vectors
    # a legacy vector on a named-vectors-only class (:36-54)
    if not has_legacy and obj.get("vector"):
        if len(coll.named_vectors) == 1:
            (name,) = coll.named_vectors
            obj["vectors"] = {name: obj.pop("vector")}
            return
        raise _err(f"collection {coll.name} configuration does not "
                   "have single vector index")
    incoming = []
    for name in vectors:
        if name not in coll.named_vectors:
            raise _err(f"collection {coll.name} does not have "
                       f"configuration for vector {name}")
        if coll.named_vector_index_types.get(name) == "none":
            raise _err(f"vector index for {name} was dropped; writes "
                       "targeting it are rejected")
        incoming.append(name)
    if not coll.named_vectors and incoming:
        raise _err(f"collection {coll.name} is configured without "
                   "multiple named vectors, but received named "
                   f"vectors: {incoming}")


def validate_object(
    obj: dict,
    coll: Optional[Collection],
    *,
    auto_schema: bool = False,
    exists_fn: Optional[Callable[[str, str, str], bool]] = None,
    tenant: str = "",
) -> None:
    """Validator.Object (model_validation.go:92-103): first error wins,
    raised as ObjectValidationError with the reference's text. ``obj``
    is the json-decoded object: {"class": ..., "properties": {...}}.
    ``exists_fn(class, id, tenant) -> bool`` enables ref existence
    checks (ValidateExistence); omit to skip them (the validate
    endpoint's dry-run mode still checks shape + beacon format)."""
    class_name = obj.get("class", "")
    if not class_name:
        raise _err(ERROR_MISSING_CLASS)
    if coll is not None:
        # vector checks run before properties (Object(),
        # model_validation.go:92-103)
        _validate_vector(obj, coll)
    props = obj.get("properties")
    if props is None:
        return
    if not isinstance(props, dict):
        raise _err(f"could not recognize object's properties: {props!r}")
    for pname, pval in props.items():
        if pval is None:
            continue
        try:
            prop = coll.property(pname) if coll else None
        except KeyError:
            prop = None
        if prop is None:
            if auto_schema:
                continue  # auto-schema infers it on write
            raise _err(f"unknown property '{pname}'")
        dt = prop.data_type
        if prop.is_reference():
            _cref(pname, class_name, pval, exists_fn, tenant)
        elif dt in _ARRAY_KIND:
            _array(dt, pname, class_name, pval)
        elif dt == "object" or dt == "object[]":
            items = pval if dt == "object[]" else [pval]
            if dt == "object[]" and not isinstance(pval, list):
                raise _err(f"invalid object[] property '{pname}' on "
                           f"class '{class_name}': not an object "
                           f"array, but {_t(pval)}")
            for i, item in enumerate(items):
                if not isinstance(item, dict):
                    raise _err(f"invalid object property '{pname}' on "
                               f"class '{class_name}': object must be "
                               f"a map, but got: {_t(item)}")
        elif dt in WEAVIATE_TO_SPARK or dt in ("blob", "blobHash"):
            _scalar(dt, pname, class_name, pval, exists_fn, tenant)
        else:
            raise _err(f"unrecognized data type '{dt}'")


def validate_objects_df(df, json_col: str, coll: Collection, *,
                        auto_schema: bool = False):
    """The ingest-scale gate: one Arrow-batched pass over a JSON-string
    column → (ok boolean, error string) appended. Runs the same
    validator per object; malformed JSON reports its parse error. Ref
    existence checks are deliberately absent here (they would be a
    per-row point lookup — batch ingestion validates refs against the
    target table with one semi-join instead; see operators/refs.py)."""
    import json

    import pandas as pd

    def _val(iterator):
        for pdf in iterator:
            oks, errs = [], []
            for s in pdf[json_col]:
                try:
                    obj = json.loads(s)
                    validate_object(obj, coll, auto_schema=auto_schema)
                    oks.append(True)
                    errs.append(None)
                except ObjectValidationError as ex:
                    oks.append(False)
                    errs.append(str(ex))
                except (json.JSONDecodeError, TypeError,
                        AttributeError) as ex:
                    oks.append(False)
                    errs.append(f"invalid json: {ex}")
            out = pdf.copy()
            out["ok"] = pd.Series(oks, index=pdf.index, dtype="boolean")
            out["error"] = errs
            yield out

    import pyspark.sql.types as T

    schema = T.StructType(df.schema.fields + [
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ])
    return df.mapInPandas(_val, schema)
