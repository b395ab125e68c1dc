"""Server-side usage limits (usecases/usagelimits/ — manager.go,
errors.go, template.go; acceptance: test/acceptance/usage_limits/,
namespace_limits/).

Reference semantics mirrored:

* ``check_objects(n, class_name)`` rejects when current + n would
  exceed the object cap, invoked from the storage chokepoint (the
  reference hooks Shard.PutObject{,Batch}; ours hooks crud.upsert and
  crud.insert_batch_with_report) so both single and batch writes are
  covered. Whole-batch rejection is the caller's responsibility —
  the chokepoints pass the batch size and reject on error
  (manager.go:84-88).
* Namespace scoping (manager.go:20-23): a namespace-qualified class
  name ("ns:Class") scopes the count to that namespace's tables; an
  unqualified name counts ALL tables under the data root.
* Typed error with a stable machine code (errors.go:35
  ErrorCode = "USAGE_LIMIT_EXCEEDED"), the limit kind, the configured
  cap, and an operator-overridable message template with {limit} /
  {value} placeholders (template.go — unknown tokens pass through).
* Runtime-overridable config (runtime.DynamicValue): every limit may
  be an int or a no-arg callable re-read on every check, so operators
  can change caps without restart.
* Brief overshoot during concurrent bulk imports is documented and
  accepted (manager.go:42-45) — the count is read before the write,
  not transactionally with it; it self-corrects on the next check.

Schema-side limits (collections) reach in only for the typed error,
same as the reference's usecases/schema/ does.
"""

from __future__ import annotations

import glob
import os
import warnings
from dataclasses import dataclass
from typing import Callable, Optional, Union

# stable wire identifiers (errors.go:25-29)
LIMIT_OBJECTS = "objects"
LIMIT_COLLECTIONS = "collections"
LIMIT_TENANTS = "tenants"

ERROR_CODE = "USAGE_LIMIT_EXCEEDED"  # errors.go:35

DEFAULT_ERROR_TEMPLATE = (
    "{limit} count limit of {value} reached for this instance.")

_Dynamic = Union[int, None, Callable[[], Optional[int]]]


def render_template(template: str, limit: str, value: int) -> str:
    """template.go RenderTemplate: {limit}/{value} substituted, every
    other token passed through (operators embed upgrade URLs etc.)."""
    if not template:
        template = DEFAULT_ERROR_TEMPLATE
    return template.replace("{limit}", limit).replace("{value}", str(value))


class LimitExceededError(RuntimeError):
    """Typed limit error (errors.go LimitExceededError): carries the
    stable error code, which limit was hit, and the configured cap —
    an HTTP layer maps it to 429, a gRPC layer to RESOURCE_EXHAUSTED,
    both matching on ``error_code``, never on the free text."""

    def __init__(self, limit: str, value: int, template: str = ""):
        self.error_code = ERROR_CODE
        self.limit = limit
        self.value = int(value)
        super().__init__(render_template(template, limit, self.value))


@dataclass
class LimitConfig:
    """Limits; each may be an int, None (unlimited), or a no-arg
    callable returning either — the DynamicValue analogue, re-read on
    every check so runtime overrides apply without restart."""

    max_objects: _Dynamic = None
    max_collections: _Dynamic = None
    max_tenants_per_collection: _Dynamic = None
    error_template: Union[str, Callable[[], str]] = ""


def _read(v: _Dynamic) -> Optional[int]:
    if callable(v):
        v = v()
    if v is None or int(v) < 0:   # <0 = unlimited (manager.go:62)
        return None
    return int(v)


# the process-wide manager, like the reference's startup-constructed
# Manager; None = no limits configured (every check is a no-op)
_ACTIVE: Optional[LimitConfig] = None


def set_usage_limits(cfg: Optional[LimitConfig]) -> None:
    global _ACTIVE
    _ACTIVE = cfg


def _template() -> str:
    t = _ACTIVE.error_template if _ACTIVE else ""
    return t() if callable(t) else t


def _namespace_of(class_name: str) -> str:
    from weaviate_spark.schema import namespace_from_qualified

    return namespace_from_qualified(class_name)


def local_object_count(spark, root: str, namespace: str = "",
                       strict: bool = False) -> int:
    """ObjectCounter.LocalObjectCount: sum object counts across the
    tables under ``root`` — scoped to one namespace when given, all
    tables otherwise. Parquet row counts come from footer metadata
    (a count() over a parquet scan never reads data pages), the batch
    analogue of the reference's async per-shard counters.

    Layout contract (shared with crud._check_object_limit): a table is
    a ``root/<name>.parquet`` directory/file — anything else under
    ``root`` is not a table and is not counted. An UNREADABLE table is
    surfaced: warn-and-skip by default (a corrupt table must not wedge
    every write), raise with ``strict=True`` — silently treating it as
    0 rows would admit writes past the cap with no signal."""
    total = 0
    for p in glob.glob(os.path.join(root, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        ns = _namespace_of(name)
        if namespace and ns != namespace:
            continue
        try:
            total += spark.read.parquet(p).count()
        except Exception as ex:
            if strict:
                raise RuntimeError(
                    f"cannot count table {name!r} for the object "
                    f"limit: {ex}") from ex
            warnings.warn(
                f"usage_limits: table {name!r} unreadable, excluded "
                f"from object count ({type(ex).__name__}: "
                f"{str(ex)[:120]})", RuntimeWarning, stacklevel=2)
            continue
    return total


def check_objects(spark, root: str, n: int, class_name: str) -> None:
    """Manager.CheckObjects: reject when current + n exceeds the cap.
    No-op without a configured manager or cap."""
    if _ACTIVE is None:
        return
    cap = _read(_ACTIVE.max_objects)
    if cap is None:
        return
    current = local_object_count(spark, root, _namespace_of(class_name))
    if current + int(n) > cap:
        raise LimitExceededError(LIMIT_OBJECTS, cap, _template())


def check_collections(existing: int, adding: int = 1) -> None:
    """Schema-side collection-count limit (counted inline by the
    caller, typed error from here — the reference's split)."""
    if _ACTIVE is None:
        return
    cap = _read(_ACTIVE.max_collections)
    if cap is None:
        return
    if existing + adding > cap:
        raise LimitExceededError(LIMIT_COLLECTIONS, cap, _template())


def check_tenants(existing: int, adding: int = 1) -> None:
    if _ACTIVE is None:
        return
    cap = _read(_ACTIVE.max_tenants_per_collection)
    if cap is None:
        return
    if existing + adding > cap:
        raise LimitExceededError(LIMIT_TENANTS, cap, _template())
