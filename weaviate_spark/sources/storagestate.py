"""Shard storage status (entities/storagestate/status.go +
PUT /v1/schema/{class}/shards/{shard}).

The reference's shards carry an activity status independent of tenant
lifecycle: READY serves everything; READONLY serves reads but rejects
every mutation with ``store is read-only`` (status.go:33, or the
``due to: <reason>`` variant :28 when the flip carried one — disk
pressure, backup prepare, manual ops); INDEXING/LOADING/LAZY_LOADING
are server-set transitional states; SHUTDOWN rejects use. Users can
set READY and READONLY through the schema API
(UpdateShardStatus, usecases/schema/executor.go:360 →
index.go:3739 IncomingUpdateShardStatus — manual updates validate via
ValidateStatus, status.go:43).

Spark mapping: a "shard" is a table directory (single-shard
collections) or one tenant partition of it (multi-tenant collections —
the reference likewise models tenants as shards,
get_shards_status_with_tenant_test.go). The registry gates the COW
write chokepoints in sources/crud.py; reads are never gated by
READONLY (the reference serves reads from read-only shards).
"""

from __future__ import annotations

import threading

STATUS_READONLY = "READONLY"
STATUS_INDEXING = "INDEXING"
STATUS_LOADING = "LOADING"
STATUS_LAZY_LOADING = "LAZY_LOADING"
STATUS_READY = "READY"
STATUS_SHUTDOWN = "SHUTDOWN"

# ValidateStatus (status.go:43-59) accepts exactly these four; the
# loading pair is server-set only and not settable through the API
_SETTABLE = (STATUS_READONLY, STATUS_INDEXING, STATUS_READY,
             STATUS_SHUTDOWN)


class InvalidStatusError(ValueError):
    """status.go:34 ErrInvalidStatus."""


class ReadOnlyError(RuntimeError):
    """status.go:33 ErrStatusReadOnly / :28 the with-reason variant."""


def validate_status(status: str) -> str:
    if status not in _SETTABLE:
        raise InvalidStatusError("invalid storage status")
    return status


_LOCK = threading.Lock()
# (table_dir, shard) -> (status, reason); absent = READY
_STATUS: dict[tuple[str, str], tuple[str, str]] = {}


def _key(table_dir: str, shard: str) -> tuple[str, str]:
    return (table_dir.rstrip("/"), shard)


def update_shard_status(table_dir: str, status: str, shard: str = "",
                        reason: str = "") -> str:
    """UpdateShardStatus: validate then flip; returns the new status.
    READY clears any recorded reason."""
    s = validate_status(status)
    with _LOCK:
        if s == STATUS_READY:
            _STATUS.pop(_key(table_dir, shard), None)
        else:
            _STATUS[_key(table_dir, shard)] = (s, reason)
    return s


def get_shard_status(table_dir: str, shard: str = "") -> str:
    with _LOCK:
        return _STATUS.get(_key(table_dir, shard), (STATUS_READY, ""))[0]


def get_shards_status(table_dir: str) -> dict[str, str]:
    """GetShardsStatus: every non-READY shard of the table plus the
    table-level entry, name -> status (models.ShardStatusList shape)."""
    td = table_dir.rstrip("/")
    with _LOCK:
        out = {shard or "_default": st for (t, shard), (st, _r)
               in _STATUS.items() if t == td}
    out.setdefault("_default", STATUS_READY)
    return out


def check_writable(table_dir: str, shard: str = "") -> None:
    """The mutation gate (shard_write paths check the store status
    before any write): READONLY raises the reference's exact error
    text, with the recorded reason when one was given; SHUTDOWN and
    the transitional states reject too (a COW batch engine has no
    half-loaded state to accept writes into). Checks the tenant shard
    AND the table-level entry — a table-wide READONLY covers every
    tenant."""
    with _LOCK:
        hit = _STATUS.get(_key(table_dir, shard))
        if hit is None and shard:
            hit = _STATUS.get(_key(table_dir, ""))
    if hit is None:
        return
    status, reason = hit
    if status == STATUS_READONLY:
        if reason:
            raise ReadOnlyError(f"store is read-only due to: {reason}")
        raise ReadOnlyError("store is read-only")
    raise ReadOnlyError(f"store is in a {status} state")


def clear(table_dir: str | None = None) -> None:
    """Test/ops helper: drop recorded statuses (all, or one table's)."""
    with _LOCK:
        if table_dir is None:
            _STATUS.clear()
        else:
            td = table_dir.rstrip("/")
            for k in [k for k in _STATUS if k[0] == td]:
                _STATUS.pop(k)
