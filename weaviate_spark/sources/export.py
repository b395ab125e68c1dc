"""Bulk export API (SURVEY §2.1 "Export"; reference: usecases/export/
— ARCHITECTURE.md, types.go, scheduler.go, participant.go,
parallel_scan.go, parquet_writer.go; status values entities/export/
status.go:17-34).

Reference semantics mirrored here:

* An export produces a POINT-IN-TIME parquet snapshot of selected
  collections under ``backend_root/<id>/<class>/`` plus a
  ``metadata.json`` that is "the single source of truth for an
  export's configuration and status" (types.go:89-101): id, backend,
  startedAt/completedAt, status, classes, per-class shard progress
  (objectsExported / status / error / skipReason), error.
* Status lifecycle STARTED -> TRANSFERRING -> SUCCESS / FAILED /
  CANCELED (status.go:17-23); per-class progress TRANSFERRING ->
  SUCCESS / FAILED / SKIPPED (status.go:30-34).
* ONE export at a time: Prepare reserves an export slot via CAS
  (participant.go:52,154) — here an O_EXCL lock file under the backend
  root, the same claim-marker pattern crud.py's OCC uses. A busy slot
  rejects the new export; the slot is released on every terminal
  status.
* Cancel (scheduler.go:310-319) marks a RUNNING export CANCELED but
  "does not remove artifacts … so operators can inspect what was
  exported before the cancellation"; canceling an already-finished
  export errors (scheduler.go:45). Cancellation is cooperative: the
  scan loop checks the marker between classes (the batch analogue of
  the participant's context cancel between shards).
* Idempotent, no side effects on failure beyond honest status — a
  failed/canceled export's id must be re-run under a NEW id (the
  reference rejects duplicate ids the same way backup does).

Spark shape: the per-node parallel scan + parquet writer
(parallel_scan.go / parquet_writer.go) IS ``df.write.parquet`` — every
executor scans and writes its own partitions concurrently, which is
exactly the reference's per-shard scan fan-out; against an
S3/GCS/Azure ``backend_root`` the upload parallelism comes with it.
Vectors export as their native array<float> columns (the reference
writes them as parquet lists). Snapshot anchoring: for versioned CRUD
tables the read pins the current committed version (crud.read_snapshot
— the Prepare-phase shard snapshot); static parquet corpora read
as-is.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

from pyspark.sql import SparkSession

# entities/export/status.go:17-23
STARTED = "STARTED"
TRANSFERRING = "TRANSFERRING"
SUCCESS = "SUCCESS"
FAILED = "FAILED"
CANCELED = "CANCELED"
# entities/export/status.go:30-34 (per-class)
SHARD_TRANSFERRING = "TRANSFERRING"
SHARD_SUCCESS = "SUCCESS"
SHARD_FAILED = "FAILED"
SHARD_SKIPPED = "SKIPPED"

_TERMINAL = (SUCCESS, FAILED, CANCELED)


class ExportError(RuntimeError):
    pass


def _meta_path(backend_root: str, export_id: str) -> str:
    return os.path.join(backend_root, export_id, "metadata.json")


def _slot_path(backend_root: str) -> str:
    return os.path.join(backend_root, "_EXPORT_SLOT")


def _cancel_path(backend_root: str, export_id: str) -> str:
    return os.path.join(backend_root, export_id, "_CANCEL")


def _write_progress(backend_root: str, export_id: str, meta: dict) -> None:
    """Progress write from inside the scan loop: never regress a
    terminal status already on disk. export_cancel may have marked the
    export CANCELED between two classes; the loop's shardStatus updates
    must not transiently flip it back to TRANSFERRING."""
    try:
        current = read_metadata(backend_root, export_id)
    except ExportError:
        current = {}
    if current.get("status") in _TERMINAL:
        meta["status"] = current["status"]
        meta.setdefault("completedAt", current.get("completedAt"))
    _write_meta(backend_root, export_id, meta)


def _write_meta(backend_root: str, export_id: str, meta: dict) -> None:
    path = _meta_path(backend_root, export_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, path)  # atomic: readers never see a torn file


def read_metadata(backend_root: str, export_id: str) -> dict:
    path = _meta_path(backend_root, export_id)
    if not os.path.exists(path):
        raise ExportError(f"export {export_id!r} not found")
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def export_status(backend_root: str, export_id: str) -> dict:
    """GET /v1/export/{backend}/{id} — the metadata IS the status
    (scheduler.go Status() reads it back from the backend)."""
    return read_metadata(backend_root, export_id)


def export_cancel(backend_root: str, export_id: str) -> dict:
    """POST cancel: mark a RUNNING export CANCELED. Artifacts are kept
    (scheduler.go:314-317); canceling a finished export errors
    (ErrExportAlreadyFinished, scheduler.go:45)."""
    meta = read_metadata(backend_root, export_id)
    if meta["status"] in _TERMINAL:
        raise ExportError(
            f"export {export_id!r} already finished ({meta['status']})")
    with open(_cancel_path(backend_root, export_id), "w") as fh:
        fh.write("cancel")
    meta["status"] = CANCELED
    meta["completedAt"] = _now()
    _write_meta(backend_root, export_id, meta)
    # Owner-checked release: free the slot ONLY if this export still
    # holds it. Two callers reach here:
    #  * crash recovery — the export's process was hard-killed
    #    (OOM/SIGKILL) leaving the slot file orphaned; this delete is
    #    what un-wedges the backend (see test_export_crash_recovery);
    #  * cooperative cancel of a LIVE export — the running
    #    export_create's own finally still performs an owner-checked
    #    release, so whichever of the two runs second is a no-op and a
    #    slot reserved by a NEWER export in between is never deleted.
    _release_slot(backend_root, export_id)
    return meta


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _reserve_slot(backend_root: str, export_id: str) -> None:
    """Prepare-phase CAS (participant.go:154): one active export per
    backend. O_EXCL is the filesystem CAS — exactly one creator wins."""
    os.makedirs(backend_root, exist_ok=True)
    try:
        fd = os.open(_slot_path(backend_root),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        with open(_slot_path(backend_root), encoding="utf-8") as fh:
            holder = fh.read().strip()
        raise ExportError(
            f"an export is already running on this backend "
            f"(slot held by {holder!r}); cancel it or wait"
        ) from None
    with os.fdopen(fd, "w") as fh:
        fh.write(export_id)


def _release_slot(backend_root: str, export_id: str) -> None:
    """Release the slot only if ``export_id`` still owns it (the CAS
    analogue of participant.go:154's compare-and-delete). Without the
    owner check, export_cancel racing a live export_create could free
    the slot early, let a NEW export reserve it, and then have the old
    create's ``finally`` delete the new export's slot file.

    Object-store note: ``O_EXCL`` create and owner-checked delete are
    POSIX-only primitives. An S3/GCS backend needs the conditional-put
    analogue the reference's Prepare CAS uses (participant.go:154):
    `If-None-Match: *` on reserve and `If-Match: <etag>` on release (or
    a DynamoDB/Firestore conditional delete). The same applies to
    crud.py's OCC claim markers.

    The check-then-delete is made ATOMIC with an exclusive flock on a
    DEDICATED lock file (``<slot>.lock``) that is created once and
    never unlinked. Locking the slot file itself was subtly unsound:
    the flock lives on the opened *inode*, so if that inode was already
    unlinked and its inode number immediately reused by a new
    reservation, an ``st_ino`` equality check could pass while the fd
    still read the stale holder id — deleting the new export's slot.
    With a never-unlinked lock path there is no inode churn to race:
    all releasers serialize on the same lock, and the holder is read
    via a FRESH open of the slot path under that lock, so the value
    read is always the current path's content."""
    import fcntl

    lock_path = _slot_path(backend_root) + ".lock"
    path = _slot_path(backend_root)
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    except FileNotFoundError:
        return  # backend_root itself is gone — nothing to release
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX)
        try:
            with open(path, encoding="utf-8") as fh:
                holder = fh.read().strip()
        except FileNotFoundError:
            return
        if holder == export_id:
            os.remove(path)
    finally:
        os.close(lock_fd)  # releases the flock


def export_create(
    spark: SparkSession,
    export_id: str,
    sf_dir: str,
    backend_root: str,
    include: Optional[Sequence[str]] = None,
    exclude: Optional[Sequence[str]] = None,
) -> dict:
    """POST /v1/export/{backend}: snapshot the selected classes to
    ``backend_root/<id>/<class>/`` as parquet and return the final
    metadata. Duplicate ids are rejected; the export slot is held from
    Prepare to the terminal status; a cancel marker observed between
    classes stops the scan loop, records SKIPPED for the remaining
    classes, and keeps everything already written."""
    from weaviate_spark.sources.backup import _select_collections

    if os.path.exists(_meta_path(backend_root, export_id)):
        raise ExportError(f"export {export_id!r} already exists")
    names = _select_collections(sf_dir, include, exclude)
    if not names:
        raise ExportError("no classes selected")
    _reserve_slot(backend_root, export_id)
    meta: dict = {
        "id": export_id,
        "backend": backend_root,
        "startedAt": _now(),
        "status": STARTED,
        "classes": list(names),
        "shardStatus": {},
        "source": sf_dir,
    }
    _write_meta(backend_root, export_id, meta)
    try:
        meta["status"] = TRANSFERRING
        _write_meta(backend_root, export_id, meta)
        canceled = False
        for name in names:
            if os.path.exists(_cancel_path(backend_root, export_id)):
                canceled = True
                meta["status"] = CANCELED
                meta["shardStatus"][name] = {
                    "status": SHARD_SKIPPED,
                    "objectsExported": 0,
                    "skipReason": "export canceled",
                }
                _write_progress(backend_root, export_id, meta)
                continue
            meta["shardStatus"][name] = {
                "status": SHARD_TRANSFERRING, "objectsExported": 0,
            }
            _write_progress(backend_root, export_id, meta)
            try:
                dst = os.path.join(backend_root, export_id, name)
                _snapshot_export(spark, sf_dir, name, dst)
                rows = spark.read.parquet(dst).count()
                meta["shardStatus"][name] = {
                    "status": SHARD_SUCCESS, "objectsExported": rows,
                }
            except Exception as ex:
                meta["shardStatus"][name] = {
                    "status": SHARD_FAILED, "objectsExported": 0,
                    "error": str(ex)[:300],
                }
                _write_progress(backend_root, export_id, meta)
                raise
            _write_progress(backend_root, export_id, meta)
        if canceled:
            # the cancel path usually wins the race to mark CANCELED;
            # make the terminal state honest if the scan saw it first
            meta = read_metadata(backend_root, export_id)
            if meta["status"] not in _TERMINAL:
                meta["status"] = CANCELED
        else:
            meta["status"] = SUCCESS
        meta["completedAt"] = _now()
        # terminal-preserving like the FAILED branch: a cancel landing
        # after the last per-class _CANCEL check must not be overwritten
        # by SUCCESS (export_cancel already wrote CANCELED to disk)
        _write_progress(backend_root, export_id, meta)
    except Exception as ex:
        meta["status"] = FAILED
        meta["error"] = str(ex)[:300]
        meta["completedAt"] = _now()
        # terminal-preserving: export_cancel may have marked CANCELED
        # while the failing class was mid-snapshot — FAILED must not
        # overwrite a terminal status already on disk
        _write_progress(backend_root, export_id, meta)
        raise
    finally:
        _release_slot(backend_root, export_id)
    return meta


def _snapshot_export(spark: SparkSession, sf_dir: str, name: str,
                     dst: str) -> None:
    """Point-in-time anchor (the Prepare-phase shard snapshot,
    participant.go:52): the scan+write runs inside crud.read_snapshot,
    so racing a transactional swap retries against the PINNED archived
    version instead of observing a half-swapped directory. The write is
    mode('overwrite') for retry idempotence — the duplicate-id check at
    export_create entry is what protects finished exports, not the
    write mode."""
    from weaviate_spark.sources.crud import read_snapshot

    path = os.path.join(sf_dir, f"{name}.parquet")
    read_snapshot(
        spark, path, lambda df: df.write.mode("overwrite").parquet(dst))
