"""Backup / restore lifecycle (SURVEY §2.1; reference
usecases/backup/backupper.go + entities/backup/status.go): descriptor
status transitions, duplicate-id rejection, include/exclude selection,
restore refusal rules, and row-level roundtrip fidelity."""

import os

import pytest

from weaviate_spark.sources.backup import (
    SUCCESS,
    BackupError,
    backup_create,
    backup_restore,
    backup_status,
    read_descriptor,
)


def _mk_tables(spark, sf):
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    ).write.parquet(f"{sf}/things.parquet")
    spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "id long, v array<double>"
    ).write.parquet(f"{sf}/vecs.parquet")


def test_backup_restore_roundtrip(spark, tmp_path):
    sf = str(tmp_path / "sf")
    backend = str(tmp_path / "backend")
    _mk_tables(spark, sf)
    before = {
        t: sorted(map(tuple, spark.read.parquet(f"{sf}/{t}.parquet").collect()))
        for t in ("things", "vecs")
    }

    desc = backup_create(spark, "b1", sf, backend)
    assert desc["status"] == SUCCESS == backup_status(backend, "b1")
    assert set(desc["classes"]) == {"things", "vecs"}
    assert desc["classes"]["things"]["rows"] == 3

    # simulate total loss, restore into a fresh dir
    target = str(tmp_path / "restored")
    out = backup_restore(spark, "b1", backend, target)
    assert out["restored"] == {"things": 3, "vecs": 2}
    after = {
        t: sorted(map(tuple, spark.read.parquet(f"{target}/{t}.parquet").collect()))
        for t in ("things", "vecs")
    }
    assert after == before


def test_backup_rejects_duplicate_id_and_missing_class(spark, tmp_path):
    sf = str(tmp_path / "sf")
    backend = str(tmp_path / "backend")
    _mk_tables(spark, sf)
    backup_create(spark, "b1", sf, backend, include=["things"])
    with pytest.raises(BackupError, match="already exists"):
        backup_create(spark, "b1", sf, backend)
    with pytest.raises(BackupError, match="does not exist"):
        backup_create(spark, "b2", sf, backend, include=["nope"])


def test_backup_include_exclude(spark, tmp_path):
    sf = str(tmp_path / "sf")
    backend = str(tmp_path / "backend")
    _mk_tables(spark, sf)
    desc = backup_create(spark, "b1", sf, backend, exclude=["vecs"])
    assert set(desc["classes"]) == {"things"}
    target = str(tmp_path / "restored")
    with pytest.raises(BackupError, match="not in backup"):
        backup_restore(spark, "b1", backend, target, include=["vecs"])


def test_restore_refuses_non_success_and_overwrite(spark, tmp_path):
    sf = str(tmp_path / "sf")
    backend = str(tmp_path / "backend")
    _mk_tables(spark, sf)
    backup_create(spark, "b1", sf, backend, include=["things"])

    # corrupt the lifecycle: restore must refuse anything but SUCCESS
    desc = read_descriptor(backend, "b1")
    desc["status"] = "FAILED"
    import json

    with open(f"{backend}/b1/backup.json", "w") as f:
        json.dump(desc, f)
    with pytest.raises(BackupError, match="expected SUCCESS"):
        backup_restore(spark, "b1", backend, str(tmp_path / "r"))
    desc["status"] = SUCCESS
    with open(f"{backend}/b1/backup.json", "w") as f:
        json.dump(desc, f)

    # restoring onto an existing class refuses without overwrite
    with pytest.raises(BackupError, match="already exists"):
        backup_restore(spark, "b1", backend, sf)
    out = backup_restore(spark, "b1", backend, sf, overwrite=True)
    assert out["restored"] == {"things": 3}


def test_client_backup_namespace_with_authz(spark, tmp_path):
    """client.backup mirrors the v4 API shape and enforces the backups
    resource: a read-only principal can poll status but not create."""
    import pytest as _pytest

    from weaviate_spark import auth, client as wclient

    sf = str(tmp_path / "sf")
    backend = str(tmp_path / "backend")
    _mk_tables(spark, sf)

    ctrl = auth.RbacController()
    ctrl.assign("ops", "admin")
    ctrl.assign("ro", "viewer")
    rbac = auth.RbacAuthorizer(ctrl)
    ops = wclient.connect(spark, sf, authorizer=rbac, principal="ops")
    ro = wclient.connect(spark, sf, authorizer=rbac, principal="ro")

    desc = ops.backup.create("cb1", backend, include_collections=["things"])
    assert desc["status"] == SUCCESS
    assert ro.backup.get_create_status("cb1", backend) == SUCCESS
    with _pytest.raises(auth.Forbidden):
        ro.backup.create("cb2", backend)
    out = ops.backup.restore("cb1", backend, overwrite=True)
    assert out["restored"] == {"things": 3}


# ---------------------------------------------------------------------------
# Export API (usecases/export/ — scheduler/participant/types; statuses
# entities/export/status.go)

def _mini_corpus(spark, tmp_path):
    sf = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"text {i}", [float(i), 0.5]) for i in range(40)],
        "doc_id long, text string, embedding array<float>",
    ).write.parquet(f"{sf}/documents.parquet")
    spark.createDataFrame(
        [(i, i % 3) for i in range(25)], "vec_id long, label long"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_export_lifecycle_and_readback(spark, tmp_path):
    """SUCCESS lifecycle: parquet lands per class, metadata is the
    source of truth (per-class objectsExported + statuses), vectors
    survive as array columns, and the exported table is row-identical
    to the source."""
    from weaviate_spark.sources.export import (
        SHARD_SUCCESS, SUCCESS, export_create, export_status,
    )

    sf = _mini_corpus(spark, tmp_path)
    backend = str(tmp_path / "backend")
    meta = export_create(spark, "exp1", sf, backend)
    assert meta["status"] == SUCCESS
    assert meta["shardStatus"]["documents"]["objectsExported"] == 40
    assert all(s["status"] == SHARD_SUCCESS
               for s in meta["shardStatus"].values())
    assert export_status(backend, "exp1")["status"] == SUCCESS
    back = spark.read.parquet(f"{backend}/exp1/documents")
    assert back.count() == 40
    assert dict(back.dtypes)["embedding"] == "array<float>"
    src_rows = sorted(map(tuple, spark.read.parquet(
        f"{sf}/documents.parquet").collect()))
    assert sorted(map(tuple, back.collect())) == src_rows
    # duplicate id rejected (idempotent ids, like backup)
    import pytest

    from weaviate_spark.sources.export import ExportError

    with pytest.raises(ExportError, match="already exists"):
        export_create(spark, "exp1", sf, backend)


def test_export_slot_cas_and_release(spark, tmp_path):
    """ONE export at a time per backend (participant.go Prepare CAS):
    a held slot rejects a second export; terminal status releases it."""
    import pytest

    from weaviate_spark.sources.export import (
        ExportError, _release_slot, _reserve_slot, export_create,
    )

    sf = _mini_corpus(spark, tmp_path)
    backend = str(tmp_path / "backend")
    _reserve_slot(backend, "someone-else")
    with pytest.raises(ExportError, match="already running"):
        export_create(spark, "exp2", sf, backend)
    _release_slot(backend, "someone-else")
    meta = export_create(spark, "exp2", sf, backend)
    assert meta["status"] == "SUCCESS"
    # slot released after success -> a third export can start
    meta3 = export_create(spark, "exp3", sf, backend,
                          include=["documents"])
    assert list(meta3["shardStatus"]) == ["documents"]


def test_export_cancel_semantics(spark, tmp_path):
    """Cancel marks CANCELED, keeps artifacts (scheduler.go:314-317),
    errors on finished exports, and a cancel marker observed mid-scan
    records SKIPPED for the remaining classes."""
    import os

    import pytest

    from weaviate_spark.sources.export import (
        CANCELED, ExportError, _cancel_path, _write_meta, export_cancel,
        export_create, read_metadata,
    )

    sf = _mini_corpus(spark, tmp_path)
    backend = str(tmp_path / "backend")
    # a RUNNING export (simulated via metadata) cancels cleanly
    _write_meta(backend, "run1", {"id": "run1", "status": "TRANSFERRING",
                                  "shardStatus": {}})
    out = export_cancel(backend, "run1")
    assert out["status"] == CANCELED
    # canceling a finished export errors (ErrExportAlreadyFinished)
    with pytest.raises(ExportError, match="already finished"):
        export_cancel(backend, "run1")
    # cancel marker present before the scan loop -> every class SKIPPED,
    # terminal status CANCELED, artifacts (metadata) kept
    os.makedirs(f"{backend}/run2", exist_ok=True)
    with open(_cancel_path(backend, "run2"), "w") as fh:
        fh.write("cancel")
    meta = export_create(spark, "run2", sf, backend)
    assert meta["status"] == CANCELED
    assert all(s["status"] == "SKIPPED"
               for s in meta["shardStatus"].values())
    assert read_metadata(backend, "run2")["status"] == CANCELED


def test_export_include_exclude_and_client(spark, tmp_path):
    """include/exclude select classes (types.go ExportRequest.Classes);
    the client facade wires create/status/cancel with backup authz."""
    from weaviate_spark.client import WeaviateSparkClient

    sf = _mini_corpus(spark, tmp_path)
    backend = str(tmp_path / "backend")
    client = WeaviateSparkClient(spark, sf)
    meta = client.export.create("exp-cli", backend,
                                exclude_collections=["embeddings"])
    assert list(meta["shardStatus"]) == ["documents"]
    assert client.export.status("exp-cli", backend)["status"] == "SUCCESS"
