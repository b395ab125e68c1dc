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
