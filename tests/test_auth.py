"""RBAC / admin-list authorization (SURVEY gap #5 in VERDICT r05:
usecases/auth/authorization — authorizer.go interface, types.go verbs +
resource grammar, casbin_types.go built-in roles, adminlist backend)."""

from __future__ import annotations

import pytest

from weaviate_spark import auth


def test_builtin_roles_and_verbs():
    ctrl = auth.RbacController()
    ctrl.assign("alice", "admin")
    ctrl.assign("bob", "viewer")
    az = auth.RbacAuthorizer(ctrl)
    res = auth.objects_path("documents")
    for verb in auth.ALL_VERBS:
        az.authorize("alice", verb, res)  # admin: full CRUD
    az.authorize("bob", auth.READ, res)   # viewer: read only
    with pytest.raises(auth.Forbidden):
        az.authorize("bob", auth.UPDATE, res)
    with pytest.raises(auth.Forbidden):
        az.authorize("mallory", auth.READ, res)  # no roles at all


def test_collection_scoped_role():
    ctrl = auth.RbacController()
    ctrl.upsert_role(auth.Role("docs-writer", (
        auth.Permission(auth.READ, auth.objects_path("documents")),
        auth.Permission(auth.CREATE, auth.objects_path("documents")),
    )))
    ctrl.assign("carol", "docs-writer")
    az = auth.RbacAuthorizer(ctrl)
    az.authorize("carol", auth.CREATE, auth.objects_path("documents"))
    with pytest.raises(auth.Forbidden):
        az.authorize("carol", auth.CREATE, auth.objects_path("orders"))
    with pytest.raises(auth.Forbidden):
        az.authorize("carol", auth.DELETE, auth.objects_path("documents"))


def test_tenant_scoped_permission():
    ctrl = auth.RbacController()
    ctrl.upsert_role(auth.Role("tenant-a-reader", (
        auth.Permission(auth.READ, auth.objects_path("documents", "tenantA")),
    )))
    ctrl.assign("dave", "tenant-a-reader")
    az = auth.RbacAuthorizer(ctrl)
    az.authorize("dave", auth.READ, auth.objects_path("documents", "tenantA", "42"))
    with pytest.raises(auth.Forbidden):
        az.authorize("dave", auth.READ, auth.objects_path("documents", "tenantB", "42"))


def test_filter_authorized_resources():
    ctrl = auth.RbacController()
    ctrl.upsert_role(auth.Role("r", (
        auth.Permission(auth.READ, auth.objects_path("documents")),
    )))
    ctrl.assign("erin", "r")
    az = auth.RbacAuthorizer(ctrl)
    got = az.filter_authorized_resources("erin", auth.READ, [
        auth.objects_path("documents"), auth.objects_path("orders"),
    ])
    assert got == [auth.objects_path("documents")]


def test_builtin_roles_immutable():
    ctrl = auth.RbacController()
    with pytest.raises(ValueError):
        ctrl.upsert_role(auth.Role("admin", ()))
    with pytest.raises(ValueError):
        ctrl.delete_role("viewer")
    with pytest.raises(ValueError):
        ctrl.assign("x", "no-such-role")


def test_admin_list_backend():
    az = auth.AdminListAuthorizer(admins=["root"], read_only=["ro"])
    az.authorize("root", auth.DELETE, auth.objects_path("documents"))
    az.authorize("ro", auth.READ, auth.objects_path("documents"))
    with pytest.raises(auth.Forbidden):
        az.authorize("ro", auth.CREATE, auth.objects_path("documents"))
    with pytest.raises(auth.Forbidden):
        az.authorize("guest", auth.READ, auth.objects_path("documents"))


def test_client_facade_enforces_authz(spark, sf_dir):
    """The facade's query/data namespaces run the authz hook
    (traverser_get.go:29 analogue): a viewer reads but cannot write; an
    unprivileged principal cannot read."""
    from weaviate_spark.client import connect

    ctrl = auth.RbacController()
    ctrl.assign("bob", "viewer")
    az = auth.RbacAuthorizer(ctrl)

    viewer = connect(spark, sf_dir, authorizer=az, principal="bob")
    docs = viewer.collections.get("documents").with_config(id_col="doc_id")
    assert docs.query.fetch_objects(limit=3).count() == 3
    assert docs.aggregate.over_all(total_count=True).count() == 1
    with pytest.raises(auth.Forbidden):
        docs.data.delete_many(filters=None)

    stranger = connect(spark, sf_dir, authorizer=az, principal="zed")
    with pytest.raises(auth.Forbidden):
        stranger.collections.get("documents").query.fetch_objects(limit=1)

    # default connect() = DummyAuthorizer: allow everything (reads)
    open_client = connect(spark, sf_dir)
    assert open_client.collections.get("documents").query.fetch_objects(limit=1).count() == 1


def test_tenants_namespace_enforces_authz(spark, tmp_path):
    """Tenant lifecycle mutations are authorized per verb (the r06
    review finding: a viewer must not create/offload tenants)."""
    from weaviate_spark.client import connect
    from weaviate_spark.sources.crud import write_tenant_partitioned

    root = str(tmp_path)
    df = spark.createDataFrame(
        [(1, "a", "t1"), (2, "b", "t2")], ["id", "v", "_tenant"]
    )
    write_tenant_partitioned(df, f"{root}/things.parquet", "_tenant")

    ctrl = auth.RbacController()
    ctrl.assign("bob", "viewer")
    ctrl.assign("alice", "admin")
    az = auth.RbacAuthorizer(ctrl)

    # admin: full tenant lifecycle
    alice = connect(spark, root, authorizer=az, principal="alice")
    alice_t = alice.collections.get("things").tenants
    alice_t.create("t1")
    alice_t.create("t2")
    alice_t.update("t2", "INACTIVE")
    assert alice_t.list() == {"t1": "ACTIVE", "t2": "INACTIVE"}
    assert alice_t.read(spark, "t1").count() == 1

    # viewer: reads allowed, every mutation Forbidden
    bob = connect(spark, root, authorizer=az, principal="bob")
    bob_t = bob.collections.get("things").tenants
    assert bob_t.list() == {}                          # READ allowed
    with pytest.raises(auth.Forbidden):
        bob_t.create("t3")
    with pytest.raises(auth.Forbidden):
        bob_t.update("t1", "INACTIVE")
