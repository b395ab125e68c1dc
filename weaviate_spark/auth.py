"""Authorization layer: RBAC roles + admin-list, per-resource CRUD checks.

Reference: usecases/auth/authorization/authorizer.go:20-50 (the
Authorizer interface + DummyAuthorizer), types.go:29-35 (verbs C/R/U/D),
types.go:407-490 (resource path grammar), conv/casbin_types.go:47-53
(built-in roles: Admin/Root full CRUD, Viewer/ReadOnly get READ),
adminlist/ (the allow-list alternative backend).

The engine is a batch query layer, so authorization is a pure
decision function in front of the client facade (client.py wires it
into every query/data call): no audit sink, no dynamic policy store —
those are service concerns, not query semantics. Resource paths use the
reference's own grammar so RBAC configs translate 1:1:

* data:     ``data/collections/{collection}/shards/{tenant}/objects/{id}``
* metadata: ``schema/collections/{collection}/shards/#``
* tenants:  ``tenants/collections/{collection}/shards/{tenant}``

``*`` in a granted resource matches any sequence of characters
(casbin keyMatch semantics on the flat string, like the reference's
model.conf wildcard).
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field
from typing import Iterable, Sequence

# verbs (types.go:29-35)
CREATE = "C"
READ = "R"
UPDATE = "U"
DELETE = "D"
ALL_VERBS = (CREATE, READ, UPDATE, DELETE)


def objects_path(collection: str = "*", tenant: str = "*", object_id="*") -> str:
    """types.go:541 Objects()."""
    return f"data/collections/{collection}/shards/{tenant}/objects/{object_id}"


def collections_metadata_path(collection: str = "*") -> str:
    """types.go:407 CollectionsMetadata()."""
    return f"schema/collections/{collection or '*'}/shards/#"


def tenants_path(collection: str = "*", tenant: str = "*") -> str:
    return f"tenants/collections/{collection}/shards/{tenant}"


def backups_path(collection: str = "*") -> str:
    """types.go Backups() — backup create/restore resource."""
    return f"backups/collections/{collection}"


class Forbidden(PermissionError):
    """Raised when the principal lacks the (verb, resource) grant —
    errors/forbidden.go shape: names principal, verb, and resource."""

    def __init__(self, principal: str, verb: str, resource: str):
        super().__init__(
            f"forbidden: user {principal!r} lacks {verb} on {resource!r}"
        )
        self.principal, self.verb, self.resource = principal, verb, resource


@dataclass(frozen=True)
class Permission:
    verb: str
    resource: str  # pattern, '*' wildcards

    def allows(self, verb: str, resource: str) -> bool:
        return self.verb == verb and fnmatch.fnmatchcase(resource, self.resource)


@dataclass
class Role:
    name: str
    permissions: tuple[Permission, ...] = ()


def _full_crud(resource: str) -> tuple[Permission, ...]:
    return tuple(Permission(v, resource) for v in ALL_VERBS)


# built-in roles (conv/casbin_types.go:47-53)
BUILTIN_ROLES: dict[str, Role] = {
    "root": Role("root", _full_crud("*")),
    "admin": Role("admin", _full_crud("*")),
    "viewer": Role("viewer", (Permission(READ, "*"),)),
    "read-only": Role("read-only", (Permission(READ, "*"),)),
}


@dataclass
class RbacController:
    """Role store + user->roles assignment (rbac/manager.go shape,
    minus raft replication — the policy set is engine config here)."""

    roles: dict[str, Role] = field(default_factory=lambda: dict(BUILTIN_ROLES))
    assignments: dict[str, set[str]] = field(default_factory=dict)

    def upsert_role(self, role: Role) -> None:
        if role.name in BUILTIN_ROLES:
            raise ValueError(f"built-in role {role.name!r} cannot be modified")
        self.roles[role.name] = role

    def delete_role(self, name: str) -> None:
        if name in BUILTIN_ROLES:
            raise ValueError(f"built-in role {name!r} cannot be deleted")
        self.roles.pop(name, None)

    def assign(self, user: str, *role_names: str) -> None:
        unknown = [r for r in role_names if r not in self.roles]
        if unknown:
            raise ValueError(f"unknown roles {unknown}")
        self.assignments.setdefault(user, set()).update(role_names)

    def revoke(self, user: str, *role_names: str) -> None:
        self.assignments.get(user, set()).difference_update(role_names)

    def permissions_of(self, user: str) -> list[Permission]:
        out: list[Permission] = []
        for rname in sorted(self.assignments.get(user, ())):
            role = self.roles.get(rname)
            if role:
                out.extend(role.permissions)
        return out


class Authorizer:
    """authorizer.go:22-31 interface: yes/no per (principal, verb,
    resources); backend hidden behind it."""

    def authorize(self, principal: str, verb: str, *resources: str) -> None:
        raise NotImplementedError

    def filter_authorized_resources(
        self, principal: str, verb: str, resources: Iterable[str]
    ) -> list[str]:
        out = []
        for r in resources:
            try:
                self.authorize(principal, verb, r)
                out.append(r)
            except Forbidden:
                pass
        return out


class DummyAuthorizer(Authorizer):
    """Allow-everything default (authorizer.go:35-50)."""

    def authorize(self, principal: str, verb: str, *resources: str) -> None:
        return None


class RbacAuthorizer(Authorizer):
    def __init__(self, controller: RbacController):
        self.controller = controller

    def authorize(self, principal: str, verb: str, *resources: str) -> None:
        perms = self.controller.permissions_of(principal)
        for resource in resources:
            if not any(p.allows(verb, resource) for p in perms):
                raise Forbidden(principal, verb, resource)


class AdminListAuthorizer(Authorizer):
    """adminlist/: admins get full CRUD on everything, read_only users
    READ on everything, anyone else nothing."""

    def __init__(self, admins: Sequence[str], read_only: Sequence[str] = ()):
        self.admins = frozenset(admins)
        self.read_only = frozenset(read_only)

    def authorize(self, principal: str, verb: str, *resources: str) -> None:
        if principal in self.admins:
            return
        if verb == READ and principal in self.read_only:
            return
        raise Forbidden(principal, verb, resources[0] if resources else "*")
