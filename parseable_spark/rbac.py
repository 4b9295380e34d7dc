"""RBAC-lite + tenant namespacing.

Parity with the reference's role model (src/rbac/role.rs:195-330):
default privileges `Admin | Editor | Writer{stream} | Reader{stream} |
Ingestor{stream}` expand to permission sets checked per-dataset before
query execution (src/handlers/http/query.rs:102-104,176). Tenancy:
each tenant gets its own namespace of streams (src/query/mod.rs:122-147
gives every tenant a DataFusion schema); we prefix temp-view names with
the tenant id, so one SparkSession serves many tenants without
cross-tenant name capture — the multi-tenant analog of the reference's
per-tenant catalog.

Driver-side metadata checks only — nothing here touches the data path,
so authorization cost is independent of data volume.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

DEFAULT_TENANT = "default"


class Action(str, Enum):
    QUERY = "query"
    INGEST = "ingest"
    CREATE_STREAM = "create_stream"
    DELETE_STREAM = "delete_stream"
    LIST_STREAM = "list_stream"
    MANAGE = "manage"  # alerts/retention/users


# privilege → allowed actions; '*' stream scope means all streams
# (reference perm builders, src/rbac/role.rs:300-330)
_PRIVILEGES: dict[str, set[Action]] = {
    "admin": set(Action),
    "editor": {a for a in Action if a is not Action.DELETE_STREAM},
    "writer": {Action.QUERY, Action.INGEST, Action.LIST_STREAM, Action.CREATE_STREAM},
    "reader": {Action.QUERY, Action.LIST_STREAM},
    "ingestor": {Action.INGEST},
}


@dataclass(frozen=True)
class Grant:
    privilege: str  # admin/editor/writer/reader/ingestor
    stream: str = "*"  # '*' = all streams in the tenant
    tenant: str = DEFAULT_TENANT

    def allows(self, action: Action, stream: str, tenant: str) -> bool:
        if self.tenant != tenant:
            return False
        if self.privilege not in _PRIVILEGES:
            return False
        if action not in _PRIVILEGES[self.privilege]:
            return False
        return self.stream == "*" or self.stream == stream


@dataclass
class User:
    name: str
    grants: list[Grant] = field(default_factory=list)
    roles: list[str] = field(default_factory=list)  # named role refs


class AccessDenied(PermissionError):
    pass


class Rbac:
    def __init__(self) -> None:
        self._users: dict[str, User] = {}
        self._roles: dict[str, list[Grant]] = {}

    def add_user(
        self, name: str, grants: list[Grant], roles: list[str] | None = None
    ) -> User:
        u = User(name, list(grants), list(roles or []))
        self._users[name] = u
        return u

    # --- named roles (reference role.rs PUT/GET /role/{name}: a role is
    # a reusable grant set; users reference roles, edits propagate
    # because grants resolve at authorization time) --------------------
    def put_role(self, name: str, grants: list[Grant]) -> None:
        self._roles[name] = list(grants)

    def get_role(self, name: str) -> list[Grant]:
        return list(self._roles[name])

    def list_roles(self) -> list[str]:
        return sorted(self._roles)

    def delete_role(self, name: str) -> None:
        users = [u.name for u in self._users.values() if name in u.roles]
        if users:
            raise ValueError(f"role {name} in use by {users}")
        del self._roles[name]

    def effective_grants(self, user: User) -> list[Grant]:
        out = list(user.grants)
        for r in user.roles:
            out.extend(self._roles.get(r, []))
        return out

    def authorize(
        self,
        user: str,
        action: Action,
        stream: str = "*",
        tenant: str = DEFAULT_TENANT,
    ) -> None:
        """Raise AccessDenied unless some grant covers (action, stream,
        tenant) — the reference's user_auth_for_datasets gate."""
        u = self._users.get(user)
        if u is None or not any(
            g.allows(action, stream, tenant) for g in self.effective_grants(u)
        ):
            raise AccessDenied(f"{user} may not {action.value} on {tenant}/{stream}")

    def authorized_streams(
        self, user: str, streams: list[str], tenant: str = DEFAULT_TENANT
    ) -> list[str]:
        u = self._users.get(user)
        if u is None:
            return []
        grants = self.effective_grants(u)
        return [
            s
            for s in streams
            if any(g.allows(Action.QUERY, s, tenant) for g in grants)
        ]


def tenant_view_name(tenant: str, stream: str) -> str:
    """Namespaced temp-view name: one SparkSession, many tenants.

    The encoding must be INJECTIVE and collision-free against
    default-tenant names (review finding: a lossy '-'→'_' map collided
    tenants 'a-b'/'a_b', and a default stream literally named
    'acme__logs' captured tenant acme's 'logs' view). Escape coding
    ('_'→'_0', '-'→'_1', '.'→'_2') is injective, and the leading
    underscore prefix can never collide with a stream view because
    stream names must start alphanumeric (server.validate_stream_name).
    """
    if tenant == DEFAULT_TENANT:
        return stream
    safe = tenant.replace("_", "_0").replace("-", "_1").replace(".", "_2")
    return f"_t_{safe}__{stream}"
