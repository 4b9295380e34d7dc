"""Persisted-format versioning + in-place upgrade.

The reference versions every on-disk metadata object and upgrades it
stepwise at boot: src/migration/mod.rs walks stream.json / schema /
parseable.json through v1→v2→…→current (stream_metadata_migration.rs:
1-403 is the per-version chain; storage metadata carries
CURRENT_STORAGE_METADATA_VERSION = "v8", src/storage/store_metadata.rs:
46). This module is the same seam for OUR persisted artifacts:

| kind          | file                      | legacy (v1) shape        |
|---------------|---------------------------|--------------------------|
| config        | <root>/_config.json       | dict, no version         |
| stream_config | <stream>/config.json      | dict, no version         |
| retention     | <stream>/retention.json   | bare task list           |
| manifest      | <stream>/manifest.json    | {"files": [...]}         |
| snapshot      | <stream>/snapshot.json    | {"items": [...]}         |
| stats         | <stream>/stats.json       | dict, no version         |
| tenant        | _tenants/<id>/tenant.json | dict, no version         |

Anything the r1–r3 layouts wrote is "v1" (no version key). v2 is the
same payload with a ``"version": "v2"`` stamp — the chain exists so the
NEXT structural change is one appended function per kind, exactly the
reference's pattern. ``upgrade()`` applies the chain; loaders call it
on every read and the callers rewrite the file when an upgrade
occurred, so old roots upgrade in place on first boot and then load on
the fast path forever after.

The schema registry (ingest/schema.py) persists THROUGH this module's
``save_versioned``/``load_versioned`` under the ``stream_schema`` kind
— its internal v1/v2 payload shaping is its own, but a structural
change to the persisted file still needs a ``_MIGRATIONS`` step here
like every other kind. Only the streaming dedup index
(streaming/dedup_index.py, ``index/v{N}`` + LATEST pointer) is fully
self-managed outside this seam.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# current version per artifact kind; bump when the shape changes and
# append a step to _MIGRATIONS[kind]
CURRENT_VERSIONS: dict[str, int] = {
    "config": 2,
    "stream_config": 2,
    "retention": 2,
    "manifest": 2,
    "snapshot": 2,
    "stats": 2,
    "tenant": 2,
    "stream_schema": 2,  # SchemaRegistry stream.json (schema_migration.rs)
    "hottier": 2,  # <stream>/hottier.json (hottier.rs StreamHotTier)
}

# legacy list-shaped artifacts get enveloped under this key at v2
_LIST_ENVELOPE = {"retention": "tasks"}


def _v1_to_v2(kind: str) -> Callable[[Any], dict[str, Any]]:
    """v1→v2 is shape-preserving: envelope bare lists, stamp the
    version. Structural rewrites belong in later steps."""

    def step(raw: Any) -> dict[str, Any]:
        if not isinstance(raw, dict):
            key = _LIST_ENVELOPE.get(kind)
            if key is None:
                raise ValueError(f"corrupt {kind} artifact: expected an object")
            raw = {key: raw}
        return {**raw, "version": "v2"}

    return step


# kind → {from_version: step}; each step returns the NEXT version's shape
_MIGRATIONS: dict[str, dict[int, Callable[[Any], dict[str, Any]]]] = {
    kind: {1: _v1_to_v2(kind)} for kind in CURRENT_VERSIONS
}


def detect_version(raw: Any) -> int:
    if isinstance(raw, dict):
        v = raw.get("version")
        if isinstance(v, str) and v.startswith("v") and v[1:].isdigit():
            return int(v[1:])
        if isinstance(v, int):
            return v
    return 1  # pre-versioning layouts (r1–r3)


def upgrade(kind: str, raw: Any) -> tuple[dict[str, Any], bool]:
    """Apply the migration chain; returns (current-shape payload,
    whether any step ran). Refuses to load artifacts from the FUTURE —
    a downgraded binary must not silently misread a newer layout
    (reference migration::Error semantics)."""
    current = CURRENT_VERSIONS[kind]
    v = detect_version(raw)
    if v > current:
        raise ValueError(
            f"{kind} artifact has version v{v}, newer than supported v{current}"
        )
    changed = False
    while v < current:
        step = _MIGRATIONS[kind].get(v)
        if step is None:
            raise ValueError(f"no migration for {kind} v{v}→v{v + 1}")
        raw = step(raw)
        v += 1
        changed = True
    return raw, changed


def stamped(kind: str, payload: dict[str, Any]) -> dict[str, Any]:
    """Current-version envelope for a payload about to be persisted."""
    return {**payload, "version": f"v{CURRENT_VERSIONS[kind]}"}


def load_versioned(kind: str, path: str, write_back: bool = True) -> dict[str, Any] | None:
    """Read + upgrade an artifact; rewrite it in place when a migration
    ran (the reference's boot-time put_remote_metadata after migrate,
    src/migration/mod.rs). Returns None when absent. All IO goes through
    the metastore seam (metastore.py) so the metadata backend is
    swappable independently of the data store."""
    from .metastore import get_metastore

    ms = get_metastore()
    raw = ms.get_json(path)
    if raw is None:
        return None
    payload, changed = upgrade(kind, raw)
    if changed and write_back:
        ms.put_json(path, payload)
    return payload


def save_versioned(kind: str, path: str, payload: dict[str, Any], indent: int | None = None) -> None:
    """Stamp + persist through the metastore seam (atomic)."""
    from .metastore import get_metastore

    get_metastore().put_json(path, stamped(kind, payload), indent=indent)
