"""Metastore seam — metadata transport, separated from the data store.

Reference: ``src/metastore/metastore_traits.rs:1-367`` defines a
``Metastore`` trait (get/put/delete of alerts, dashboards, filters,
manifests, schemas, stream metadata …) with an object-store-backed
default implementation (``object_store_metastore.rs``), so the
*metadata* backend can be swapped independently of the *data* backend.

Here the trait collapses to five transport primitives because every
artifact already flows through one choke point (``migration.py``'s
versioned load/save): whoever implements ``get_json``/``put_json``/
``exists``/``list_dirs``/``delete_prefix`` hosts ALL engine metadata —
server config, stream config/schema/retention, manifests, snapshots,
stats ledgers, tenant metadata. Parquet DATA never goes through this
seam (Spark reads/writes it directly), matching the reference's
metastore/object-store split.

The default is the filesystem implementation rooted wherever the
caller's paths point (same layout as r1–r3 — zero migration needed);
``InMemoryMetastore`` backs tests and ephemeral deployments. Swap with
``set_metastore()`` (the reference wires its global ``PARSEABLE.
metastore`` the same way at boot).
"""

from __future__ import annotations

import json
import os
import threading
from abc import ABC, abstractmethod
from typing import Any


class Metastore(ABC):
    """Transport primitives for JSON metadata artifacts. Paths are the
    same slash-separated keys the filesystem layout uses, so the
    filesystem implementation is a pass-through and alternate backends
    key a flat map by path."""

    @abstractmethod
    def get_json(self, path: str) -> Any | None:
        """Parsed artifact, or None when absent."""

    @abstractmethod
    def put_json(self, path: str, obj: Any, indent: int | None = None) -> None:
        """Atomic write (a reader never sees a torn artifact)."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def list_dirs(self, path: str) -> list[str]:
        """Immediate child directory names (stream/tenant discovery)."""

    @abstractmethod
    def delete_prefix(self, path: str) -> None:
        """Drop every artifact at or under the path (stream deletion)."""


class KeyMappedMetastore(Metastore):
    """Shared five-primitive implementation for object-store backends
    whose single-object PUT is atomic (readers see old or new bytes,
    never torn — S3 and Azure Blob both guarantee this, satisfying
    put_json's contract without the filesystem tmp+rename dance).

    Local-style artifact paths under ``root`` map to bucket keys under
    ``key_prefix``; subclasses supply only the transport verbs
    (_get/_put/_head/_list/_delete_many), so the mapping and the
    exists/list_dirs/delete_prefix semantics cannot drift between
    backends (review finding: S3Metastore and AzureMetastore were
    line-for-line copies)."""

    def __init__(self, root: str, key_prefix: str = "meta"):
        self.root = root.rstrip("/")
        self.prefix = key_prefix.strip("/")

    # -- transport verbs (subclass-provided) -----------------------------
    def _get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def _put(self, key: str, body: bytes) -> None:
        raise NotImplementedError

    def _head(self, key: str) -> bool:
        raise NotImplementedError

    def _list(
        self, prefix: str, delimiter: str | None = None,
        max_n: int | None = None, paged: bool = True,
    ) -> tuple[list[str], list[str]]:
        """(object keys, common prefixes) under `prefix`."""
        raise NotImplementedError

    def _delete_many(self, keys: list[str]) -> None:
        raise NotImplementedError

    # -- shared implementation -------------------------------------------
    def _key(self, path: str) -> str:
        p = path.replace("\\", "/").rstrip("/")
        if p == self.root:
            rel = ""
        elif p.startswith(self.root + "/"):
            rel = p[len(self.root) + 1 :]
        else:
            raise ValueError(f"path {path!r} outside metastore root {self.root!r}")
        return f"{self.prefix}/{rel}" if rel else self.prefix

    def get_json(self, path: str) -> Any | None:
        raw = self._get(self._key(path))
        return None if raw is None else json.loads(raw)

    def put_json(self, path: str, obj: Any, indent: int | None = None) -> None:
        body = json.dumps(obj, indent=indent, sort_keys=indent is not None)
        self._put(self._key(path), body.encode("utf-8"))

    def exists(self, path: str) -> bool:
        key = self._key(path)
        if self._head(key):
            return True
        # single-page probe: any one key under the prefix proves a "dir"
        keys, _ = self._list(key + "/", max_n=1, paged=False)
        return bool(keys)

    def list_dirs(self, path: str) -> list[str]:
        key = self._key(path)
        _, prefixes = self._list(key + "/", delimiter="/")
        return sorted(p[len(key) + 1 :].rstrip("/") for p in prefixes)

    def delete_prefix(self, path: str) -> None:
        key = self._key(path)
        keys, _ = self._list(key + "/")
        if self._head(key):
            keys.append(key)
        if keys:
            self._delete_many(keys)


class FilesystemMetastore(Metastore):
    """Default backend: artifacts live next to the data they describe,
    exactly the r1–r3 on-disk layout."""

    def get_json(self, path: str) -> Any | None:
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def put_json(self, path: str, obj: Any, indent: int | None = None) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=indent, sort_keys=indent is not None)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_dirs(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(
            n for n in os.listdir(path) if os.path.isdir(os.path.join(path, n))
        )

    def delete_prefix(self, path: str) -> None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


class InMemoryMetastore(Metastore):
    """Dict-backed backend: metadata never touches disk. Used by tests
    to prove the engine runs entirely through the seam, and usable for
    ephemeral/dev deployments (the analog of the reference's
    alternate Metastore implementations)."""

    def __init__(self) -> None:
        self._data: dict[str, str] = {}  # normalized path -> json text
        self._lock = threading.RLock()

    @staticmethod
    def _norm(path: str) -> str:
        return os.path.normpath(path)

    def get_json(self, path: str) -> Any | None:
        with self._lock:
            raw = self._data.get(self._norm(path))
        return None if raw is None else json.loads(raw)

    def put_json(self, path: str, obj: Any, indent: int | None = None) -> None:
        text = json.dumps(obj)  # dumps-then-set is atomic under the lock
        with self._lock:
            self._data[self._norm(path)] = text

    def exists(self, path: str) -> bool:
        # directory-prefix semantics match the filesystem and KeyMapped
        # backends (r7 review: exists('<root>/<stream>') must be True
        # when '<root>/<stream>/manifest.json' is stored, or a caller
        # relying on the shared contract silently misbehaves only on
        # this backend)
        base = self._norm(path)
        prefix = base + os.sep
        with self._lock:
            return base in self._data or any(
                k.startswith(prefix) for k in self._data
            )

    def list_dirs(self, path: str) -> list[str]:
        base = self._norm(path) + os.sep
        out = set()
        with self._lock:
            for k in self._data:
                if k.startswith(base):
                    rest = k[len(base):]
                    if os.sep in rest:
                        out.add(rest.split(os.sep, 1)[0])
        return sorted(out)

    def delete_prefix(self, path: str) -> None:
        base = self._norm(path)
        with self._lock:
            for k in list(self._data):
                if k == base or k.startswith(base + os.sep):
                    del self._data[k]


_default: Metastore = FilesystemMetastore()


def get_metastore() -> Metastore:
    return _default


def set_metastore(ms: Metastore) -> Metastore:
    """Install a backend; returns the previous one (tests restore it)."""
    global _default
    prev = _default
    _default = ms
    return prev
