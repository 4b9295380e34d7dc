"""Delta Lake transaction-log backend (optional, SURVEY §1.6 option b).

Writes the PUBLIC Delta Lake table protocol (delta.io PROTOCOL.md;
reader version 1 / writer version 2 — the JSON-actions subset every
Delta reader must support) so a stream's data directory IS a valid
Delta table: any external Delta client (delta-spark, delta-rs, DuckDB
delta) can read the stream's committed state with zero knowledge of
this engine's manifest/snapshot metadata. The delta-spark jar is not
available in this container (no network), so round-tripping through
the real reader is env-gated; the protocol shape is pinned by tests
against the published spec and an independent replay reader here.

Integration: a diff-driven MIRROR of the manifest. After every
manifest commit (flush / compaction swap / retention delete), `sync`
diffs the manifest's file list against the log's replayed state and
commits one version containing exactly the `add` / `remove` actions of
that transition — idempotent (no diff → no commit), and every
committed version is a consistent snapshot some query actually saw.

Log layout (spec): `_delta_log/{version:020d}.json`, one JSON action
per line; version files are immutable and created with put-if-absent
(hard-link publish — the local-FS equivalent of the spec's atomic
put). Checkpoints are an optional performance feature of the protocol
and are not written; readers replay from version 0 (bounded here:
compaction keeps file counts low, so actions-per-version stay small).

Reference parity note (count fast path): `add.stats.numRecords` is
the same per-file row count the manifest carries, so a Delta reader's
metadata-only COUNT(*) equals `Manifest.total_rows()` — test-pinned.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

_V = "{:020d}.json"


class DeltaLog:
    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)
        # incremental replay cache: without it every sync re-opens and
        # re-parses the whole version history (O(versions²) cumulative
        # over a stream's life — ~43k files/flush after a month at the
        # 60 s cadence; review finding). Only versions newer than
        # _cache_v are applied; an externally-removed version file
        # (latest < cached cursor) forces a full replay.
        self._cache_live: dict[str, dict] = {}
        self._cache_meta: dict | None = None
        self._cache_v = -1

    # --- versions ---------------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and len(name) == 25:
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _publish(self, version: int, lines: list[dict]) -> None:
        """Atomic put-if-absent: write a temp file, hard-link it to the
        final name (link(2) fails with EEXIST if the version was
        already committed — two writers can never both win), unlink
        the temp. The spec's 'mutual exclusion on version file
        creation' for local filesystems."""
        final = os.path.join(self.log_dir, _V.format(version))
        tmp = final + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            for obj in lines:
                f.write(json.dumps(obj, separators=(",", ":")) + "\n")
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise FileExistsError(
                f"delta version {version} already committed (concurrent writer)"
            ) from None
        finally:
            os.unlink(tmp)

    # --- actions ----------------------------------------------------------
    def init_table(self, schema_json: str, partition_columns: list[str]) -> None:
        """Version 0: protocol + metaData (spec: both REQUIRED in the
        first version). No-op when the log already exists."""
        if self.latest_version() is not None:
            return
        self._publish(
            0,
            [
                {
                    "commitInfo": {
                        "timestamp": int(time.time() * 1000),
                        "operation": "CREATE TABLE",
                        "operationParameters": {},
                        "engineInfo": "parseable-spark",
                    }
                },
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_json,
                        "partitionColumns": partition_columns,
                        "configuration": {},
                        "createdTime": int(time.time() * 1000),
                    }
                },
            ],
        )

    def update_schema(self, schema_json: str) -> int | None:
        """Emit a new metaData action when the schema evolved (the
        registry grows as events add fields). Table id and creation
        time are preserved from the existing metadata; readers take
        the LATEST metaData per spec reconciliation."""
        meta = self.metadata()
        if meta is None or meta["schemaString"] == schema_json:
            return None
        meta = dict(meta)
        meta["schemaString"] = schema_json
        version = (self.latest_version() or 0) + 1
        self._publish(
            version,
            [
                {
                    "commitInfo": {
                        "timestamp": int(time.time() * 1000),
                        "operation": "CHANGE SCHEMA",
                        "operationParameters": {},
                        "engineInfo": "parseable-spark",
                    }
                },
                {"metaData": meta},
            ],
        )
        return version

    def commit_diff(
        self, files: list[Any], operation: str = "WRITE"
    ) -> int | None:
        """One version moving the table from its replayed state to
        exactly ``files`` (manifest FileStats objects with absolute
        paths under table_dir). Returns the committed version, or None
        when the states already match (idempotent mirror)."""
        current = self.snapshot()
        want: dict[str, Any] = {}
        for f in files:
            rel = os.path.relpath(f.file_path, self.table_dir).replace(os.sep, "/")
            want[rel] = f
        adds = [p for p in want if p not in current]
        removes = [p for p in current if p not in want]
        if not adds and not removes:
            return None
        now_ms = int(time.time() * 1000)
        lines: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": operation,
                    "operationParameters": {},
                    "engineInfo": "parseable-spark",
                }
            }
        ]
        for p in removes:
            lines.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
        for p in adds:
            f = want[p]
            stats = {
                "numRecords": f.num_rows,
                "minValues": {
                    c: s["min"]
                    for c, s in f.columns.items()
                    if s.get("min") is not None
                },
                "maxValues": {
                    c: s["max"]
                    for c, s in f.columns.items()
                    if s.get("max") is not None
                },
                "nullCount": {
                    c: s["nulls"]
                    for c, s in f.columns.items()
                    if s.get("nulls") is not None
                },
            }
            lines.append(
                {
                    "add": {
                        # partitionColumns is [] (the date=/hour=/minute=
                        # dirs are derived layout, not table columns —
                        # every column lives IN the parquet), so
                        # partitionValues is {} per spec; subdirs in
                        # `path` are allowed
                        "path": p,
                        "partitionValues": {},
                        "size": f.file_size,
                        "modificationTime": now_ms,
                        "dataChange": True,
                        "stats": json.dumps(stats, default=str),
                    }
                }
            )
        version = (self.latest_version() or 0) + 1
        self._publish(version, lines)
        return version

    # --- reader -----------------------------------------------------------
    def _replay(self) -> None:
        """Apply versions newer than the cache cursor (full replay when
        the on-disk history moved backwards — an external delete)."""
        vs = self.versions()
        latest = vs[-1] if vs else -1
        if latest < self._cache_v:
            self._cache_live, self._cache_meta, self._cache_v = {}, None, -1
        for v in vs:
            if v <= self._cache_v:
                continue
            with open(os.path.join(self.log_dir, _V.format(v))) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        self._cache_live[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        self._cache_live.pop(action["remove"]["path"], None)
                    elif "metaData" in action:
                        self._cache_meta = action["metaData"]
        self._cache_v = latest

    def snapshot(self) -> dict[str, dict]:
        """rel_path -> add action payload for every live file (spec
        reconciliation: the latest add wins; a remove drops the path).
        The independent reader used by the tests and `live_paths`.
        Returns a copy — callers must not mutate the cache."""
        self._replay()
        return dict(self._cache_live)

    def live_paths(self) -> list[str]:
        return [
            os.path.join(self.table_dir, p.replace("/", os.sep))
            for p in sorted(self.snapshot())
        ]

    def metadata(self) -> dict | None:
        """Latest metaData action (schema evolution replays forward)."""
        self._replay()
        return dict(self._cache_meta) if self._cache_meta else None

    def num_records(self) -> int:
        """Metadata-only COUNT(*) from add.stats — the Delta-side twin
        of Manifest.total_rows (count-fast-path parity)."""
        total = 0
        for add in self.snapshot().values():
            stats = json.loads(add.get("stats") or "{}")
            total += int(stats.get("numRecords") or 0)
        return total
