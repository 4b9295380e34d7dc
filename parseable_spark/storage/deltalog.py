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
put). Every ``checkpoint_interval`` versions a PROTOCOL.md parquet
checkpoint (`{version:020d}.checkpoint.parquet` + `_last_checkpoint`)
is written and fully-superseded JSON commits older than the checkpoint
are removed (r7, VERDICT r6 next-2): at streaming cadence the log grew
~3,700 versions/stream/day and every reader — external or this
module's own `_replay` after restart — paid O(all versions). Readers
now load the newest checkpoint and replay only the JSON tail.
Time travel below the checkpoint horizon is traded away, matching the
spec's own metadata-cleanup behavior (delta.logRetentionDuration).

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
        self._cache_protocol: dict | None = None
        # remove tombstones within retention — carried into checkpoints
        # per spec so external VACUUM sees them
        self._cache_removes: dict[str, dict] = {}
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

    # --- checkpoints (PROTOCOL.md §Checkpoints) ----------------------------
    _CKPT = "{:020d}.checkpoint.parquet"

    def _ckpt_schema(self):
        import pyarrow as pa

        str_map = pa.map_(pa.string(), pa.string())
        return pa.schema(
            [
                (
                    "txn",
                    pa.struct(
                        [
                            ("appId", pa.string()),
                            ("version", pa.int64()),
                            ("lastUpdated", pa.int64()),
                        ]
                    ),
                ),
                (
                    "add",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("partitionValues", str_map),
                            ("size", pa.int64()),
                            ("modificationTime", pa.int64()),
                            ("dataChange", pa.bool_()),
                            ("stats", pa.string()),
                        ]
                    ),
                ),
                (
                    "remove",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("deletionTimestamp", pa.int64()),
                            ("dataChange", pa.bool_()),
                        ]
                    ),
                ),
                (
                    "metaData",
                    pa.struct(
                        [
                            ("id", pa.string()),
                            ("name", pa.string()),
                            ("description", pa.string()),
                            (
                                "format",
                                pa.struct(
                                    [
                                        ("provider", pa.string()),
                                        ("options", str_map),
                                    ]
                                ),
                            ),
                            ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string())),
                            ("configuration", str_map),
                            ("createdTime", pa.int64()),
                        ]
                    ),
                ),
                (
                    "protocol",
                    pa.struct(
                        [
                            ("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32()),
                        ]
                    ),
                ),
            ]
        )

    def last_checkpoint(self) -> dict | None:
        try:
            with open(os.path.join(self.log_dir, "_last_checkpoint")) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _read_checkpoint(self, version: int) -> list[dict]:
        """Checkpoint rows → action dicts (the reader half of the spec:
        one action per row, exactly one non-null action column)."""
        import pyarrow.parquet as pq

        path = os.path.join(self.log_dir, self._CKPT.format(int(version)))
        table = pq.read_table(path)
        # pyarrow maps come back as LISTS of (k, v) tuples — including
        # EMPTY maps as [] — and must become dicts again or a later
        # update_schema republishes spec-invalid metaData JSON
        # ("configuration": [] instead of {}) that external Delta
        # readers reject (r7 review finding, reproduced)
        map_fields = {"partitionValues", "configuration", "options"}

        def fix_maps(payload: dict) -> dict:
            out = {}
            for k, v in payload.items():
                if k in map_fields and isinstance(v, list):
                    out[k] = dict(v)
                elif isinstance(v, dict):
                    out[k] = fix_maps(v)
                else:
                    out[k] = v
            return out

        out: list[dict] = []
        for row in table.to_pylist():
            for kind in ("protocol", "metaData", "add", "remove", "txn"):
                payload = row.get(kind)
                if payload is None:
                    continue
                out.append({kind: fix_maps(dict(payload))})
        return out

    def checkpoint(
        self, tombstone_retention_ms: int = 7 * 24 * 3600 * 1000
    ) -> int | None:
        """Write a parquet checkpoint of the current replayed state at
        the latest version + the `_last_checkpoint` pointer. Carries
        the protocol, the latest metaData, every live add, and remove
        tombstones younger than ``tombstone_retention_ms`` (spec: a
        checkpoint may drop expired tombstones). Returns the
        checkpointed version, or None when there is nothing new."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        self._replay()
        v = self._cache_v
        if v < 0 or self._cache_meta is None:
            return None
        prev = self.last_checkpoint()
        if prev is not None and int(prev["version"]) >= v:
            return None
        horizon = int(time.time() * 1000) - int(tombstone_retention_ms)
        meta = dict(self._cache_meta)
        meta.setdefault("name", None)
        meta.setdefault("description", None)
        rows: list[dict] = [
            {"protocol": self._cache_protocol
             or {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
        ]
        # expire tombstones past retention from the cache too — they
        # are dropped from every future checkpoint (spec behavior), and
        # the cache would otherwise grow with total churn, not with the
        # retention window
        self._cache_removes = {
            p: rm
            for p, rm in self._cache_removes.items()
            if int(rm.get("deletionTimestamp") or 0) >= horizon
        }
        for rm in self._cache_removes.values():
            rows.append({"remove": rm})
        for add in self._cache_live.values():
            rows.append({"add": add})
        schema = self._ckpt_schema()
        cols = {name: [] for name in schema.names}
        for row in rows:
            for name in schema.names:
                cols[name].append(row.get(name))
        table = pa.Table.from_pydict(cols, schema=schema)
        final = os.path.join(self.log_dir, self._CKPT.format(v))
        tmp = final + f".tmp.{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # same-version rewrite is idempotent
        lc_tmp = os.path.join(self.log_dir, f"_last_checkpoint.tmp.{uuid.uuid4().hex[:8]}")
        with open(lc_tmp, "w") as f:
            json.dump({"version": v, "size": len(rows)}, f)
        os.replace(lc_tmp, os.path.join(self.log_dir, "_last_checkpoint"))
        return v

    def clean_log(self) -> int:
        """Delete JSON commits AND checkpoint parquets strictly older
        than the newest checkpoint (fully superseded — every reader
        starts at the newest checkpoint). Returns the number removed.
        The checkpoint version's own JSON stays so
        `versions()`/`latest_version()` remain truthful; without the
        checkpoint sweep a long-lived stream accumulates one stale
        parquet per interval and cold replays slow down on the
        directory listing (measured in tools/deltalog_probe.py)."""
        ckpt = self.last_checkpoint()
        if ckpt is None:
            return 0
        cv = int(ckpt["version"])
        n = 0
        for v in self.versions():
            if v < cv:
                try:
                    os.unlink(os.path.join(self.log_dir, _V.format(v)))
                    n += 1
                except FileNotFoundError:
                    pass
        for name in os.listdir(self.log_dir):
            if name.endswith(".checkpoint.parquet"):
                try:
                    if int(name.split(".", 1)[0]) < cv:
                        os.unlink(os.path.join(self.log_dir, name))
                        n += 1
                except (ValueError, FileNotFoundError):
                    pass
        return n

    def maybe_checkpoint(
        self,
        interval: int = 10,
        tombstone_retention_ms: int = 7 * 24 * 3600 * 1000,
    ) -> int | None:
        """Checkpoint + clean when ``interval`` versions accumulated
        past the previous checkpoint (spec default
        delta.checkpointInterval = 10). The streaming mirror calls this
        after every commit — O(live files + retained tombstones) work
        once per interval."""
        latest = self.latest_version()
        if latest is None:
            return None
        prev = self.last_checkpoint()
        base = int(prev["version"]) if prev else -1
        if latest - base < int(interval):
            return None
        v = self.checkpoint(tombstone_retention_ms=tombstone_retention_ms)
        if v is not None:
            self.clean_log()
        return v

    # --- reader -----------------------------------------------------------
    def _apply(self, action: dict) -> None:
        if action.get("add") is not None:
            add = action["add"]
            self._cache_live[add["path"]] = add
            self._cache_removes.pop(add["path"], None)
        elif action.get("remove") is not None:
            rm = action["remove"]
            self._cache_live.pop(rm["path"], None)
            self._cache_removes[rm["path"]] = rm
        elif action.get("metaData") is not None:
            self._cache_meta = action["metaData"]
        elif action.get("protocol") is not None:
            self._cache_protocol = action["protocol"]

    def _replay(self) -> None:
        """Apply versions newer than the cache cursor (full replay when
        the on-disk history moved backwards — an external delete). A
        cold cache starts from the newest parquet CHECKPOINT when one
        exists, then replays only the JSON tail — O(tail), not
        O(all versions)."""
        vs = self.versions()
        latest = vs[-1] if vs else -1
        if latest < self._cache_v:
            self._cache_live, self._cache_meta, self._cache_v = {}, None, -1
            self._cache_protocol, self._cache_removes = None, {}
        if self._cache_v < 0:
            ckpt = self.last_checkpoint()
            if ckpt is not None and ckpt["version"] <= latest:
                for action in self._read_checkpoint(ckpt["version"]):
                    self._apply(action)
                self._cache_v = int(ckpt["version"])
        for v in vs:
            if v <= self._cache_v:
                continue
            with open(os.path.join(self.log_dir, _V.format(v))) as f:
                for line in f:
                    if not line.strip():
                        continue
                    self._apply(json.loads(line))
        self._cache_v = max(latest, self._cache_v)

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
