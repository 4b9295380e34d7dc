"""Apache Iceberg v2 table-metadata mirror (SURVEY §1.6 option (b),
the second external mirror behind the diff-driven seam `deltalog.py`
established — VERDICT r6 next-8).

Writes the PUBLIC Iceberg table spec v2 (iceberg.apache.org/spec) so a
stream's data directory is a readable Iceberg table for any external
client (pyiceberg StaticTable, Spark's iceberg runtime, Trino):

- ``metadata/v{N}.metadata.json`` — table metadata (format-version 2,
  schemas with field-ids, unpartitioned spec, snapshots, refs/main),
  published put-if-absent (hard link) with a ``version-hint.text``
  pointer — the HadoopTables filesystem-catalog layout.
- ``metadata/snap-{id}.avro`` — the snapshot's manifest LIST (one
  ``manifest_file`` record), Avro per spec (hand-rolled codec in
  `avro.py` — no avro library ships here).
- ``metadata/{uuid}-m0.avro`` — the manifest: one ``manifest_entry``
  per live data file with spec field-ids, record_count and
  file_size_in_bytes (metadata-only COUNT(*) parity with the engine
  manifest, same as the Delta mirror's add.stats).

Simplifications (documented, deliberate):
- every commit snapshot carries ONE manifest listing the FULL live set
  as ADDED entries (operation "overwrite" semantics). O(live files)
  metadata per commit — bounded by the engine's own compaction; a
  production Iceberg writer appends incremental manifests and
  compacts them separately.
- snapshot history is trimmed to the newest ``keep_snapshots``;
  dropped snapshots' manifest-list/manifest files are deleted (the
  spec's remove-snapshots maintenance), so metadata size is flat over
  a stream's life.
- field-ids are assigned depth-first in schema order; the ingest
  registry only ever APPENDS fields, so ids are stable across schema
  evolution (a reorder would break this — the registry can't reorder).

Like the Delta mirror: the engine manifest stays the commit authority;
`commit` diffs against the REPLAYED state and is a no-op when nothing
changed, so replays/crashes self-heal on the next sync.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from . import avro

_ENTRY_STATUS_ADDED = 1
_ENTRY_STATUS_DELETED = 2


# --- spark schema json -> iceberg schema -------------------------------------

_PRIMITIVES = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def _iceberg_type(spark_type: Any, next_id: list[int]) -> Any:
    if isinstance(spark_type, str):
        if spark_type in _PRIMITIVES:
            return _PRIMITIVES[spark_type]
        if spark_type.startswith("decimal"):
            inner = spark_type[len("decimal") :].strip("()")
            p, s = (x.strip() for x in inner.split(","))
            return f"decimal({p}, {s})"
        raise ValueError(f"unmapped spark type {spark_type!r}")
    t = spark_type.get("type")
    if t == "array":
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(spark_type["elementType"], next_id),
            "element-required": not spark_type.get("containsNull", True),
        }
    if t == "struct":
        return {
            "type": "struct",
            "fields": _iceberg_fields(spark_type["fields"], next_id),
        }
    if t == "map":
        kid, vid = next_id[0], next_id[0] + 1
        next_id[0] += 2
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(spark_type["keyType"], next_id),
            "value-id": vid,
            "value": _iceberg_type(spark_type["valueType"], next_id),
            "value-required": not spark_type.get("valueContainsNull", True),
        }
    raise ValueError(f"unmapped spark type {spark_type!r}")


def _iceberg_fields(spark_fields: list[dict], next_id: list[int]) -> list[dict]:
    out = []
    for f in spark_fields:
        fid = next_id[0]
        next_id[0] += 1
        out.append(
            {
                "id": fid,
                "name": f["name"],
                "required": not f.get("nullable", True),
                "type": _iceberg_type(f["type"], next_id),
            }
        )
    return out


def iceberg_schema(spark_schema_json: str, schema_id: int = 0) -> tuple[dict, int]:
    """→ (iceberg schema struct, last assigned column id)."""
    fields = json.loads(spark_schema_json)["fields"]
    next_id = [1]
    ice_fields = _iceberg_fields(fields, next_id)
    return (
        {"schema-id": schema_id, "type": "struct", "fields": ice_fields},
        next_id[0] - 1,
    )


# --- avro schemas (spec appendix; Java Avro field names + field-ids) ---------


def _manifest_entry_schema() -> dict:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": []},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def _manifest_file_schema() -> dict:
    f = lambda name, typ, fid: {"name": name, "type": typ, "field-id": fid}  # noqa: E731
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            f("manifest_path", "string", 500),
            f("manifest_length", "long", 501),
            f("partition_spec_id", "int", 502),
            f("content", "int", 517),
            f("sequence_number", "long", 515),
            f("min_sequence_number", "long", 516),
            f("added_snapshot_id", "long", 503),
            f("added_data_files_count", "int", 504),
            f("existing_data_files_count", "int", 505),
            f("deleted_data_files_count", "int", 506),
            f("added_rows_count", "long", 512),
            f("existing_rows_count", "long", 513),
            f("deleted_rows_count", "long", 514),
        ],
    }


class IcebergMirror:
    def __init__(self, table_dir: str, keep_snapshots: int = 8) -> None:
        self.table_dir = table_dir
        self.meta_dir = os.path.join(table_dir, "metadata")
        self.keep_snapshots = int(keep_snapshots)
        os.makedirs(self.meta_dir, exist_ok=True)

    # --- versioning --------------------------------------------------------
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int | None:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _metadata_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.metadata.json")

    def metadata(self) -> dict | None:
        v = self.current_version()
        if v is None:
            return None
        try:
            with open(self._metadata_path(v)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _publish(self, version: int, meta: dict) -> None:
        """Put-if-absent version publish (hard link, like deltalog),
        then flip the version hint."""
        final = self._metadata_path(version)
        tmp = final + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, separators=(",", ":"))
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise FileExistsError(
                f"iceberg metadata v{version} already committed"
            ) from None
        finally:
            os.unlink(tmp)
        hint_tmp = self._hint_path() + ".tmp"
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, self._hint_path())

    # --- reader (independent replay) ----------------------------------------
    def _current_snapshot(self, meta: dict) -> dict | None:
        sid = meta.get("current-snapshot-id", -1)
        for s in meta.get("snapshots", []):
            if s["snapshot-id"] == sid:
                return s
        return None

    def live_entries(self) -> list[dict]:
        """Replay: version hint → metadata → manifest list → manifests
        → non-deleted entries. This is what any spec reader does."""
        meta = self.metadata()
        if meta is None:
            return []
        snap = self._current_snapshot(meta)
        if snap is None:
            return []
        out: list[dict] = []
        _, manifests = avro.read_container(
            self._local(snap["manifest-list"])
        )
        for mf in manifests:
            _, entries = avro.read_container(self._local(mf["manifest_path"]))
            for e in entries:
                if e["status"] != _ENTRY_STATUS_DELETED:
                    out.append(e)
        return out

    def live_paths(self) -> list[str]:
        return sorted(
            self._local(e["data_file"]["file_path"]) for e in self.live_entries()
        )

    def num_records(self) -> int:
        return sum(e["data_file"]["record_count"] for e in self.live_entries())

    def _local(self, uri: str) -> str:
        return uri[len("file://") :] if uri.startswith("file://") else uri

    def _uri(self, path: str) -> str:
        return path if path.startswith("file://") else "file://" + path

    # --- writer --------------------------------------------------------------
    def commit(
        self, files: list[Any], schema_json: str, operation: str = "WRITE"
    ) -> int | None:
        """One snapshot moving the table to exactly ``files`` (engine
        FileStats with absolute paths). No-op (None) when the replayed
        live set already matches — idempotent mirror, same seam as
        DeltaLog.commit_diff."""
        want = {f.file_path: f for f in files}
        if set(self.live_paths()) == set(want):
            meta = self.metadata()
            if meta is not None and self._schemas_match(meta, schema_json):
                return None
        prev = self.metadata()
        version = (self.current_version() or 0) + 1
        seq = (prev or {}).get("last-sequence-number", 0) + 1
        snap_id = int.from_bytes(os.urandom(8), "big") >> 1  # 63-bit
        now_ms = int(time.time() * 1000)

        # manifest: the full live set as ADDED entries of this snapshot
        entry_schema = _manifest_entry_schema()
        entries = []
        total_rows = 0
        for path, fs in sorted(want.items()):
            total_rows += fs.num_rows
            entries.append(
                {
                    "status": _ENTRY_STATUS_ADDED,
                    "snapshot_id": snap_id,
                    "sequence_number": None,  # inherited from manifest
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,  # DATA
                        "file_path": self._uri(path),
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": fs.num_rows,
                        "file_size_in_bytes": fs.file_size,
                    },
                }
            )
        manifest_path = os.path.join(
            self.meta_dir, f"{uuid.uuid4().hex}-m0.avro"
        )
        avro.write_container(
            manifest_path,
            entry_schema,
            entries,
            metadata={
                # keys the java/pyiceberg manifest reader expects
                "schema": json.dumps(
                    iceberg_schema(schema_json)[0], separators=(",", ":")
                ),
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            },
        )
        mlist_path = os.path.join(self.meta_dir, f"snap-{snap_id}.avro")
        avro.write_container(
            mlist_path,
            _manifest_file_schema(),
            [
                {
                    "manifest_path": self._uri(manifest_path),
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": 0,
                    "content": 0,  # data manifests
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": snap_id,
                    "added_data_files_count": len(entries),
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "added_rows_count": total_rows,
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            ],
            metadata={"format-version": "2"},
        )

        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": self._uri(mlist_path),
            "summary": {
                "operation": "delete" if not entries else "overwrite",
                "engine": "parseable-spark",
                "source-operation": operation,
                "added-data-files": str(len(entries)),
                "added-records": str(total_rows),
                "total-records": str(total_rows),
                "total-data-files": str(len(entries)),
            },
            "schema-id": 0,
        }
        snapshots = list((prev or {}).get("snapshots", [])) + [snapshot]
        dropped = snapshots[: -self.keep_snapshots]
        snapshots = snapshots[-self.keep_snapshots :]

        schema_struct, last_col = iceberg_schema(schema_json)
        meta = {
            "format-version": 2,
            "table-uuid": (prev or {}).get("table-uuid", str(uuid.uuid4())),
            "location": self._uri(self.table_dir),
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": last_col,
            "schemas": [schema_struct],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {},
            "current-snapshot-id": snap_id,
            "refs": {"main": {"snapshot-id": snap_id, "type": "branch"}},
            "snapshots": snapshots,
            "snapshot-log": [
                {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
                for s in snapshots
            ],
            "metadata-log": [],
        }
        self._publish(version, meta)
        self._expire(dropped, version)
        return version

    def _schemas_match(self, meta: dict, schema_json: str) -> bool:
        return bool(meta.get("schemas")) and meta["schemas"][0] == (
            iceberg_schema(schema_json)[0]
        )

    def _expire(self, dropped: list[dict], current_version: int) -> None:
        """Remove-snapshots maintenance: delete dropped snapshots'
        manifest lists + manifests and metadata versions older than the
        retained window — keeps mirror metadata flat over a stream's
        life (the Delta mirror's clean_log twin)."""
        for s in dropped:
            mlist = self._local(s["manifest-list"])
            try:
                _, manifests = avro.read_container(mlist)
                for mf in manifests:
                    try:
                        os.unlink(self._local(mf["manifest_path"]))
                    except FileNotFoundError:
                        pass
                os.unlink(mlist)
            except (FileNotFoundError, ValueError):
                continue
        # metadata version files: keep a window for readers mid-flight
        floor = current_version - 2 * self.keep_snapshots
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".metadata.json"):
                try:
                    v = int(name[1:].split(".", 1)[0])
                except ValueError:
                    continue
                if v < floor:
                    try:
                        os.unlink(os.path.join(self.meta_dir, name))
                    except FileNotFoundError:
                        pass
