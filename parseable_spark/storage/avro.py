"""Minimal Apache Avro binary codec + object-container file support.

Written from the PUBLIC Avro 1.11 specification
(avro.apache.org/docs/current/specification) because Iceberg's
manifest and manifest-list files are REQUIRED to be Avro and no avro
library ships in this environment. Supports exactly what Iceberg
metadata needs: null/boolean/int/long/float/double/bytes/string,
records, arrays, maps, fixed, and unions (the ["null", T] optional
shape), with the writer schema embedded in the container header so any
real Avro reader (and our own reader) decodes files self-describedly.

Container layout (spec "Object Container Files"):
  magic 'Obj\\x01'
  file metadata map {avro.schema: <json>, avro.codec: null}
  16-byte sync marker
  blocks: [count(long) size(long) payload sync]*

Encoding (spec "Binary Encoding"): int/long are zigzag varints;
float/double little-endian IEEE; string/bytes length-prefixed; arrays
and maps are blocked with a zero terminator; unions prefix the branch
index; records concatenate fields in schema order.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Iterator

MAGIC = b"Obj\x01"


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(int(n))
    while True:
        if z & ~0x7F:
            buf.append((z & 0x7F) | 0x80)
            z >>= 7
        else:
            buf.append(z)
            return


def write_bytes(buf: bytearray, b: bytes) -> None:
    write_long(buf, len(b))
    buf += b


def write_str(buf: bytearray, s: str) -> None:
    write_bytes(buf, s.encode("utf-8"))


class _Cursor:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        z, shift = 0, 0
        while True:
            b = self.take(1)[0]
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return _unzigzag(z)

    def read_bytes(self) -> bytes:
        return self.take(self.read_long())

    def read_str(self) -> str:
        return self.read_bytes().decode("utf-8")


def _schema_type(schema: Any) -> Any:
    """A schema is a string name, a dict, or a union list."""
    if isinstance(schema, dict) and isinstance(schema.get("type"), str):
        return schema["type"]
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    raise ValueError(f"unsupported avro schema {schema!r}")


def encode(buf: bytearray, schema: Any, value: Any) -> None:
    t = _schema_type(schema)
    if t == "union":
        # optional shape ["null", T] (and general unions by python type
        # sniffing is NOT attempted — Iceberg only needs null-or-T)
        if value is None:
            idx = schema.index("null") if "null" in schema else 0
            write_long(buf, idx)
            return
        for i, branch in enumerate(schema):
            if branch != "null":
                write_long(buf, i)
                encode(buf, branch, value)
                return
        raise ValueError("union has no non-null branch")
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if value else 0)
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf += struct.pack("<f", float(value))
    elif t == "double":
        buf += struct.pack("<d", float(value))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_str(buf, value)
    elif t == "fixed":
        raw = bytes(value)
        if len(raw) != int(schema["size"]):
            raise ValueError("fixed size mismatch")
        buf += raw
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                encode(buf, f["type"], f["default"])
            else:
                encode(buf, f["type"], value[f["name"]])
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                encode(buf, schema["items"], it)
        write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                write_str(buf, k)
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode(cur: _Cursor, schema: Any) -> Any:
    t = _schema_type(schema)
    if t == "union":
        idx = cur.read_long()
        return decode(cur, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return cur.take(1)[0] == 1
    if t in ("int", "long"):
        return cur.read_long()
    if t == "float":
        return struct.unpack("<f", cur.take(4))[0]
    if t == "double":
        return struct.unpack("<d", cur.take(8))[0]
    if t == "bytes":
        return cur.read_bytes()
    if t == "string":
        return cur.read_str()
    if t == "fixed":
        return cur.take(int(schema["size"]))
    if t == "record":
        return {f["name"]: decode(cur, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = cur.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                cur.read_long()
                n = -n
            for _ in range(n):
                out.append(decode(cur, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = cur.read_long()
            if n == 0:
                return out
            if n < 0:
                cur.read_long()
                n = -n
            for _ in range(n):
                k = cur.read_str()
                out[k] = decode(cur, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
) -> None:
    """One-block object container file (crash-safe: temp + rename)."""
    sync = os.urandom(16)
    header = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")),
        "avro.codec": "null",
        **(metadata or {}),
    }
    write_long(header, len(meta))
    for k, v in meta.items():
        write_str(header, k)
        write_bytes(header, v.encode("utf-8"))
    write_long(header, 0)
    header += sync

    payload = bytearray()
    for rec in records:
        encode(payload, schema, rec)
    block = bytearray()
    write_long(block, len(records))
    write_long(block, len(payload))
    block += payload
    block += sync

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(header))
        if records:
            f.write(bytes(block))
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """→ (writer schema, records). Decodes with the embedded writer
    schema, like any spec-compliant reader."""
    with open(path, "rb") as f:
        cur = _Cursor(f.read())
    if cur.take(4) != MAGIC:
        raise ValueError(f"not an avro container: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = cur.read_long()
        if n == 0:
            break
        if n < 0:
            cur.read_long()
            n = -n
        for _ in range(n):
            k = cur.read_str()
            meta[k] = cur.read_bytes()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", ""):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = cur.take(16)
    records: list[dict] = []
    while cur.pos < len(cur.data):
        count = cur.read_long()
        cur.read_long()  # block byte size
        for _ in range(count):
            records.append(decode(cur, schema))
        if cur.take(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def iter_container(path: str) -> Iterator[dict]:
    _, records = read_container(path)
    yield from records
