"""Static (user-declared) stream schemas.

Parity with the reference's static-schema streams (src/static_schema.rs,
validate_static_schema src/parseable/mod.rs:1336-1365): a stream
created with `x-p-static-schema-flag: true` declares its full field
list up front — `{"fields": [{"name": ..., "data_type": ...}]}` — and
ingestion then REJECTS events whose (flattened, inferred) fields are
not in the declared schema (is_schema_matching,
src/event/format/mod.rs:213-233). No evolution, no surprise columns.

Type mapping into this engine's vocabulary: int→int64,
double/float→float64, boolean→bool, string→utf8, datetime→timestamp_ms.
`date` also maps to timestamp_ms (this engine has no separate date
physical type). The reference's `*_list` types map to their ELEMENT
types because V1 flattening represents arrays by row explosion — a
`string_list` field arrives as one utf8 value per exploded row.
"""

from __future__ import annotations

from typing import Any

from . import schema as sc

DEFAULT_TIMESTAMP_KEY = "p_timestamp"  # events.DEFAULT_TIMESTAMP_KEY (no import cycle)
RESERVED_COLUMNS = (DEFAULT_TIMESTAMP_KEY, "date", "hour", "minute")  # events.RESERVED_COLUMNS

STATIC_TYPES: dict[str, str] = {
    "int": sc.INT64,
    "double": sc.FLOAT64,
    "float": sc.FLOAT64,
    "boolean": sc.BOOL,
    "string": sc.UTF8,
    "datetime": sc.TIMESTAMP_MS,
    "date": sc.TIMESTAMP_MS,
    "string_list": sc.UTF8,
    "int_list": sc.INT64,
    "double_list": sc.FLOAT64,
    "float_list": sc.FLOAT64,
    "boolean_list": sc.BOOL,
}


def parse_static_schema(
    body: Any,
    custom_partition: str | None = None,
    time_partition: str = "",
) -> dict[str, str]:
    """Validate and convert a declared schema to the committed-schema
    field map. Raises ValueError with the reference's failure modes:
    empty schema, empty/duplicate field names, unrecognized data type,
    custom-partition or time-partition fields missing from the
    declaration, reserved names."""
    if not isinstance(body, dict) or not isinstance(body.get("fields"), list):
        raise ValueError(
            "static schema body must be {'fields': [{'name', 'data_type'}, ...]}"
        )
    declared = body["fields"]
    if not declared:
        raise ValueError("static schema must declare at least one field")

    fields: dict[str, str] = {}
    time_partition_seen = False
    for f in declared:
        name = (f or {}).get("name") or ""
        dtype = (f or {}).get("data_type") or ""
        if not name:
            raise ValueError("static schema field name must not be empty")
        if name in RESERVED_COLUMNS:
            raise ValueError(f"field {name} is a reserved column")
        if name in fields:
            raise ValueError(f"duplicate field {name!r} in static schema")
        if time_partition and name == time_partition:
            time_partition_seen = True
            dtype = "datetime"  # the reference forces the partition column
        if dtype not in STATIC_TYPES:
            raise ValueError(f"unrecognized data type {dtype!r} for field {name!r}")
        fields[name] = STATIC_TYPES[dtype]

    if time_partition and not time_partition_seen:
        raise ValueError(
            f"time partition field {time_partition!r} missing from static schema"
        )
    for part in (custom_partition or "").split(","):
        part = part.strip()
        if part and part not in fields:
            raise ValueError(
                f"custom partition field {part!r} missing from static schema"
            )
    return fields
