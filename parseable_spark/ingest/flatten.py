"""JSON flattening — behavior parity with reference src/utils/json/flatten.rs.

- flatten(): nested objects become separator-joined keys
  (flatten.rs:67-103, flatten_object :223-249); separator is '_' for
  JSON ingest, '.' for OTel (call site src/utils/json/mod.rs:57-65).
- Arrays of objects are transposed to per-key arrays with null padding
  (flatten_array_objects, flatten.rs:252-296).
- generic_flattening(): cartesian explode of arrays-of-objects into
  multiple events (flatten.rs:310-369), applied only for SchemaVersion
  V1, nesting within the max level, and Json/Custom sources
  (mod.rs:46-56).
- has_more_than_max_allowed_levels (flatten.rs:376-389): depth gate.
"""

from __future__ import annotations

from typing import Any

DEFAULT_MAX_FLATTEN_LEVEL = 4  # reference P_MAX_FLATTEN_LEVEL default


class JsonFlattenError(ValueError):
    pass


class CannotFlatten(JsonFlattenError):
    def __init__(self):
        super().__init__("Cannot flatten this JSON")


class NonObjectInArray(JsonFlattenError):
    def __init__(self):
        super().__init__("Found non-object element while flattening array of objects")


class FieldError(JsonFlattenError):
    pass


def flatten_object(
    output: dict[str, Any],
    parent_key: str | None,
    nested: dict[str, Any],
    separator: str,
) -> None:
    """flatten.rs:223-249 — depth-first, insertion order preserved."""
    for key, value in nested.items():
        new_key = f"{parent_key}{separator}{key}" if parent_key is not None else key
        if isinstance(value, dict):
            flatten_object(output, new_key, value, separator)
        elif isinstance(value, list) and any(isinstance(v, dict) for v in value):
            flatten_array_objects(output, new_key, value, separator)
        else:
            output[new_key] = value


def flatten_array_objects(
    output: dict[str, Any],
    parent_key: str,
    arr: list[Any],
    separator: str,
) -> None:
    """flatten.rs:252-296 — transpose array-of-objects into per-key
    arrays, null-padded so every column has one slot per element."""
    columns: dict[str, list[Any]] = {}
    for index, value in enumerate(arr):
        if isinstance(value, dict):
            flat: dict[str, Any] = {}
            flatten_object(flat, parent_key, value, separator)
            for key, v in flat.items():
                columns.setdefault(key, [None] * index).append(v)
        elif value is None:
            for column in columns.values():
                column.append(None)
        else:
            raise NonObjectInArray()
        max_len = index + 1
        for column in columns.values():
            while len(column) < max_len:
                column.append(None)
    # reference uses a BTreeMap → keys committed in sorted order
    for key in sorted(columns):
        output[key] = columns[key]


def flatten(value: Any, separator: str = "_") -> Any:
    """flatten.rs:67-103 — flatten an object, or each element of a
    top-level array, in place semantics (returns the new value)."""
    if isinstance(value, dict):
        out: dict[str, Any] = {}
        flatten_object(out, None, value, separator)
        return out
    if isinstance(value, list):
        return [flatten(v, separator) for v in value]
    raise CannotFlatten()


def has_more_than_max_allowed_levels(
    value: Any, current_level: int = 1, max_level: int = DEFAULT_MAX_FLATTEN_LEVEL
) -> bool:
    """flatten.rs:376-389 — arrays do NOT add a level; objects do."""
    if current_level > max_level:
        return True
    if isinstance(value, list):
        return any(
            has_more_than_max_allowed_levels(v, current_level, max_level) for v in value
        )
    if isinstance(value, dict):
        return any(
            has_more_than_max_allowed_levels(v, current_level + 1, max_level)
            for v in value.values()
        )
    return False


def generic_flattening(value: Any) -> list[Any]:
    """flatten.rs:310-369 — cartesian explode: each array-of-anything
    field multiplies the event; nested objects are flattened through."""
    if isinstance(value, list):
        out: list[Any] = []
        for item in value:
            out.extend(generic_flattening(item))
        return out
    if isinstance(value, dict):
        results: list[dict[str, Any]] = [{}]
        for key, val in value.items():
            if isinstance(val, list):
                if not val:
                    for r in results:
                        r[key] = []
                else:
                    flattened_items = []
                    for item in val:
                        flattened_items.extend(generic_flattening(item))
                    # reference order: for each flattened item, over results
                    results = [
                        {**r, key: item} for item in flattened_items for r in results
                    ]
            elif isinstance(val, dict):
                nested = generic_flattening(val)
                results = [{**r, key: n} for n in nested for r in results]
            else:
                for r in results:
                    r[key] = val
        return list(results)
    return [value]


def validate_custom_partition(record: dict[str, Any], custom_partition: str | None) -> None:
    """flatten.rs:107-153 — partition fields must exist and be scalar,
    non-null, non-empty, and contain no '.' (incl. float values)."""
    if not custom_partition:
        return
    for field in (f.strip() for f in custom_partition.split(",")):
        if field not in record:
            raise FieldError(f"Ingestion failed as field {field} is not part of the log")
        v = record[field]
        if v is None or v == "":
            raise FieldError(f"Ingestion failed as field {field} is empty or 'null'")
        if isinstance(v, dict):
            raise FieldError(f"Ingestion failed as field {field} is an object")
        if isinstance(v, list):
            raise FieldError(f"Ingestion failed as field {field} is an array")
        if isinstance(v, str) and "." in v:
            raise FieldError(f"Ingestion failed as field {field} contains a period in the value")
        if isinstance(v, float):
            # ALL floats stringify with a period (str(3.0) == "3.0" —
            # and serde f64 in the reference likewise), so integral
            # floats must be rejected too or the forbidden '.' lands in
            # the partition value/path
            raise FieldError(f"Ingestion failed as field {field} contains a period in the value")


def flatten_json_body(
    body: Any,
    separator: str = "_",
    schema_version: str = "v1",
    log_source: str = "json",
    max_level: int = DEFAULT_MAX_FLATTEN_LEVEL,
    custom_partition: str | None = None,
) -> list[dict[str, Any]]:
    """utils/json/mod.rs:38-66 — generic explode (V1, shallow, json
    source) then key-flatten; returns the list of event records."""
    if (
        schema_version == "v1"
        and log_source in ("json", "custom")
        and not has_more_than_max_allowed_levels(body, 1, max_level)
    ):
        candidates = generic_flattening(body)
        if any(not isinstance(c, dict) for c in candidates):
            raise JsonFlattenError("Expected object in array of objects")
        value: Any = candidates
    else:
        value = body
    flat = flatten(value, separator)
    records = flat if isinstance(flat, list) else [flat]
    for r in records:
        validate_custom_partition(r, custom_partition)
    return records
