"""Distributed ingest — the normalization pipeline executed on
executors, not the driver.

`Stream.ingest` runs flatten → conflict-rename → coerce on the driver,
which is exactly what the reference does inside one ingestor process
(src/handlers/http/ingest.rs → json.rs). At 100 TB/day one driver
can't be the JSON funnel — this module runs the SAME normalization
functions (ingest.flatten / ingest.schema, so semantics are identical
by construction) inside Arrow-batched `mapInPandas` stages over a
DataFrame of raw JSON lines.

Two phases, mirroring the reference's infer-then-commit protocol
(src/event/format/json.rs:91-96 then src/event/mod.rs:158-180):

1. `infer_schema_distributed` — each partition normalizes its rows and
   emits only (field, type) pairs; the driver union-merges them into
   the committed registry (promote() is commutative+associative, so
   partition-local pre-merge is exact, and the driver sees at most
   |fields| x |types| rows — metadata, not data).
2. `normalize_distributed` — with the committed schema broadcast, each
   partition re-runs normalization and emits typed rows in the final
   column layout. Rows whose fields were renamed to typed siblings
   land in those sibling columns, exactly like the driver path.

The double pass trades one extra scan for a conflict-free global
schema — the same trade the reference makes by serializing schema
commit through one writer.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime, timezone
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import flatten as fl
from . import schema as sc
from .events import (
    DEFAULT_TIMESTAMP_KEY,
    RESERVED_COLUMNS,
    StreamConfig,
    _coerce_value,
    batch_spark_schema,
)


def _normalize_records(
    bodies: list[Any], committed: dict[str, str], config: StreamConfig
) -> tuple[list[dict[str, Any]], dict[str, str], dict[str, str]]:
    """The exact prepare_batch normalization, minus registry mutation:
    returns (records, inferred-after-coercion schema, raw inferred
    schema — the pre-coercion types phase 1 needs for sibling
    commitment)."""
    records: list[dict[str, Any]] = []
    for body in bodies:
        records.extend(
            fl.flatten_json_body(
                body,
                separator=config.separator,
                schema_version=config.schema_version,
                log_source=config.log_source,
                max_level=config.max_flatten_level,
                custom_partition=config.custom_partition,
            )
        )
    for rec in records:
        for r in RESERVED_COLUMNS:  # parity with the local path
            if r in rec:
                raise ValueError(f"field {r} is a reserved column")
    records = sc.rename_json_keys(records)
    raw_inferred = sc.infer_batch_schema(records)
    conflicts = sc.detect_schema_conflicts(
        raw_inferred, committed, records, config.schema_version
    )
    records = sc.rename_conflicting_fields(
        records, conflicts, committed, config.schema_version
    )
    records = sc.rename_per_record_type_mismatches(
        records, raw_inferred, committed, config.schema_version
    )
    inferred = sc.infer_batch_schema(records)
    coerced = sc.override_data_type(
        inferred, records, config.schema_version, config.infer_timestamp,
        committed=committed,
    )
    batch_schema = {k: committed.get(k, t) for k, t in coerced.items()}
    return records, batch_schema, inferred


def infer_schema_distributed(
    raw: DataFrame,
    registry: sc.SchemaRegistry,
    config: StreamConfig,
    json_col: str = "value",
) -> sc.SchemaRegistry:
    """Phase 1: partition-local inference, driver-side union-merge.
    Mutates and returns `registry` (the committed stream schema)."""
    committed = dict(registry.fields)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local: dict[str, str] = {}
        local_raw: dict[str, set[str]] = {}
        for pdf in batches:
            bodies = [json.loads(s) for s in pdf[json_col] if s]
            _, batch_schema, raw = _normalize_records(bodies, committed, config)
            for k, t in batch_schema.items():
                local[k] = sc.promote(local[k], t) if k in local else t
            # raw (pre-coercion) types drive phase 2's per-record rename
            # suffixes — the driver needs them to pre-commit siblings
            for k, t in raw.items():
                if t != sc.NULL:
                    local_raw.setdefault(k, set()).add(t)
        yield pd.DataFrame(
            {
                "field": list(local) + [k for k in local_raw for _ in local_raw[k]],
                "type": [local[k] for k in local]
                + [t for k in local_raw for t in local_raw[k]],
                "kind": ["coerced"] * len(local)
                + ["raw" for k in local_raw for _ in local_raw[k]],
            }
        )

    pairs = raw.mapInPandas(
        infer, schema="field string, type string, kind string"
    ).collect()
    merged: dict[str, str] = {}
    raw_observed: dict[str, set[str]] = {}
    for r in pairs:
        k, t = r["field"], r["type"]
        if r["kind"] == "raw":
            raw_observed.setdefault(k, set()).add(t)
            continue
        merged[k] = sc.promote(merged[k], t) if k in merged else t
    updates = {k: t for k, t in merged.items() if t != sc.NULL}

    def _values_fit(t: str, base: str) -> bool:
        """Type-level: can every value of raw type t live in a `base`
        column under v1 coercion?"""
        return (
            t == base
            or t == sc.NULL
            or (base == sc.FLOAT64 and t in (sc.INT64, sc.UINT64))
            # a committed UINT64 base (e.g. __series_hash_u64) holds raw
            # ints — value_compatible_with_type agrees and phase 2
            # coerces them; without this case every distributed OTel
            # ingest committed a spurious all-null *_int64 sibling
            or (base == sc.UINT64 and t == sc.INT64)
            or (base == sc.UTF8 and t == sc.TIMESTAMP_MS)  # ts values are strings
            # a TIMESTAMP base only exists when EVERY partition's strings
            # parsed as datetimes (any plain string would have promoted
            # the base to utf8), so raw utf8 fits by construction
            or (base == sc.TIMESTAMP_MS and t == sc.UTF8)
        )

    def _coerced_of(t: str) -> str:
        # the type a renamed sibling's values coerce to (v1 number rule)
        if config.schema_version == "v1" and t in (sc.INT64, sc.UINT64):
            return sc.FLOAT64
        return t

    # Cross-partition incompatible types: the promoted base type cannot
    # hold every partition's values — phase 2 renames those records to
    # typed siblings named after their RAW inferred type, so those
    # sibling columns must be COMMITTED here or the values vanish in
    # normalization (review finding: partition A's ints were silently
    # dropped after partition B's strings promoted the field to utf8).
    # Driver parity: sequential driver batches produce the same sibling
    # columns, just anchored to arrival order.
    for k, types in raw_observed.items():
        base = updates.get(k)
        if base is None:
            continue
        for t in types:
            if not _values_fit(t, base):
                updates.setdefault(f"{k}_{sc._SUFFIX[t]}", _coerced_of(t))
    if config.static_schema_flag:
        # driver parity (prepare_batch, events.py): static streams
        # reject fields outside the declared schema BEFORE any merge —
        # typed-sibling names land here too, since a renamed sibling is
        # never declared. Without this gate a single drifted event
        # silently evolved the "static" schema.
        unknown = sorted(k for k in updates if k not in registry.fields)
        if unknown:
            raise ValueError(
                f"static schema mismatch for stream {config.name!r}: "
                f"fields {unknown} are not in the declared schema"
            )
    registry.merge(updates)
    return registry


def normalize_distributed(
    spark: SparkSession,
    raw: DataFrame,
    registry: sc.SchemaRegistry,
    config: StreamConfig,
    json_col: str = "value",
    p_timestamp: datetime | None = None,
    reference_ts: datetime | None = None,
    now: datetime | None = None,
) -> DataFrame:
    """Phase 2: emit typed rows in the committed layout. Unknown fields
    (not in the registry after phase 1) are dropped, like the driver
    path drops all-null untyped fields.

    Driver parity for user time partitions: each record's p_timestamp
    is its OWN validated event time (prepare_batch semantics), and the
    reference's age limits are enforced — against `reference_ts` when
    the caller carries the stream's anchor (the chunk-age window), else
    against the `time_partition_limit_days` cutoff from `now`. The
    driver path's "first event of the batch anchors the reference" rule
    is inherently sequential; distributed, every record is checked
    against the stateless cutoff instead (callers that track an anchor
    pass `reference_ts`). A violating record raises in its task, like
    a driver-path batch rejection."""
    from datetime import timedelta

    from .events import _parse_event_time

    committed = dict(registry.fields)
    out_schema = batch_spark_schema(registry, meta_fields=False)
    col_names = [f.name for f in out_schema.fields]
    ts = p_timestamp or datetime.now(timezone.utc).replace(tzinfo=None)
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    ts = ts.replace(microsecond=ts.microsecond // 1000 * 1000)
    # resolve the validation window DRIVER-side so every executor
    # enforces the same cutoff
    tp = config.time_partition
    cutoff: datetime | None = None
    oldest: datetime | None = None
    if tp:
        anchor = now or datetime.now(timezone.utc).replace(tzinfo=None)
        if anchor.tzinfo is not None:
            anchor = anchor.astimezone(timezone.utc).replace(tzinfo=None)
        if reference_ts is not None:
            oldest = reference_ts - timedelta(hours=config.max_chunk_age_hours)
        else:
            cutoff = anchor - timedelta(days=config.time_partition_limit_days)

    def normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = [json.loads(s) for s in pdf[json_col] if s]
            records, _, _ = _normalize_records(bodies, committed, config)
            cols: dict[str, list[Any]] = {c: [] for c in col_names}
            for rec in records:
                rec_ts = ts
                if tp:
                    dt = _parse_event_time(rec.get(tp), tp)
                    if cutoff is not None and dt < cutoff:
                        raise ValueError(
                            f"field {tp!r} timestamp {dt.isoformat()} is older "
                            f"than the {config.time_partition_limit_days}-day limit"
                        )
                    if oldest is not None and dt < oldest:
                        raise ValueError(
                            f"field {tp!r} timestamp {dt.isoformat()} is more "
                            f"than {config.max_chunk_age_hours}h older than the "
                            f"stream reference"
                        )
                    rec_ts = dt.replace(microsecond=dt.microsecond // 1000 * 1000)
                for c in col_names:
                    if c == DEFAULT_TIMESTAMP_KEY:
                        cols[c].append(rec_ts)
                    else:
                        t = committed.get(c)
                        v = rec.get(c)
                        cols[c].append(None if t is None else _coerce_value(v, t))
            yield pd.DataFrame(cols, columns=col_names)

    return raw.mapInPandas(normalize, schema=out_schema)
