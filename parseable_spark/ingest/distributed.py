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
from .events import DEFAULT_TIMESTAMP_KEY, StreamConfig, _coerce_value, batch_spark_schema


def _normalize_records(
    bodies: list[Any], committed: dict[str, str], config: StreamConfig
) -> tuple[list[dict[str, Any]], dict[str, str]]:
    """The exact prepare_batch normalization, minus registry mutation:
    returns (records, inferred-after-coercion schema)."""
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
        if DEFAULT_TIMESTAMP_KEY in rec:
            raise ValueError(f"field {DEFAULT_TIMESTAMP_KEY} is a reserved column")
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
        inferred, records, config.schema_version, config.infer_timestamp
    )
    batch_schema = {k: committed.get(k, t) for k, t in coerced.items()}
    return records, batch_schema


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
        for pdf in batches:
            bodies = [json.loads(s) for s in pdf[json_col] if s]
            _, batch_schema = _normalize_records(bodies, committed, config)
            for k, t in batch_schema.items():
                local[k] = sc.promote(local[k], t) if k in local else t
        yield pd.DataFrame(
            {"field": list(local), "type": [local[k] for k in local]}
        )

    pairs = raw.mapInPandas(infer, schema="field string, type string").collect()
    merged: dict[str, str] = {}
    for r in pairs:
        k, t = r["field"], r["type"]
        merged[k] = sc.promote(merged[k], t) if k in merged else t
    registry.merge({k: t for k, t in merged.items() if t != sc.NULL})
    return registry


def normalize_distributed(
    spark: SparkSession,
    raw: DataFrame,
    registry: sc.SchemaRegistry,
    config: StreamConfig,
    json_col: str = "value",
    p_timestamp: datetime | None = None,
) -> DataFrame:
    """Phase 2: emit typed rows in the committed layout. Unknown fields
    (not in the registry after phase 1) are dropped, like the driver
    path drops all-null untyped fields."""
    committed = dict(registry.fields)
    out_schema = batch_spark_schema(registry, meta_fields=False)
    col_names = [f.name for f in out_schema.fields]
    ts = p_timestamp or datetime.now(timezone.utc).replace(tzinfo=None)
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    ts = ts.replace(microsecond=ts.microsecond // 1000 * 1000)

    def normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = [json.loads(s) for s in pdf[json_col] if s]
            records, _ = _normalize_records(bodies, committed, config)
            cols: dict[str, list[Any]] = {c: [] for c in col_names}
            for rec in records:
                for c in col_names:
                    if c == DEFAULT_TIMESTAMP_KEY:
                        cols[c].append(ts)
                    else:
                        t = committed.get(c)
                        v = rec.get(c)
                        cols[c].append(None if t is None else _coerce_value(v, t))
            yield pd.DataFrame(cols, columns=col_names)

    return raw.mapInPandas(normalize, schema=out_schema)
