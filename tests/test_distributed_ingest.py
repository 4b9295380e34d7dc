"""Distributed (executor-side) ingest — equivalence with the driver
path and behavior under schema evolution/conflicts."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from parseable_spark.ingest import schema as sc
from parseable_spark.ingest.distributed import (
    infer_schema_distributed,
    normalize_distributed,
)
from parseable_spark.ingest.events import Stream, StreamConfig


def _raw_df(spark, bodies, partitions=4):
    lines = [(json.dumps(b),) for b in bodies]
    return spark.createDataFrame(lines, "value string").repartition(partitions)


BODIES = [
    {"status": "ok", "latency": 12, "meta": {"region": "us", "zone": 1}},
    {"status": "err", "latency": 99.5, "ts_created": "2026-08-01T10:00:00Z"},
    {"status": "ok", "latency": 7, "tags": ["a", "b"]},
    {"status": None, "latency": 3, "meta": {"region": "eu"}},
]


def test_matches_driver_path(spark):
    ts = datetime(2026, 8, 13, 12, 0)
    # driver path
    stream = Stream(StreamConfig(name="s"))
    driver_df = stream.ingest(spark, BODIES, p_timestamp=ts)

    # distributed path
    reg = sc.SchemaRegistry()
    cfg = StreamConfig(name="s")
    raw = _raw_df(spark, BODIES)
    infer_schema_distributed(raw, reg, cfg)
    assert reg.fields == stream.registry.fields  # identical committed schema

    dist_df = normalize_distributed(spark, raw, reg, cfg, p_timestamp=ts)
    data_cols = sorted(reg.fields)
    # identical Spark types on every shared column (schema check)
    driver_types = dict(driver_df.dtypes)
    dist_types = dict(dist_df.dtypes)
    assert {c: dist_types[c] for c in data_cols} == {
        c: driver_types[c] for c in data_cols
    }
    a = sorted(
        tuple(r[c] for c in data_cols) for r in driver_df.collect()
    )
    b = sorted(
        tuple(r[c] for c in data_cols) for r in dist_df.collect()
    )
    assert a == b
    # order-insensitive content hash over canonical row strings
    import hashlib

    digest = lambda rows: hashlib.sha256(  # noqa: E731
        "\n".join(repr(r) for r in rows).encode()
    ).hexdigest()
    assert digest(a) == digest(b)


def test_conflict_renaming_distributed(spark):
    cfg = StreamConfig(name="s")
    reg = sc.SchemaRegistry()
    reg.merge({"level": sc.FLOAT64})  # committed: level is numeric
    bodies = [{"level": 3}, {"level": "info"}]  # string arrives later
    raw = _raw_df(spark, bodies, partitions=2)
    infer_schema_distributed(raw, reg, cfg)
    assert reg.fields["level"] == sc.FLOAT64
    assert reg.fields.get("level_utf8") == sc.UTF8  # typed sibling
    out = normalize_distributed(spark, raw, reg, cfg).collect()
    got = {(r["level"], r["level_utf8"]) for r in out}
    assert got == {(3.0, None), (None, "info")}


def test_v1_coercions_distributed(spark):
    cfg = StreamConfig(name="s")
    reg = sc.SchemaRegistry()
    raw = _raw_df(spark, [{"n": 5, "created_at": "2026-08-01T10:00:00Z"}])
    infer_schema_distributed(raw, reg, cfg)
    assert reg.fields["n"] == sc.FLOAT64  # every JSON number → float64
    assert reg.fields["created_at"] == sc.TIMESTAMP_MS  # time-named string
    row = normalize_distributed(spark, raw, reg, cfg).first()
    assert row["n"] == 5.0
    assert row["created_at"] == datetime(2026, 8, 1, 10, 0)


def test_reserved_column_rejected(spark):
    cfg = StreamConfig(name="s")
    reg = sc.SchemaRegistry()
    raw = _raw_df(spark, [{"p_timestamp": "2026-01-01"}], partitions=1)
    with pytest.raises(Exception, match="reserved"):
        infer_schema_distributed(raw, reg, cfg)


def test_scales_over_partitions(spark):
    """10k rows across 16 partitions — schema stays consistent and all
    rows survive normalization."""
    cfg = StreamConfig(name="s")
    reg = sc.SchemaRegistry()
    bodies = [
        {"k": i % 7, "grp": f"g{i % 3}", "nested": {"x": i}} for i in range(10_000)
    ]
    raw = _raw_df(spark, bodies, partitions=16)
    infer_schema_distributed(raw, reg, cfg)
    assert set(reg.fields) == {"k", "grp", "nested_x"}
    out = normalize_distributed(spark, raw, reg, cfg)
    assert out.count() == 10_000
    assert out.agg({"k": "max"}).first()[0] == 6.0


def test_cross_partition_type_conflict_loses_no_values(spark, tmp_path):
    """Code-review regression: partition A all-ints, partition B
    all-strings for the same field. The promoted base (utf8) cannot
    hold A's ints; phase 1 must commit the typed sibling so phase 2's
    renamed values land in a real column instead of vanishing."""
    import json as _json

    from parseable_spark.ingest import schema as sc
    from parseable_spark.ingest.distributed import (
        infer_schema_distributed,
        normalize_distributed,
    )
    from parseable_spark.ingest.events import StreamConfig

    rows_a = [_json.dumps({"foo": i}) for i in range(4)]
    rows_b = [_json.dumps({"foo": f"s{i}"}) for i in range(3)]
    raw = spark.createDataFrame(
        [(r,) for r in rows_a], "value string"
    ).repartition(1).unionByName(
        spark.createDataFrame([(r,) for r in rows_b], "value string").repartition(1)
    )
    registry = sc.SchemaRegistry()
    config = StreamConfig(name="xpart")
    infer_schema_distributed(raw, registry, config)
    # base field + typed sibling both committed; the sibling carries
    # the RAW inferred type's suffix (what phase 2 renames to) and the
    # coerced value type — the same layout the driver path produces
    assert registry.fields["foo"] == sc.UTF8
    sib = f"foo_{sc._SUFFIX[sc.INT64]}"
    assert registry.fields.get(sib) == sc.FLOAT64

    out = normalize_distributed(spark, raw, registry, config).collect()
    got_strings = sorted(r["foo"] for r in out if r["foo"] is not None)
    got_ints = sorted(r[sib] for r in out if r[sib] is not None)
    assert got_strings == [f"s{i}" for i in range(3)]
    assert got_ints == [float(i) for i in range(4)]  # nothing lost


def test_static_schema_rejects_unknown_fields_distributed(spark):
    """Driver parity: a static stream must reject (not silently evolve
    on) events carrying undeclared fields — distributed phase 1 now
    enforces the same is_schema_matching gate as prepare_batch."""
    reg = sc.SchemaRegistry()
    reg.merge({"status": sc.UTF8, "latency": sc.FLOAT64})
    cfg = StreamConfig(name="s", static_schema_flag=True)
    ok = _raw_df(spark, [{"status": "ok", "latency": 1}])
    infer_schema_distributed(ok, reg, cfg)  # declared fields pass
    assert set(reg.fields) == {"status", "latency"}
    drifted = _raw_df(spark, [{"status": "ok", "latency": 1, "extra": 7}])
    with pytest.raises(ValueError, match="static schema mismatch"):
        infer_schema_distributed(drifted, reg, cfg)
    assert "extra" not in reg.fields  # rejection committed nothing


def test_time_partition_stamps_event_time_distributed(spark):
    """p_timestamp must be each record's OWN event time on a user
    time-partition stream (was the fixed ingest ts), and stale events
    must be rejected."""
    from datetime import timedelta, timezone

    from parseable_spark.ingest.events import DEFAULT_TIMESTAMP_KEY

    now = datetime(2026, 8, 15, 12, 0)
    fresh = [
        {"ev_ts": "2026-08-14T10:00:00Z", "v": 1},
        {"ev_ts": "2026-08-13T09:30:00Z", "v": 2},
    ]
    cfg = StreamConfig(name="s", time_partition="ev_ts")
    reg = sc.SchemaRegistry()
    raw = _raw_df(spark, fresh)
    infer_schema_distributed(raw, reg, cfg)
    out = normalize_distributed(spark, raw, reg, cfg, now=now)
    got = {r["v"]: r[DEFAULT_TIMESTAMP_KEY] for r in out.collect()}
    assert got[1] == datetime(2026, 8, 14, 10, 0)
    assert got[2] == datetime(2026, 8, 13, 9, 30)
    # a record older than the 30-day limit fails the job (driver parity)
    stale = [{"ev_ts": "2020-01-01T00:00:00Z", "v": 3}]
    raw_stale = _raw_df(spark, stale)
    reg2 = sc.SchemaRegistry()
    infer_schema_distributed(raw_stale, reg2, cfg)
    with pytest.raises(Exception, match="older than the 30-day limit"):
        normalize_distributed(spark, raw_stale, reg2, cfg, now=now).collect()
    # chunk-age window against a caller-carried stream anchor
    ref = datetime(2026, 8, 14, 10, 0)
    old = [{"ev_ts": "2026-08-12T09:00:00Z", "v": 4}]  # >24h before ref
    raw_old = _raw_df(spark, old)
    reg3 = sc.SchemaRegistry()
    infer_schema_distributed(raw_old, reg3, cfg)
    with pytest.raises(Exception, match="older than the stream reference"):
        normalize_distributed(
            spark, raw_old, reg3, cfg, now=now, reference_ts=ref
        ).collect()


def test_uint64_base_accepts_raw_ints_without_sibling(spark):
    """A committed UINT64 column (e.g. __series_hash_u64) ingesting raw
    ints must NOT commit a spurious *_int64 sibling."""
    reg = sc.SchemaRegistry()
    reg.merge({"__series_hash_u64": sc.UINT64})
    cfg = StreamConfig(name="s")
    raw = _raw_df(spark, [{"__series_hash_u64": 12345678901234567890}])
    infer_schema_distributed(raw, reg, cfg)
    assert "__series_hash_u64" in reg.fields
    assert not [k for k in reg.fields if k.endswith("_int64")], reg.fields
