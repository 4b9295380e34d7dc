"""Static-schema streams (ingest/static_schema.py + server wiring).

Reference: src/static_schema.rs (declaration validation + type map),
src/parseable/mod.rs:1336-1365 (validate_static_schema on create),
src/event/format/mod.rs:213-233 (is_schema_matching: ingestion rejects
fields outside the declared schema — no evolution).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from parseable_spark.ingest import schema as sc
from parseable_spark.ingest.static_schema import parse_static_schema

FIELDS = {
    "fields": [
        {"name": "level", "data_type": "string"},
        {"name": "latency_ms", "data_type": "int"},
        {"name": "ratio", "data_type": "double"},
        {"name": "ok", "data_type": "boolean"},
        {"name": "ts", "data_type": "datetime"},
    ]
}


class TestParse:
    def test_type_mapping(self):
        out = parse_static_schema(FIELDS)
        assert out == {
            "level": sc.UTF8,
            "latency_ms": sc.INT64,
            "ratio": sc.FLOAT64,
            "ok": sc.BOOL,
            "ts": sc.TIMESTAMP_MS,
        }
        # list types map to element types (V1 flattening explodes rows)
        lst = parse_static_schema(
            {"fields": [{"name": "tags", "data_type": "string_list"}]}
        )
        assert lst == {"tags": sc.UTF8}

    @pytest.mark.parametrize(
        "body,msg",
        [
            ({}, "fields"),
            ({"fields": []}, "at least one"),
            ({"fields": [{"name": "", "data_type": "int"}]}, "empty"),
            ({"fields": [{"name": "p_timestamp", "data_type": "int"}]}, "reserved"),
            (
                {"fields": [{"name": "a", "data_type": "int"}, {"name": "a", "data_type": "int"}]},
                "duplicate",
            ),
            ({"fields": [{"name": "a", "data_type": "uuid"}]}, "unrecognized"),
        ],
    )
    def test_rejections(self, body, msg):
        with pytest.raises(ValueError, match=msg):
            parse_static_schema(body)

    def test_partition_fields_must_be_declared(self):
        with pytest.raises(ValueError, match="custom partition"):
            parse_static_schema(FIELDS, custom_partition="level,region")
        parse_static_schema(FIELDS, custom_partition="level")  # ok
        with pytest.raises(ValueError, match="time partition"):
            parse_static_schema(FIELDS, time_partition="event_ts")
        out = parse_static_schema(
            {"fields": [{"name": "event_ts", "data_type": "string"}]},
            time_partition="event_ts",
        )
        assert out["event_ts"] == sc.TIMESTAMP_MS  # forced to datetime


def _req(method, base, path, body=None, headers=None):
    data = None if body is None else json.dumps(body).encode()
    r = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    resp = urllib.request.urlopen(r, timeout=30)
    return resp, json.loads(resp.read())


def test_static_stream_http_lifecycle(spark, tmp_path):
    """Create a static stream over HTTP, ingest conforming events,
    reject non-conforming ones, keep enforcement across a restart."""
    from parseable_spark.server import ParseableAPI, serve_background

    api = ParseableAPI(spark, str(tmp_path))
    srv, base = serve_background(api)
    try:
        # declaration is validated at create
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req("PUT", base, "/api/v1/logstream/bad",
                 body={"fields": [{"name": "x", "data_type": "uuid"}]},
                 headers={"x-p-static-schema-flag": "true"})
        assert ei.value.code == 400

        _, out = _req("PUT", base, "/api/v1/logstream/fixed", body=FIELDS,
                      headers={"x-p-static-schema-flag": "true"})
        assert out["status"] == "created log stream fixed"
        # declared schema is the committed schema immediately
        _, schema = _req("GET", base, "/api/v1/logstream/fixed/schema")
        names = {f["name"] for f in schema["fields"]}
        assert {"level", "latency_ms", "ratio", "ok"} <= names

        # conforming event ingests
        _, out = _req("POST", base, "/api/v1/ingest",
                      body=[{"level": "info", "latency_ms": 12, "ok": True}],
                      headers={"x-p-stream": "fixed"})
        assert out["records"] == 1
        # unknown field is rejected — no evolution on static streams
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req("POST", base, "/api/v1/ingest",
                 body=[{"level": "info", "surprise_column": 1}],
                 headers={"x-p-stream": "fixed"})
        assert ei.value.code == 400
        assert b"static schema mismatch" in ei.value.read()
        # type mismatch routes through conflict renaming -> renamed
        # field is undeclared -> rejected too
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req("POST", base, "/api/v1/ingest",
                 body=[{"latency_ms": "not a number"}],
                 headers={"x-p-stream": "fixed"})
        assert ei.value.code == 400
    finally:
        srv.shutdown()

    # restart: flag rediscovered from the persisted stream config
    api2 = ParseableAPI(spark, str(tmp_path))
    assert api2._stores["fixed"].config.static_schema_flag
    with pytest.raises(Exception, match="static schema mismatch"):
        api2.ingest("fixed", [{"brand_new": 1}])
    assert api2.ingest("fixed", [{"level": "warn"}]) == 1


def test_dynamic_streams_unaffected(spark, tmp_path):
    from parseable_spark.server import ParseableAPI

    api = ParseableAPI(spark, str(tmp_path))
    assert api.ingest("free", [{"anything": 1}, {"goes": "here"}]) == 2
