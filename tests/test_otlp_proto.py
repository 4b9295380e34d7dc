"""OTLP/protobuf decode (ingest/otlp_proto.py).

The encoder below is written IN THIS TEST from the protobuf wire spec
with its own hardcoded field numbers — independent of the decoder's
schema tables — so a transcription mistake in either side shows up as
a mismatch instead of cancelling out. The equivalence target: a
protobuf export and its OTLP/JSON twin must flatten to IDENTICAL
records (same columns, same values, same types).
"""

from __future__ import annotations

import json
import struct
import urllib.request

import pytest

from parseable_spark.ingest.otel import (
    flatten_otel_logs,
    flatten_otel_metrics,
    flatten_otel_traces,
)
from parseable_spark.ingest.otlp_proto import ProtoDecodeError, decode_otlp

# --- independent wire encoder ----------------------------------------------


def vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(fno: int, wt: int) -> bytes:
    return vint(fno << 3 | wt)


def f_varint(fno: int, v: int) -> bytes:
    return tag(fno, 0) + vint(v)


def f_zigzag(fno: int, v: int) -> bytes:
    return f_varint(fno, (v << 1) ^ (v >> 63))


def f_len(fno: int, payload: bytes) -> bytes:
    return tag(fno, 2) + vint(len(payload)) + payload


def f_str(fno: int, s: str) -> bytes:
    return f_len(fno, s.encode())


def f_fixed64(fno: int, v: int) -> bytes:
    return tag(fno, 1) + struct.pack("<Q", v)


def f_sfixed64(fno: int, v: int) -> bytes:
    return tag(fno, 1) + struct.pack("<q", v)


def f_double(fno: int, v: float) -> bytes:
    return tag(fno, 1) + struct.pack("<d", v)


def f_fixed32(fno: int, v: int) -> bytes:
    return tag(fno, 5) + struct.pack("<I", v)


def kv_str(key: str, val: str) -> bytes:  # KeyValue{key=1, value=2:AnyValue{stringValue=1}}
    return f_str(1, key) + f_len(2, f_str(1, val))


def kv_int(key: str, val: int) -> bytes:  # AnyValue.intValue = 3 (varint)
    return f_str(1, key) + f_len(2, f_varint(3, val))


def scope(name: str, version: str) -> bytes:
    return f_str(1, name) + f_str(2, version)


def resource(*attrs: bytes) -> bytes:
    return b"".join(f_len(1, a) for a in attrs)


# --- logs -------------------------------------------------------------------


def _logs_wire() -> bytes:
    # LogRecord: time=1 fixed64, severity_number=2, severity_text=3,
    # body=5, attributes=6, flags=8 fixed32, trace_id=9, span_id=10,
    # observed=11
    body_kvlist = f_len(6, f_len(1, kv_str("user", "u1")) + f_len(1, kv_int("n", 7)))
    record = (
        f_fixed64(1, 1704067200000000000)
        + f_varint(2, 17)
        + f_str(3, "ERROR")
        + f_len(5, body_kvlist)
        + f_len(6, kv_str("http.method", "POST"))
        + f_len(6, kv_int("http.status_code", 500))
        + f_fixed32(8, 1)
        + f_len(9, bytes.fromhex("bb22bb22bb22bb22bb22bb22bb22bb22"))
        + f_len(10, bytes.fromhex("aa11aa11aa11aa11"))
        + f_fixed64(11, 1704067201000000000)
    )
    scope_logs = f_len(1, scope("applog", "1.2")) + f_len(2, record)
    resource_logs = (
        f_len(1, resource(kv_str("service.name", "checkout")))
        + f_len(2, scope_logs)
        + f_str(3, "https://opentelemetry.io/schemas/1.21.0")
    )
    return f_len(1, resource_logs)


LOGS_JSON = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}}
                ]
            },
            "schemaUrl": "https://opentelemetry.io/schemas/1.21.0",
            "scopeLogs": [
                {
                    "scope": {"name": "applog", "version": "1.2"},
                    "logRecords": [
                        {
                            "timeUnixNano": "1704067200000000000",
                            "observedTimeUnixNano": "1704067201000000000",
                            "severityNumber": 17,
                            "severityText": "ERROR",
                            "body": {
                                "kvlistValue": {
                                    "values": [
                                        {"key": "user", "value": {"stringValue": "u1"}},
                                        {"key": "n", "value": {"intValue": "7"}},
                                    ]
                                }
                            },
                            "attributes": [
                                {"key": "http.method", "value": {"stringValue": "POST"}},
                                {
                                    "key": "http.status_code",
                                    "value": {"intValue": "500"},
                                },
                            ],
                            "flags": 1,
                            "traceId": "bb22bb22bb22bb22bb22bb22bb22bb22",
                            "spanId": "aa11aa11aa11aa11",
                        }
                    ],
                }
            ],
        }
    ]
}


def test_logs_decode_matches_json_twin():
    decoded = decode_otlp("logs", _logs_wire())
    assert decoded == LOGS_JSON
    # and the flattened records are identical, type for type
    assert flatten_otel_logs(decoded) == flatten_otel_logs(LOGS_JSON)


def test_unknown_fields_skipped_and_truncation_raises():
    wire = _logs_wire()
    # append unknown varint field 99 and unknown length-delimited 98
    extra = wire + f_varint(99, 12345) + f_len(98, b"future stuff")
    assert decode_otlp("logs", extra) == LOGS_JSON
    with pytest.raises(ProtoDecodeError):
        decode_otlp("logs", wire[:-3])
    with pytest.raises(ProtoDecodeError):
        decode_otlp("nope", b"")


# --- metrics -----------------------------------------------------------------


def _metrics_wire() -> bytes:
    # NumberDataPoint: start=2, time=3, as_double=4, as_int=6, attrs=7
    gauge_dp = (
        f_fixed64(3, 1704067200000000000)
        + f_double(4, 0.75)
        + f_len(7, kv_str("core", "cpu0"))
    )
    gauge_metric = f_str(1, "cpu.util") + f_str(3, "1") + f_len(5, f_len(1, gauge_dp))
    sum_dp = f_fixed64(3, 1704067200000000000) + f_sfixed64(6, -42)
    sum_metric = f_str(1, "queue.delta") + f_len(
        7, f_len(1, sum_dp) + f_varint(2, 2) + f_varint(3, 1)
    )
    # HistogramDataPoint: time=3, count=4 fixed64, sum=5, bucket_counts=6
    # PACKED fixed64, explicit_bounds=7 PACKED double
    hist_dp = (
        f_fixed64(3, 1704067200000000000)
        + f_fixed64(4, 6)
        + f_double(5, 21.5)
        + f_len(6, struct.pack("<QQQ", 1, 2, 3))
        + f_len(7, struct.pack("<dd", 0.5, 5.0))
    )
    hist_metric = f_str(1, "latency") + f_len(9, f_len(1, hist_dp) + f_varint(2, 2))
    scope_metrics = f_len(1, scope("meter", "0.1")) + b"".join(
        f_len(2, m) for m in (gauge_metric, sum_metric, hist_metric)
    )
    resource_metrics = f_len(1, resource(kv_str("service.name", "api"))) + f_len(
        2, scope_metrics
    )
    return f_len(1, resource_metrics)


METRICS_JSON = {
    "resourceMetrics": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "api"}}
                ]
            },
            "scopeMetrics": [
                {
                    "scope": {"name": "meter", "version": "0.1"},
                    "metrics": [
                        {
                            "name": "cpu.util",
                            "unit": "1",
                            "gauge": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1704067200000000000",
                                        "asDouble": 0.75,
                                        "attributes": [
                                            {
                                                "key": "core",
                                                "value": {"stringValue": "cpu0"},
                                            }
                                        ],
                                    }
                                ]
                            },
                        },
                        {
                            "name": "queue.delta",
                            "sum": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1704067200000000000",
                                        "asInt": "-42",
                                    }
                                ],
                                "aggregationTemporality": 2,
                                "isMonotonic": True,
                            },
                        },
                        {
                            "name": "latency",
                            "histogram": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1704067200000000000",
                                        "count": "6",
                                        "sum": 21.5,
                                        "bucketCounts": ["1", "2", "3"],
                                        "explicitBounds": [0.5, 5.0],
                                    }
                                ],
                                "aggregationTemporality": 2,
                            },
                        },
                    ],
                }
            ],
        }
    ]
}


def test_metrics_decode_matches_json_twin():
    decoded = decode_otlp("metrics", _metrics_wire())
    assert decoded == METRICS_JSON
    recs_p = flatten_otel_metrics(decoded)
    recs_j = flatten_otel_metrics(METRICS_JSON)
    assert recs_p == recs_j
    by_name = {r["metric_name"]: r for r in recs_p}
    assert by_name["cpu.util"]["data_point_value"] == 0.75
    assert by_name["queue.delta"]["data_point_value"] == -42.0
    assert by_name["latency"]["data_point_bucket_counts"] == [1, 2, 3]
    assert by_name["latency"]["data_point_explicit_bounds"] == [0.5, 5.0]


# --- traces ------------------------------------------------------------------


def _traces_wire() -> bytes:
    event = f_fixed64(1, 1704067200000500000) + f_str(2, "cache.miss")
    status = f_str(2, "boom") + f_varint(3, 2)
    span = (
        f_len(1, bytes.fromhex("bb22bb22bb22bb22bb22bb22bb22bb22"))
        + f_len(2, bytes.fromhex("aa11aa11aa11aa11"))
        + f_len(4, bytes.fromhex("cc33cc33cc33cc33"))
        + f_str(5, "GET /checkout")
        + f_varint(6, 2)
        + f_fixed64(7, 1704067200000000000)
        + f_fixed64(8, 1704067200900000000)
        + f_len(9, kv_str("http.route", "/checkout"))
        + f_len(11, event)
        + f_len(15, status)
    )
    scope_spans = f_len(1, scope("tracer", "2.0")) + f_len(2, span)
    resource_spans = f_len(1, resource(kv_str("service.name", "gw"))) + f_len(
        2, scope_spans
    )
    return f_len(1, resource_spans)


def test_traces_decode_and_flatten():
    decoded = decode_otlp("traces", _traces_wire())
    r = flatten_otel_traces(decoded)[0]
    assert r["span_trace_id"] == "bb22bb22bb22bb22bb22bb22bb22bb22"
    assert r["span_span_id"] == "aa11aa11aa11aa11"
    assert r["span_parent_span_id"] == "cc33cc33cc33cc33"
    assert r["span_name"] == "GET /checkout"
    assert r["span_kind"] == 2
    assert r["span_duration_ns"] == 900000000
    assert r["span_status_code"] == 2
    assert r["span_status_message"] == "boom"
    assert r["http.route"] == "/checkout"
    assert r["event_name"] == "cache.miss"
    assert r["service.name"] == "gw"


# --- HTTP e2e ----------------------------------------------------------------


def test_http_protobuf_ingest_e2e(spark, tmp_path_factory):
    """POST /v1/logs with Content-Type application/x-protobuf: decoded,
    flattened, ingested, queryable — response is an (empty, valid)
    protobuf ExportLogsServiceResponse. A JSON twin ingested beside it
    lands IDENTICAL column values; an unknown Content-Type gets the
    reference's 400 message shape."""
    from datetime import datetime, timedelta, timezone

    from parseable_spark.server import ParseableAPI, serve_background

    api = ParseableAPI(spark, str(tmp_path_factory.mktemp("otlp_store")))
    srv, base = serve_background(api)
    try:
        req = urllib.request.Request(
            base + "/v1/logs",
            data=_logs_wire(),
            headers={
                "Content-Type": "application/x-protobuf",
                "x-p-stream": "otelpb",
            },
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-protobuf"
            assert resp.read() == b""

        req = urllib.request.Request(
            base + "/v1/logs",
            data=json.dumps(LOGS_JSON).encode(),
            headers={"Content-Type": "application/json", "x-p-stream": "oteljs"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert json.loads(resp.read())["records"] == 1

        now = datetime.now(timezone.utc)
        fmt = lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")  # noqa: E731
        window = {
            "startTime": fmt(now - timedelta(minutes=10)),
            "endTime": fmt(now + timedelta(minutes=10)),
        }
        cols = (
            "severity_number, severity_text, `body.user`, `body.n`, "
            "`http.status_code`, trace_id, span_id, `service.name`"
        )
        rows = {}
        for stream in ("otelpb", "oteljs"):
            out = urllib.request.urlopen(
                urllib.request.Request(
                    base + "/api/v1/query",
                    data=json.dumps(
                        {"query": f"SELECT {cols} FROM {stream}", **window}
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                ),
                timeout=30,
            )
            rows[stream] = json.loads(out.read())
        assert rows["otelpb"] == rows["oteljs"]
        assert rows["otelpb"][0]["severity_text"] == "ERROR"
        assert rows["otelpb"][0]["body.user"] == "u1"

        # unsupported content type → reference's 400 shape
        req = urllib.request.Request(
            base + "/v1/logs",
            data=b"<xml/>",
            headers={"Content-Type": "text/xml", "x-p-stream": "otelpb"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "Unsupported Content-Type" in ei.value.read().decode()
    finally:
        srv.shutdown()


import urllib.error  # noqa: E402  (used in the e2e above)


def test_nesting_depth_is_bounded():
    """AnyValue→kvlist→AnyValue chains are ~10 bytes/level on the wire;
    unbounded recursion would RecursionError (500) instead of the 400
    contract (review finding)."""
    import pytest

    from parseable_spark.ingest.otlp_proto import ProtoDecodeError, decode_message

    # AnyValue{kvlist_value{values{value{<next level>}}}}
    def any_value(depth: int) -> bytes:
        inner = b""
        for _ in range(depth):
            kv = b"\x12" + _ld(inner)          # KeyValue.value (field 2)
            kvlist = b"\x0a" + _ld(kv)          # KeyValueList.values (field 1)
            inner = b"\x32" + _ld(kvlist)       # AnyValue.kvlist_value (field 6)
        return inner

    def _ld(b: bytes) -> bytes:
        out, n = bytearray(), len(b)
        while True:
            out.append((n & 0x7F) | (0x80 if n > 0x7F else 0))
            n >>= 7
            if not n:
                return bytes(out) + b

    assert decode_message(any_value(10), "AnyValue") is not None
    with pytest.raises(ProtoDecodeError, match="nesting"):
        decode_message(any_value(200), "AnyValue")


def test_http_protobuf_gzip_ingest(spark, tmp_path_factory):
    """The OTel Collector's otlphttp exporter gzips by default; the
    route must inflate Content-Encoding: gzip before decoding (review
    finding). A tampered gzip body is 400, not 500."""
    import gzip

    from parseable_spark.server import ParseableAPI, serve_background

    api = ParseableAPI(spark, str(tmp_path_factory.mktemp("otlp_gz")))
    srv, base = serve_background(api)
    try:
        req = urllib.request.Request(
            base + "/v1/logs",
            data=gzip.compress(_logs_wire()),
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "gzip",
                "x-p-stream": "otelgz",
            },
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
        assert api._stores["otelgz"].count_fast_path() == 1

        bad = urllib.request.Request(
            base + "/v1/logs",
            data=b"\x1f\x8bnot really gzip",
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "gzip",
                "x-p-stream": "otelgz",
            },
        )
        import pytest

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_gzip_truncated_stream_is_400(spark, tmp_path_factory):
    """EOFError/zlib.error from a truncated-but-valid-header gzip body
    are not OSError — they must still map to 400, not 500 (review
    finding)."""
    import gzip

    from parseable_spark.server import ParseableAPI, serve_background

    api = ParseableAPI(spark, str(tmp_path_factory.mktemp("otlp_trunc")))
    srv, base = serve_background(api)
    try:
        whole = gzip.compress(b'{"resourceLogs": []}' * 50)
        req = urllib.request.Request(
            base + "/v1/logs",
            data=whole[: len(whole) // 2],  # valid header, truncated stream
            headers={
                "Content-Type": "application/json",
                "Content-Encoding": "gzip",
                "x-p-stream": "t",
            },
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
