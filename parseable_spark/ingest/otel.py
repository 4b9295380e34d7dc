"""OTLP JSON flattening — logs, metrics, traces → flat event records.

Reference: src/otel/{logs,metrics,traces}.rs. Output field names follow
the reference's known-field lists (logs.rs:31-49 — 17 fields,
metrics.rs:42-95 — 39, traces.rs:34-65 — 32). Attributes flatten to
top-level keys (resource attrs keep their dotted names, e.g.
'service.name'); record separator for nested attr values is '.' (OTel
uses the dot separator — utils/json/mod.rs call sites).

These are pre-ingest transforms feeding the same Stream pipeline as
plain JSON; the resulting columns are ordinary DataFrame fields.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from .flatten import flatten_object

# severity_number → (severity_text, p_log_category) per the OTLP proto
_SEVERITIES = [
    (1, 4, "TRACE", "DEBUG"),
    (5, 8, "DEBUG", "DEBUG"),
    (9, 12, "INFO", "INFO"),
    (13, 16, "WARN", "WARNING"),
    (17, 20, "ERROR", "ERROR"),
    (21, 24, "FATAL", "CRITICAL"),
]


# OTLP/JSON permits enums as integers OR names (review finding: a
# payload with severityNumber "SEVERITY_NUMBER_WARN" must not crash)
_SEVERITY_NAMES = {
    f"SEVERITY_NUMBER_{name}": base + off
    for base, name_group in (
        (1, ["TRACE", "TRACE2", "TRACE3", "TRACE4"]),
        (5, ["DEBUG", "DEBUG2", "DEBUG3", "DEBUG4"]),
        (9, ["INFO", "INFO2", "INFO3", "INFO4"]),
        (13, ["WARN", "WARN2", "WARN3", "WARN4"]),
        (17, ["ERROR", "ERROR2", "ERROR3", "ERROR4"]),
        (21, ["FATAL", "FATAL2", "FATAL3", "FATAL4"]),
    )
    for off, name in enumerate(name_group)
}
_SEVERITY_NAMES["SEVERITY_NUMBER_UNSPECIFIED"] = 0
_SPAN_KIND_NAMES = {
    "SPAN_KIND_UNSPECIFIED": 0,
    "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2,
    "SPAN_KIND_CLIENT": 3,
    "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
}


def _enum_int(value, names: dict) -> int:
    """int | enum-name string → int (unknown names → 0, never a crash)."""
    if isinstance(value, str) and not value.isdigit():
        return names.get(value, 0)
    try:
        return int(value)
    except (TypeError, ValueError):
        return 0


def severity_info(n: int) -> tuple[str, str]:
    for lo, hi, text, cat in _SEVERITIES:
        if lo <= n <= hi:
            offset = n - lo
            return (text if offset == 0 else f"{text}{offset + 1}", cat)
    return ("SEVERITY_NUMBER_UNSPECIFIED", "UNSPECIFIED")


def _attr_value(v: dict[str, Any]) -> Any:
    """OTLP AnyValue → python scalar."""
    if "stringValue" in v:
        return v["stringValue"]
    if "intValue" in v:
        return int(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "arrayValue" in v:
        return [_attr_value(x) for x in v["arrayValue"].get("values", [])]
    if "kvlistValue" in v:
        return {kv["key"]: _attr_value(kv["value"]) for kv in v["kvlistValue"].get("values", [])}
    return None


def insert_attributes(
    out: dict[str, Any], attributes: list[dict] | None, protect: bool = False
) -> None:
    """Attribute KV list → top-level keys; nested values flatten with
    '.'. With ``protect``, keys the engine already set are kept: a log
    attribute named ``time_unix_nano`` (or a metric label named
    ``metric_name``) must not overwrite the record timestamp / series
    name the engine derived — the spoofed copy corrupted time
    partitioning and series identity while __series_hash_u64 still
    used the real values (r6 review, verified). Collisions land under
    an ``attr.``-prefixed key instead, so no data is dropped."""
    for kv in attributes or []:
        v = _attr_value(kv.get("value", {}))
        key = kv["key"]
        if protect and (key in out or key == "p_log_category"):
            key = f"attr.{key}"
        if isinstance(v, dict):
            flatten_object(out, key, v, ".")
        else:
            out[key] = v


def _resource_scope_fields(resource: dict, scope: dict, schema_url: str, scope_url: str) -> dict:
    base: dict[str, Any] = {}
    insert_attributes(base, resource.get("attributes"))
    base["resource_dropped_attributes_count"] = resource.get("droppedAttributesCount", 0)
    base["scope_name"] = scope.get("name", "")
    base["scope_version"] = scope.get("version", "")
    insert_attributes(base, scope.get("attributes"))
    base["scope_dropped_attributes_count"] = scope.get("droppedAttributesCount", 0)
    base["schema_url"] = schema_url
    base["scope_log_schema_url"] = scope_url
    return base


def flatten_otel_logs(payload: dict) -> list[dict[str, Any]]:
    """OTLP ExportLogsServiceRequest (JSON) → flat records (logs.rs:119-305)."""
    records = []
    for rl in payload.get("resourceLogs", []):
        for sl in rl.get("scopeLogs", []):
            base = _resource_scope_fields(
                rl.get("resource", {}),
                sl.get("scope", {}),
                rl.get("schemaUrl", ""),
                sl.get("schemaUrl", ""),
            )
            for lr in sl.get("logRecords", []):
                rec = dict(base)
                rec["time_unix_nano"] = lr.get("timeUnixNano")
                rec["observed_time_unix_nano"] = lr.get("observedTimeUnixNano")
                sev_n = _enum_int(lr.get("severityNumber", 0), _SEVERITY_NAMES)
                text, cat = severity_info(sev_n)
                rec["severity_number"] = sev_n
                rec["severity_text"] = lr.get("severityText") or text
                body = lr.get("body", {})
                bv = _attr_value(body) if body else None
                if isinstance(bv, dict):
                    flatten_object(rec, "body", bv, ".")
                else:
                    rec["body"] = bv
                    # string bodies holding JSON objects get extracted too
                    if isinstance(bv, str):
                        try:
                            parsed = json.loads(bv)
                        except (ValueError, TypeError):
                            parsed = None
                        if isinstance(parsed, dict):
                            # same separator as structured (kvlist)
                            # bodies: the same logical field must land
                            # in ONE column regardless of the
                            # exporter's body encoding (review finding)
                            flatten_object(rec, "body", parsed, ".")
                rec["p_log_category"] = cat
                rec["log_record_dropped_attributes_count"] = lr.get(
                    "droppedAttributesCount", 0
                )
                rec["flags"] = lr.get("flags", 0)
                rec["span_id"] = lr.get("spanId", "")
                rec["trace_id"] = lr.get("traceId", "")
                if "eventName" in lr:
                    rec["event_name"] = lr["eventName"]
                # attrs LAST, engine fields protected: a log attribute
                # named time_unix_nano/body/severity_text overwrote the
                # engine-derived value (r6 review, verified); collisions
                # keep their data under attr.<key>
                insert_attributes(rec, lr.get("attributes"), protect=True)
                records.append(rec)
    return records


def series_hash(labels: dict[str, Any]) -> int:
    """Stable 64-bit series id over sorted labels (reference keeps the
    full u64 exactly — src/otel/metrics.rs:40, format/mod.rs:373-378)."""
    key = json.dumps({k: labels[k] for k in sorted(labels)}, separators=(",", ":"))
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def flatten_otel_metrics(payload: dict) -> list[dict[str, Any]]:
    """OTLP metrics → one record per data point (metrics.rs:518+); all
    five metric types supported (summary and exponentialHistogram were
    silently DROPPED with an HTTP 200 before — r6 review, verified),
    __series_hash_u64 added per series."""
    records = []
    for rm in payload.get("resourceMetrics", []):
        for sm in rm.get("scopeMetrics", []):
            base = _resource_scope_fields(
                rm.get("resource", {}),
                sm.get("scope", {}),
                rm.get("schemaUrl", ""),
                sm.get("schemaUrl", ""),
            )
            for metric in sm.get("metrics", []):
                name = metric.get("name", "")
                for mtype in (
                    "gauge", "sum", "histogram",
                    "exponentialHistogram", "summary",
                ):
                    for dp in metric.get(mtype, {}).get("dataPoints", []):
                        rec = dict(base)
                        rec["metric_name"] = name
                        rec["metric_description"] = metric.get("description", "")
                        rec["metric_unit"] = metric.get("unit", "")
                        rec["metric_type"] = mtype
                        rec["time_unix_nano"] = dp.get("timeUnixNano")
                        rec["start_time_unix_nano"] = dp.get("startTimeUnixNano")
                        labels: dict[str, Any] = {}
                        insert_attributes(labels, dp.get("attributes"))
                        if mtype == "histogram":
                            rec["data_point_count"] = int(dp.get("count", 0))
                            rec["data_point_sum"] = float(dp.get("sum", 0.0))
                            rec["data_point_bucket_counts"] = [
                                int(x) for x in dp.get("bucketCounts", [])
                            ]
                            rec["data_point_explicit_bounds"] = [
                                float(x) for x in dp.get("explicitBounds", [])
                            ]
                        elif mtype == "exponentialHistogram":
                            rec["data_point_count"] = int(dp.get("count", 0))
                            rec["data_point_sum"] = float(dp.get("sum", 0.0))
                            rec["data_point_scale"] = int(dp.get("scale", 0))
                            rec["data_point_zero_count"] = int(dp.get("zeroCount", 0))
                            pos = dp.get("positive", {})
                            neg = dp.get("negative", {})
                            rec["data_point_positive_offset"] = int(pos.get("offset", 0))
                            rec["data_point_positive_bucket_counts"] = [
                                int(x) for x in pos.get("bucketCounts", [])
                            ]
                            rec["data_point_negative_offset"] = int(neg.get("offset", 0))
                            rec["data_point_negative_bucket_counts"] = [
                                int(x) for x in neg.get("bucketCounts", [])
                            ]
                        elif mtype == "summary":
                            rec["data_point_count"] = int(dp.get("count", 0))
                            rec["data_point_sum"] = float(dp.get("sum", 0.0))
                            qs = dp.get("quantileValues", [])
                            rec["data_point_quantiles"] = [
                                float(q.get("quantile", 0.0)) for q in qs
                            ]
                            rec["data_point_quantile_values"] = [
                                float(q.get("value", 0.0)) for q in qs
                            ]
                        elif "asInt" in dp:
                            # keep integer identity: float() corrupted
                            # counters above 2^53 (r6 review, verified)
                            rec["data_point_value"] = int(dp["asInt"])
                        else:
                            rec["data_point_value"] = float(dp.get("asDouble", 0))
                        # labels AFTER engine fields, engine-protected:
                        # a label named metric_name spoofed the series
                        # name while the hash used the real one
                        for k, v in labels.items():
                            rec[f"attr.{k}" if k in rec else k] = v
                        rec["__series_hash_u64"] = series_hash(
                            {"__name__": name, **labels}
                        )
                        records.append(rec)
    return records


def flatten_otel_traces(payload: dict) -> list[dict[str, Any]]:
    """OTLP spans → flat records with span_-prefixed fields (traces.rs)."""
    records = []
    for rs in payload.get("resourceSpans", []):
        for ss in rs.get("scopeSpans", []):
            base = _resource_scope_fields(
                rs.get("resource", {}),
                ss.get("scope", {}),
                rs.get("schemaUrl", ""),
                ss.get("schemaUrl", ""),
            )
            for span in ss.get("spans", []):
                rec = dict(base)
                rec["span_trace_id"] = span.get("traceId", "")
                rec["span_span_id"] = span.get("spanId", "")
                rec["span_parent_span_id"] = span.get("parentSpanId", "")
                rec["span_name"] = span.get("name", "")
                rec["span_kind"] = _enum_int(span.get("kind", 0), _SPAN_KIND_NAMES)
                start = int(span.get("startTimeUnixNano", 0))
                end = int(span.get("endTimeUnixNano", 0))
                rec["span_start_time_unix_nano"] = span.get("startTimeUnixNano")
                rec["span_start_time_unix_nano_epoch"] = start
                rec["span_end_time_unix_nano"] = span.get("endTimeUnixNano")
                rec["span_duration_ns"] = max(end - start, 0)
                status = span.get("status", {})
                rec["span_status_code"] = {"STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2}.get(
                    status.get("code", 0), status.get("code", 0) if isinstance(status.get("code", 0), int) else 0
                )
                rec["span_status_message"] = status.get("message", "")
                rec["span_dropped_events_count"] = span.get("droppedEventsCount", 0)
                rec["span_dropped_links_count"] = span.get("droppedLinksCount", 0)
                events = span.get("events", [])
                if events:
                    rec["event_name"] = events[0].get("name")
                    rec["span_event_count"] = len(events)
                # attrs last, engine-protected (see flatten_otel_logs)
                insert_attributes(rec, span.get("attributes"), protect=True)
                records.append(rec)
    return records
