"""OTLP/protobuf wire decoding — logs, metrics, traces → OTLP/JSON.

Reference parity note: Parseable OSS *rejects* ``application/x-protobuf``
("Protobuf ingestion is not supported in Parseable OSS",
``src/handlers/http/modal/utils/ingest_utils.rs:155-161``; the
enterprise tier accepts it). We deliberately go beyond OSS here: the
default OTLP/HTTP encoding every collector ships with IS protobuf, so
a drop-in engine should take it. The decode target is the OTLP/JSON
mapping (the protobuf JSON mapping as profiled by opentelemetry-proto):
int64/fixed64 as decimal strings, trace/span ids as hex, bytes values
as base64, enums as ints — exactly the dicts ``otel.py``'s flatteners
already consume, so both encodings land in identical columns.

Implementation: a schema-driven decoder of the protobuf wire format
(varint / 64-bit / length-delimited / 32-bit wire types, packed
repeated scalars, zigzag sint) with field tables transcribed from the
public ``opentelemetry-proto`` .proto files (logs/v1, metrics/v1,
trace/v1, common/v1, resource/v1). Unknown fields are skipped by wire
type — a newer exporter never breaks ingestion. No generated code, no
protobuf dependency.
"""

from __future__ import annotations

import base64
import struct
from typing import Any

# --------------------------------------------------------------------------
# wire-format primitives
# --------------------------------------------------------------------------


class ProtoDecodeError(ValueError):
    pass


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ProtoDecodeError("truncated varint")
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 63:
            raise ProtoDecodeError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# field kinds: how a decoded raw value becomes its OTLP/JSON form
#   int      varint  -> int            (uint32, enums)
#   int64s   varint  -> decimal str    (int64/uint64: JSON carries strings)
#   sint     varint  -> zigzag int
#   bool     varint  -> bool
#   double   64-bit  -> float
#   fixed64s 64-bit  -> decimal str    (time_unix_nano, counts)
#   sfixed64s 64-bit -> decimal str    (NumberDataPoint.as_int)
#   fixed32  32-bit  -> int            (LogRecord/Span flags)
#   string   bytes   -> utf-8 str
#   hex      bytes   -> lowercase hex  (trace_id / span_id)
#   b64      bytes   -> base64 str     (AnyValue.bytes_value)
#   <Name>   bytes   -> nested message dict
_SCALAR_WIRETYPE = {
    "int": 0, "int64s": 0, "sint": 0, "bool": 0,
    "double": 1, "fixed64s": 1, "sfixed64s": 1,
    "fixed32": 5,
    "string": 2, "hex": 2, "b64": 2,
}


def _convert(kind: str, raw: Any) -> Any:
    if kind == "int":
        return raw
    if kind == "int64s":
        # proto int64 negatives arrive as 10-byte two's-complement
        # varints — without the sign fold, -5 decoded as
        # 18446744073709551611 (r6 review, verified)
        if raw >= 1 << 63:
            raw -= 1 << 64
        return str(raw)
    if kind == "sint":
        return _zigzag(raw)
    if kind == "bool":
        return bool(raw)
    if kind == "double":
        return struct.unpack("<d", raw)[0] if isinstance(raw, bytes) else raw
    if kind == "fixed64s":
        return str(struct.unpack("<Q", raw)[0])
    if kind == "sfixed64s":
        return str(struct.unpack("<q", raw)[0])
    if kind == "fixed32":
        return struct.unpack("<I", raw)[0]
    if kind == "string":
        return raw.decode("utf-8", errors="replace")
    if kind == "hex":
        return raw.hex()
    if kind == "b64":
        return base64.b64encode(raw).decode()
    raise ProtoDecodeError(f"unknown kind {kind}")


def _skip(buf: bytes, i: int, wt: int) -> int:
    if wt == 0:
        _, i = _varint(buf, i)
    elif wt == 1:
        i += 8
    elif wt == 2:
        n, i = _varint(buf, i)
        i += n
    elif wt == 5:
        i += 4
    else:
        raise ProtoDecodeError(f"unsupported wire type {wt}")
    if i > len(buf):
        raise ProtoDecodeError("truncated field payload")
    return i


_MAX_NEST_DEPTH = 64  # AnyValue→kvlist→AnyValue chains are ~4 bytes/level
# on the wire, so unbounded recursion lets a KB-sized crafted body blow
# the Python stack (RecursionError → 500 instead of the 400 contract);
# real OTLP payloads nest a handful of levels


def decode_message(buf: bytes, message: str, _depth: int = 0) -> dict[str, Any]:
    """Wire bytes → dict with OTLP/JSON field names, per the schema
    tables below. Repeated fields accumulate lists; packed repeated
    scalars (wire type 2 carrying a numeric kind) are unpacked."""
    if _depth > _MAX_NEST_DEPTH:
        raise ProtoDecodeError(
            f"message nesting exceeds {_MAX_NEST_DEPTH} levels"
        )
    fields = MESSAGES[message]
    out: dict[str, Any] = {}
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        spec = fields.get(fno)
        if spec is None:
            i = _skip(buf, i, wt)
            continue
        name, kind, repeated = spec
        values: list[Any] = []

        def _need(k: int) -> None:  # slices are silent on shortfall
            if i + k > n:
                raise ProtoDecodeError("truncated field payload")

        if kind in MESSAGES:  # nested message
            ln, i = _varint(buf, i)
            _need(ln)
            values.append(decode_message(buf[i : i + ln], kind, _depth + 1))
            i += ln
        elif wt == 2 and _SCALAR_WIRETYPE[kind] != 2:  # packed scalars
            ln, i = _varint(buf, i)
            _need(ln)
            end = i + ln
            while i < end:
                if _SCALAR_WIRETYPE[kind] == 0:
                    raw, i = _varint(buf, i)
                elif _SCALAR_WIRETYPE[kind] == 1:
                    raw, i = buf[i : i + 8], i + 8
                else:
                    raw, i = buf[i : i + 4], i + 4
                values.append(_convert(kind, raw))
        elif wt == 0:
            raw, i = _varint(buf, i)
            values.append(_convert(kind, raw))
        elif wt == 1:
            _need(8)
            values.append(_convert(kind, buf[i : i + 8]))
            i += 8
        elif wt == 5:
            _need(4)
            values.append(_convert(kind, buf[i : i + 4]))
            i += 4
        elif wt == 2:
            ln, i = _varint(buf, i)
            _need(ln)
            values.append(_convert(kind, buf[i : i + ln]))
            i += ln
        else:
            raise ProtoDecodeError(f"unsupported wire type {wt}")
        if repeated:
            out.setdefault(name, []).extend(values)
        else:
            out[name] = values[-1]
    return out


# --------------------------------------------------------------------------
# schema tables — transcribed from opentelemetry-proto (field numbers are
# the public .proto definitions; names are the protobuf JSON mapping)
# --------------------------------------------------------------------------

_R = True  # repeated

MESSAGES: dict[str, dict[int, tuple[str, str, bool]]] = {
    # -- common/v1 --
    "AnyValue": {
        1: ("stringValue", "string", False),
        2: ("boolValue", "bool", False),
        3: ("intValue", "int64s", False),
        4: ("doubleValue", "double", False),
        5: ("arrayValue", "ArrayValue", False),
        6: ("kvlistValue", "KeyValueList", False),
        7: ("bytesValue", "b64", False),
    },
    "ArrayValue": {1: ("values", "AnyValue", _R)},
    "KeyValueList": {1: ("values", "KeyValue", _R)},
    "KeyValue": {1: ("key", "string", False), 2: ("value", "AnyValue", False)},
    "InstrumentationScope": {
        1: ("name", "string", False),
        2: ("version", "string", False),
        3: ("attributes", "KeyValue", _R),
        4: ("droppedAttributesCount", "int", False),
    },
    # -- resource/v1 --
    "Resource": {
        1: ("attributes", "KeyValue", _R),
        2: ("droppedAttributesCount", "int", False),
    },
    # -- logs/v1 --
    "ExportLogsServiceRequest": {1: ("resourceLogs", "ResourceLogs", _R)},
    "ResourceLogs": {
        1: ("resource", "Resource", False),
        2: ("scopeLogs", "ScopeLogs", _R),
        3: ("schemaUrl", "string", False),
    },
    "ScopeLogs": {
        1: ("scope", "InstrumentationScope", False),
        2: ("logRecords", "LogRecord", _R),
        3: ("schemaUrl", "string", False),
    },
    "LogRecord": {
        1: ("timeUnixNano", "fixed64s", False),
        2: ("severityNumber", "int", False),
        3: ("severityText", "string", False),
        5: ("body", "AnyValue", False),
        6: ("attributes", "KeyValue", _R),
        7: ("droppedAttributesCount", "int", False),
        8: ("flags", "fixed32", False),
        9: ("traceId", "hex", False),
        10: ("spanId", "hex", False),
        11: ("observedTimeUnixNano", "fixed64s", False),
        12: ("eventName", "string", False),
    },
    # -- metrics/v1 --
    "ExportMetricsServiceRequest": {1: ("resourceMetrics", "ResourceMetrics", _R)},
    "ResourceMetrics": {
        1: ("resource", "Resource", False),
        2: ("scopeMetrics", "ScopeMetrics", _R),
        3: ("schemaUrl", "string", False),
    },
    "ScopeMetrics": {
        1: ("scope", "InstrumentationScope", False),
        2: ("metrics", "Metric", _R),
        3: ("schemaUrl", "string", False),
    },
    "Metric": {
        1: ("name", "string", False),
        2: ("description", "string", False),
        3: ("unit", "string", False),
        5: ("gauge", "Gauge", False),
        7: ("sum", "Sum", False),
        9: ("histogram", "Histogram", False),
        10: ("exponentialHistogram", "ExponentialHistogram", False),
        11: ("summary", "Summary", False),
        12: ("metadata", "KeyValue", _R),
    },
    "Gauge": {1: ("dataPoints", "NumberDataPoint", _R)},
    "Sum": {
        1: ("dataPoints", "NumberDataPoint", _R),
        2: ("aggregationTemporality", "int", False),
        3: ("isMonotonic", "bool", False),
    },
    "Histogram": {
        1: ("dataPoints", "HistogramDataPoint", _R),
        2: ("aggregationTemporality", "int", False),
    },
    "ExponentialHistogram": {
        1: ("dataPoints", "ExponentialHistogramDataPoint", _R),
        2: ("aggregationTemporality", "int", False),
    },
    "Summary": {1: ("dataPoints", "SummaryDataPoint", _R)},
    "NumberDataPoint": {
        2: ("startTimeUnixNano", "fixed64s", False),
        3: ("timeUnixNano", "fixed64s", False),
        4: ("asDouble", "double", False),
        5: ("exemplars", "Exemplar", _R),
        6: ("asInt", "sfixed64s", False),
        7: ("attributes", "KeyValue", _R),
        8: ("flags", "int", False),
    },
    "HistogramDataPoint": {
        2: ("startTimeUnixNano", "fixed64s", False),
        3: ("timeUnixNano", "fixed64s", False),
        4: ("count", "fixed64s", False),
        5: ("sum", "double", False),
        6: ("bucketCounts", "fixed64s", _R),
        7: ("explicitBounds", "double", _R),
        8: ("exemplars", "Exemplar", _R),
        9: ("attributes", "KeyValue", _R),
        10: ("flags", "int", False),
        11: ("min", "double", False),
        12: ("max", "double", False),
    },
    "ExponentialHistogramDataPoint": {
        1: ("attributes", "KeyValue", _R),
        2: ("startTimeUnixNano", "fixed64s", False),
        3: ("timeUnixNano", "fixed64s", False),
        4: ("count", "fixed64s", False),
        5: ("sum", "double", False),
        6: ("scale", "sint", False),
        7: ("zeroCount", "fixed64s", False),
        8: ("positive", "ExpBuckets", False),
        9: ("negative", "ExpBuckets", False),
        10: ("flags", "int", False),
        12: ("min", "double", False),
        13: ("max", "double", False),
    },
    "ExpBuckets": {
        1: ("offset", "sint", False),
        2: ("bucketCounts", "int64s", _R),
    },
    "SummaryDataPoint": {
        2: ("startTimeUnixNano", "fixed64s", False),
        3: ("timeUnixNano", "fixed64s", False),
        4: ("count", "fixed64s", False),
        5: ("sum", "double", False),
        6: ("quantileValues", "ValueAtQuantile", _R),
        7: ("attributes", "KeyValue", _R),
        8: ("flags", "int", False),
    },
    "ValueAtQuantile": {
        1: ("quantile", "double", False),
        2: ("value", "double", False),
    },
    "Exemplar": {
        2: ("timeUnixNano", "fixed64s", False),
        3: ("asDouble", "double", False),
        4: ("spanId", "hex", False),
        5: ("traceId", "hex", False),
        6: ("asInt", "sfixed64s", False),
        7: ("filteredAttributes", "KeyValue", _R),
    },
    # -- trace/v1 --
    "ExportTraceServiceRequest": {1: ("resourceSpans", "ResourceSpans", _R)},
    "ResourceSpans": {
        1: ("resource", "Resource", False),
        2: ("scopeSpans", "ScopeSpans", _R),
        3: ("schemaUrl", "string", False),
    },
    "ScopeSpans": {
        1: ("scope", "InstrumentationScope", False),
        2: ("spans", "Span", _R),
        3: ("schemaUrl", "string", False),
    },
    "Span": {
        1: ("traceId", "hex", False),
        2: ("spanId", "hex", False),
        3: ("traceState", "string", False),
        4: ("parentSpanId", "hex", False),
        5: ("name", "string", False),
        6: ("kind", "int", False),
        7: ("startTimeUnixNano", "fixed64s", False),
        8: ("endTimeUnixNano", "fixed64s", False),
        9: ("attributes", "KeyValue", _R),
        10: ("droppedAttributesCount", "int", False),
        11: ("events", "SpanEvent", _R),
        12: ("droppedEventsCount", "int", False),
        13: ("links", "SpanLink", _R),
        14: ("droppedLinksCount", "int", False),
        15: ("status", "SpanStatus", False),
        16: ("flags", "fixed32", False),
    },
    "SpanEvent": {
        1: ("timeUnixNano", "fixed64s", False),
        2: ("name", "string", False),
        3: ("attributes", "KeyValue", _R),
        4: ("droppedAttributesCount", "int", False),
    },
    "SpanLink": {
        1: ("traceId", "hex", False),
        2: ("spanId", "hex", False),
        3: ("traceState", "string", False),
        4: ("attributes", "KeyValue", _R),
        5: ("droppedAttributesCount", "int", False),
        6: ("flags", "fixed32", False),
    },
    "SpanStatus": {2: ("message", "string", False), 3: ("code", "int", False)},
}

_REQUEST_MESSAGE = {
    "logs": "ExportLogsServiceRequest",
    "metrics": "ExportMetricsServiceRequest",
    "traces": "ExportTraceServiceRequest",
}


def decode_otlp(kind: str, body: bytes) -> dict[str, Any]:
    """OTLP/HTTP protobuf request body → the OTLP/JSON dict the
    ``otel.py`` flatteners consume. ``kind`` ∈ logs|metrics|traces."""
    try:
        return decode_message(body, _REQUEST_MESSAGE[kind])
    except KeyError:
        raise ProtoDecodeError(f"unknown OTLP kind {kind!r}") from None
    except (IndexError, struct.error) as e:
        raise ProtoDecodeError(f"truncated protobuf payload: {e}") from None
