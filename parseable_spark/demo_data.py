"""Demo data + OTel demo generator — first-run onboarding surface.

Reference parity:
- ``GET /api/v1/demodata?action=ingest|filters|alerts|dashboards``
  (src/handlers/http/demo_data.rs:39-82): kicks off a background job
  that drives the server's own public API — sample proxy-access log
  ingestion, SQL + saved filters, a webhook target + alerts, and a demo
  dashboard with tiles (resources/ingest_demo_data.sh). Responds 202
  Accepted immediately; missing/unknown ``action`` is 400.
- ``POST/GET/DELETE /api/v1/otel_generator``
  (src/handlers/http/otel_generator.rs, src/otel_generator.rs):
  per-tenant generator sessions emitting OTLP/JSON logs+metrics+traces
  batches on a fixed cadence into the ``/v1/{signal}`` ingest path
  (streams ``otel-demo-{logs,metrics,traces}``), with
  ``durationSecs`` ∈ [1, 604800], 409 when already running, and a
  status document {state, endpoint, duration, elapsedSecs}.

Architecture: the reference embeds a bash script and an HTTP client;
here the job drives the SAME ``ParseableAPI`` methods its HTTP routes
call (ingest, save_filter, create_target/create_alert,
create_dashboard/update_dashboard, ingest_otel), so demo artifacts are
created through the identical validation/persistence code paths with
no loopback socket. All generated values are deterministic functions
of (seed, sequence) — no wall-clock RNG — so tests can assert exact
content.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable

DEMO_STREAM = "demodata"
DEMO_ACTIONS = ("ingest", "filters", "alerts", "dashboards", "all")

# serializes background demo jobs process-wide: the by-name idempotence
# of each action reads existing artifacts before creating, so two
# concurrent jobs must not interleave that read-then-create
_DEMO_JOB_LOCK = threading.Lock()

OTEL_STREAMS = {
    "logs": "otel-demo-logs",
    "metrics": "otel-demo-metrics",
    "traces": "otel-demo-traces",
}
MAX_DURATION_SECS = 7 * 24 * 60 * 60
DEFAULT_DURATION_SECS = 86_400
GENERATION_INTERVAL_SECS = 2.0

_SERVICES = (
    "api-gateway",
    "user-service",
    "order-service",
    "payment-service",
    "inventory-service",
)
_METHODS = ("GET", "POST", "PUT", "DELETE", "PATCH", "HEAD")
_STATUS = (200, 400, 401, 500, 503)
_ENDPOINTS = ("/products", "/cart", "/login", "/checkout", "/search")
_AGENTS = ("curl/7.88.1", "python-requests/2.32.3", "Mozilla/5.0")
_CLUSTERS = ("web", "api", "db")
_LOG_MESSAGES = (
    "Request processed successfully",
    "Database query executed",
    "User authenticated",
    "Cache hit for key",
    "Event published to queue",
    "Retrying failed request",
    "Rate limit checked",
    "Connection pool acquired",
    "Circuit breaker open",
    "Validation passed",
)


def _severity(status: int) -> tuple[int, str]:
    if status >= 500:
        return 18, "ERROR"
    if status >= 400:
        return 14, "WARN"
    return 10, "INFO"


def demo_log_records(count: int, seed: int = 0) -> list[dict[str, Any]]:
    """Deterministic proxy-access demo records with the script's field
    surface (ingest_demo_data.sh generate_batch): OTel-ish log fields +
    ECS-ish networking attributes, severities derived from status."""
    out = []
    base_nanos = 1_700_000_000_000_000_000 + seed * 1_000_000_000
    for i in range(count):
        k = seed + i
        status = _STATUS[k % len(_STATUS)]
        sev_num, sev_text = _severity(status)
        method = _METHODS[k % len(_METHODS)]
        endpoint = _ENDPOINTS[k % len(_ENDPOINTS)]
        service = _SERVICES[k % len(_SERVICES)]
        nanos = base_nanos + i * 1_000_000
        src = f"192.168.{k % 256}.{(k * 7) % 256}"
        dst = f"192.168.{(k + 1) % 256}.{(k * 7 + 7) % 256}"
        out.append(
            {
                "body": (
                    f"{method} {endpoint} HTTP/1.1 {status} - "
                    f"bytes:{500 + k % 1000} duration:{10 + k % 90}ms"
                ),
                "time_unix_nano": str(nanos),
                "observed_time_unix_nano": str(nanos),
                "trace_id": f"{(k * 2654435761) % (1 << 128):032x}",
                "span_id": f"{(k * 40503) % (1 << 64):016x}",
                "flags": 0,
                "severity_number": sev_num,
                "severity_text": sev_text,
                "service.name": service,
                "source.address": src,
                "destination.address": dst,
                "server.address": dst,
                "url.path": endpoint,
                "url.full": f"http://{service}:8080{endpoint}",
                "upstream.cluster": _CLUSTERS[k % len(_CLUSTERS)],
                "user_agent.original": _AGENTS[k % len(_AGENTS)],
                "event.name": "proxy.access",
            }
        )
    return out


# --- demo actions (ingest_demo_data.sh run_* parity) -------------------------


def _run_ingest(api, stream: str, records: int, batch_size: int) -> int:
    sent = 0
    while sent < records:
        n = min(batch_size, records - sent)
        api.ingest(stream, demo_log_records(n, seed=sent))
        sent += n
    return sent


def _run_filters(api, stream: str) -> int:
    sql_filters = [
        ("error_logs", "Monitor all ERROR and FATAL severity events",
         f"SELECT * FROM {stream} WHERE severity_text IN ('ERROR', 'FATAL') "
         "ORDER BY time_unix_nano DESC LIMIT 100"),
        ("service_health_summary", "Service health metrics by severity",
         f'SELECT "service.name", severity_text, COUNT(*) as count FROM '
         f'{stream} GROUP BY "service.name", severity_text ORDER BY count DESC'),
        ("api_endpoint_performance", "API endpoint request patterns",
         f'SELECT "url.path", COUNT(*) as request_count FROM {stream} '
         'GROUP BY "url.path" ORDER BY request_count DESC LIMIT 20'),
    ]
    saved_filters = [
        ("service_errors", "Monitor service errors and failures",
         f"SELECT * FROM {stream} WHERE severity_text IN ('ERROR', 'FATAL') "
         "LIMIT 500", "service.name"),
        ("api_endpoint_monitoring", "API endpoint usage patterns",
         f'SELECT * FROM {stream} WHERE "url.path" IS NOT NULL LIMIT 500',
         "url.path"),
    ]
    # idempotent by name: a re-invoked demo action must not accumulate
    # duplicate filter documents (review finding)
    existing = {f.get("filterName") for f in api.list_filters()}
    n = 0
    for name, desc, q in sql_filters:
        if name in existing:
            continue
        api.save_filter(
            {
                "filterName": name,
                "streamName": stream,
                "filterDescription": desc,
                "query": {"filterType": "sql", "filterQuery": q},
            }
        )
        n += 1
    for name, desc, q, group_by in saved_filters:
        if name in existing:
            continue
        api.save_filter(
            {
                "filterName": name,
                "streamName": stream,
                "filterDescription": desc,
                "query": {"filterType": "filter", "filterQuery": q},
                "groupBy": group_by,
            }
        )
        n += 1
    return n


def _run_alerts(api, stream: str) -> int:
    api.get_or_create_stream(stream)
    # idempotent by name: reuse the existing demo target and skip
    # already-created alert titles — each re-invocation must not add
    # another scheduled alert to the evaluator forever (review finding)
    target = next(
        (t for t in api.targets.list() if t.get("name") == "Demo Webhook"),
        None,
    )
    if target is None:
        target = api.create_target(
            {
                "type": "webhook",
                "name": "Demo Webhook",
                "endpoint": "https://hooks.slack.com/services/demo/demo/demo",
                "skipTlsCheck": False,
            }
        )
    tid = target.get("id") or target.get("targetId")
    existing_titles = {a.get("title") for a in api.list_alerts()}
    alerts = [
        ("Demo error spike", "count", ">", 100.0,
         {"column": "severity_text", "operator": "=", "value": "ERROR"}),
        ("Demo traffic surge", "count", ">", 10_000.0, None),
    ]
    n = 0
    for title, agg, op, threshold, condition in alerts:
        if title in existing_titles:
            continue
        body: dict[str, Any] = {
            "title": title,
            "stream": stream,
            "aggregate": agg,
            "operator": op,
            "threshold": threshold,
            "targets": [tid] if tid else [],
        }
        if condition:
            body["conditions"] = {
                "operator": "AND",
                "conditionConfig": [condition],
            }
        api.create_alert(body)
        n += 1
    return n


def _run_dashboards(api, stream: str) -> str:
    # idempotent by title (create_dashboard rejects duplicate titles,
    # which previously made a re-run die silently in the background
    # thread — review finding)
    existing = next(
        (
            d
            for d in api.list_dashboards()
            if d.get("title") == "Demo Dashboard"
        ),
        None,
    )
    if existing is not None:
        return existing["dashboardId"]
    d = api.create_dashboard("demo", {"title": "Demo Dashboard", "tags": ["demo", "oss"]})
    did = d["dashboardId"]
    tiles = [
        {
            "tile_id": "demo-tile-severity",
            "title": "Events by severity",
            "chartQuery": (
                f"SELECT severity_text, COUNT(*) AS count FROM {stream} "
                "GROUP BY severity_text"
            ),
            "chartType": "bar",
        },
        {
            "tile_id": "demo-tile-endpoints",
            "title": "Requests by endpoint",
            "chartQuery": (
                f'SELECT "url.path", COUNT(*) AS requests FROM {stream} '
                'GROUP BY "url.path"'
            ),
            "chartType": "line",
        },
    ]
    api.update_dashboard(
        "demo", did, {**d, "isFavorite": True, "tiles": tiles}, {}, is_admin=True
    )
    return did


def run_demo_action(
    api,
    action: str,
    stream: str = DEMO_STREAM,
    records: int = 200,
    batch_size: int = 100,
    background: bool = True,
) -> threading.Thread | None:
    """Execute a demodata action against the tenant's own API object —
    the same methods its HTTP routes dispatch to. ``background=True``
    mirrors the reference's spawn-and-202 contract (demo_data.rs
    spawn_demo_script); the returned thread is join()-able for tests.
    Unknown actions raise ValueError (the route's 400)."""
    if action not in DEMO_ACTIONS:
        raise ValueError(f"unknown demodata action {action!r}")

    def job() -> None:
        # the HTTP client already got its 202 — failures here must land
        # in the log, not vanish with the daemon thread (review
        # finding; the reference captures and logs the demo script's
        # output the same way)
        import logging

        try:
            # serialize demo jobs: two concurrent invocations would both
            # read empty existing-artifact sets and double-create,
            # defeating the by-name idempotence (caught live in verify)
            with _DEMO_JOB_LOCK:
                if action in ("ingest", "all"):
                    _run_ingest(api, stream, records, batch_size)
                if action in ("filters", "all"):
                    _run_filters(api, stream)
                if action in ("alerts", "all"):
                    _run_alerts(api, stream)
                if action in ("dashboards", "all"):
                    _run_dashboards(api, stream)
        except Exception:  # noqa: BLE001
            logging.getLogger(__name__).exception(
                "demodata action %r failed after 202", action
            )

    if not background:
        job()
        return None
    t = threading.Thread(target=job, name=f"demodata-{action}", daemon=True)
    t.start()
    return t


# --- OTel demo generator (src/otel_generator.rs parity) ----------------------


def _hex_id(seq: int, service_idx: int, width: int) -> str:
    v = (seq * 1_000_003 + service_idx * 7919 + 1) % (1 << (width * 4))
    return f"{v:0{width}x}"


def _kv(key: str, value: Any) -> dict[str, Any]:
    if isinstance(value, bool):
        v: dict[str, Any] = {"boolValue": value}
    elif isinstance(value, int):
        v = {"intValue": str(value)}
    elif isinstance(value, float):
        v = {"doubleValue": value}
    else:
        v = {"stringValue": str(value)}
    return {"key": key, "value": v}


def build_otel_batch(sequence: int) -> dict[str, dict[str, Any]]:
    """One generation tick → {"logs": ..., "metrics": ..., "traces": ...}
    OTLP/JSON export requests: per service a 2-span trace, one log
    record correlated to it (trace/span ids embedded), and a counter +
    gauge metric set (otel_generator.rs build_batch shape). Fully
    deterministic in ``sequence``."""
    now = 1_700_000_000_000_000_000 + sequence * 2_000_000_000
    method = _METHODS[sequence % len(_METHODS)]
    path = _ENDPOINTS[sequence % len(_ENDPOINTS)]
    resource_spans, resource_logs, resource_metrics = [], [], []
    for idx, service in enumerate(_SERVICES):
        is_error = (sequence + idx) % 4 == 0
        status_code = (500 if idx % 2 else 404) if is_error else 200
        start = now + idx * 1_000_000
        duration_ms = 250 + (sequence * 31 + idx * 17) % 250
        end = start + duration_ms * 1_000_000
        trace_id = _hex_id(sequence, idx, 32)
        root_span = _hex_id(sequence, idx, 16)
        child_span = _hex_id(sequence, idx + 100, 16)
        resource = {
            "attributes": [
                _kv("service.name", service),
                _kv("deployment.environment", "demo"),
            ]
        }
        scope = {"name": f"parseable.otel-demo", "version": "1.0.0"}
        resource_spans.append(
            {
                "resource": resource,
                "scopeSpans": [
                    {
                        "scope": scope,
                        "spans": [
                            {
                                "traceId": trace_id,
                                "spanId": root_span,
                                "name": f"{method} {path}",
                                "kind": 2,
                                "startTimeUnixNano": str(start),
                                "endTimeUnixNano": str(end),
                                "attributes": [
                                    _kv("http.method", method),
                                    _kv("http.url", path),
                                    _kv("http.status_code", status_code),
                                ],
                                "status": {"code": 2 if is_error else 1},
                            },
                            {
                                "traceId": trace_id,
                                "spanId": child_span,
                                "parentSpanId": root_span,
                                "name": "db.query",
                                "kind": 3,
                                "startTimeUnixNano": str(start + 5_000_000),
                                "endTimeUnixNano": str(end - 5_000_000),
                                "attributes": [
                                    _kv(
                                        "db.operation",
                                        "SELECT" if idx % 2 == 0 else "UPDATE",
                                    )
                                ],
                                "status": {"code": 1},
                            },
                        ],
                    }
                ],
            }
        )
        message = (
            "Synthetic request failed"
            if is_error
            else _LOG_MESSAGES[(sequence + idx) % len(_LOG_MESSAGES)]
        )
        resource_logs.append(
            {
                "resource": resource,
                "scopeLogs": [
                    {
                        "scope": scope,
                        "logRecords": [
                            {
                                "timeUnixNano": str(end),
                                "observedTimeUnixNano": str(end),
                                "severityNumber": 17 if is_error else 9,
                                "severityText": "ERROR" if is_error else "INFO",
                                "body": {
                                    "stringValue": (
                                        f"{message} - {method} {path} {status_code}"
                                    )
                                },
                                "attributes": [
                                    _kv("service", service),
                                    _kv("k8s.namespace.name", "production"),
                                    _kv(
                                        "k8s.pod.name",
                                        f"{service}-demo-{sequence}",
                                    ),
                                    _kv("http.method", method),
                                    _kv("http.status_code", status_code),
                                ],
                                "flags": 1,
                                "traceId": trace_id,
                                "spanId": root_span,
                                "eventName": (
                                    "request.failed"
                                    if is_error
                                    else "request.completed"
                                ),
                            }
                        ],
                    }
                ],
            }
        )
        factor = idx + 1
        # errors_total must be CUMULATIVE like its siblings: it's an
        # isMonotonic sum with a fixed startTimeUnixNano, so a value
        # that resets to 0 on non-error ticks reads as a counter reset
        # and wrecks any rate/delta a consumer computes. Count of error
        # ticks in sequences 1..sequence (is_error ⇔ (s+idx) % 4 == 0):
        errors_so_far = (sequence + idx) // 4 - idx // 4
        counters = [
            ("http_requests_total", "Total HTTP requests", sequence * factor),
            ("cache_hits_total", "Total cache hits", sequence * factor * 3),
            ("errors_total", "Total errors", errors_so_far),
        ]
        metrics = [
            {
                "name": name,
                "description": desc,
                "unit": "1",
                "sum": {
                    "aggregationTemporality": 2,
                    "isMonotonic": True,
                    "dataPoints": [
                        {
                            "startTimeUnixNano": str(now - sequence * 2_000_000_000),
                            "timeUnixNano": str(now),
                            "asInt": str(int(value)),
                            "attributes": [
                                _kv("service", service),
                                _kv("k8s.namespace.name", "production"),
                            ],
                        }
                    ],
                },
            }
            for name, desc, value in counters
        ]
        metrics.append(
            {
                "name": "cpu_usage_percent",
                "description": "CPU usage",
                "unit": "%",
                "gauge": {
                    "dataPoints": [
                        {
                            "timeUnixNano": str(now),
                            "asDouble": float(20 + (sequence * 13 + idx * 29) % 60),
                            "attributes": [_kv("service", service)],
                        }
                    ]
                },
            }
        )
        resource_metrics.append(
            {"resource": resource, "scopeMetrics": [{"scope": scope, "metrics": metrics}]}
        )
    return {
        "logs": {"resourceLogs": resource_logs},
        "metrics": {"resourceMetrics": resource_metrics},
        "traces": {"resourceSpans": resource_spans},
    }


class OtelDemoGenerator:
    """Per-tenant OTel demo sessions (otel_generator.rs OtelGenerator):
    one background loop per tenant key emitting a batch per interval
    through a sender callable ``send(kind, stream, payload) -> int``
    (wired to the tenant API's ingest_otel — the same code /v1/{signal}
    dispatches to)."""

    def __init__(self, interval_secs: float = GENERATION_INTERVAL_SECS) -> None:
        self.interval_secs = interval_secs
        self._lock = threading.Lock()
        self._sessions: dict[str | None, dict[str, Any]] = {}
        self._next_id = 1

    def start(
        self,
        send: Callable[[str, str, dict], int],
        endpoint: str,
        duration_secs: int | None,
        tenant_id: str | None = None,
    ) -> dict[str, str]:
        duration = DEFAULT_DURATION_SECS if duration_secs is None else duration_secs
        desc = f" for tenant '{tenant_id}'" if tenant_id else ""
        with self._lock:
            existing = self._sessions.get(tenant_id)
            if existing is not None:
                return {
                    "status": "error",
                    "message": f"Generator is already {existing['state']}{desc}",
                }
            stop_event = threading.Event()
            session = {
                "id": self._next_id,
                "endpoint": endpoint,
                "duration_secs": duration,
                "started_at": time.monotonic(),
                "state": "running",
                "stop": stop_event,
            }
            self._next_id += 1
            self._sessions[tenant_id] = session

        def loop() -> None:
            sequence = 0
            started = session["started_at"]
            try:
                while not stop_event.is_set():
                    if (
                        duration > 0
                        and time.monotonic() - started >= duration
                    ):
                        break
                    sequence += 1
                    batch = build_otel_batch(sequence)
                    for kind, stream in OTEL_STREAMS.items():
                        if stop_event.is_set():
                            break
                        try:
                            send(kind, stream, batch[kind])
                        except Exception:  # noqa: BLE001 — export failures
                            pass  # are logged-and-continued in the reference
                    stop_event.wait(self.interval_secs)
            finally:
                with self._lock:
                    cur = self._sessions.get(tenant_id)
                    if cur is not None and cur["id"] == session["id"]:
                        del self._sessions[tenant_id]

        threading.Thread(
            target=loop, name=f"otel-demo-{tenant_id or 'default'}", daemon=True
        ).start()
        dur_desc = "infinite" if duration == 0 else f"{duration}s"
        return {
            "status": "started",
            "message": f"Generator started{desc} (duration: {dur_desc})",
        }

    def stop(self, tenant_id: str | None = None) -> dict[str, str]:
        desc = f" for tenant '{tenant_id}'" if tenant_id else ""
        with self._lock:
            session = self._sessions.get(tenant_id)
            if session is None:
                return {
                    "status": "not_running",
                    "message": f"Generator is not running{desc}",
                }
            if session["state"] == "stopping":
                return {
                    "status": "stopping",
                    "message": f"Generator is already stopping{desc}",
                }
            session["state"] = "stopping"
            session["stop"].set()
        return {
            "status": "stopping",
            "message": f"Generator stop requested{desc}",
        }

    def status(self, tenant_id: str | None = None) -> dict[str, Any]:
        with self._lock:
            session = self._sessions.get(tenant_id)
            if session is None:
                return {"state": "stopped"}
            return {
                "state": session["state"],
                "endpoint": session["endpoint"],
                "duration": session["duration_secs"],
                "elapsedSecs": time.monotonic() - session["started_at"],
            }
