"""Demo-data + OTel demo generator (VERDICT r4 next-7).

Reference surface: GET /api/v1/demodata?action=... (demo_data.rs:39-82,
ingest_demo_data.sh) and POST/GET/DELETE /api/v1/otel_generator
(otel_generator.rs). Everything generated is deterministic, so content
is asserted, not just counts.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from parseable_spark import demo_data as dd
from parseable_spark.ingest.otel import (
    flatten_otel_logs,
    flatten_otel_metrics,
    flatten_otel_traces,
)
from parseable_spark.server import ParseableAPI, serve_background


def _req(method: str, url: str, body=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(
        url, data=data, method=method, headers={"Content-Type": "application/json"}
    )
    try:
        resp = urllib.request.urlopen(req, timeout=30)
        return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _wait(pred, timeout=20.0, interval=0.1):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return False


class TestGenerators:
    def test_demo_log_records_deterministic_and_shaped(self):
        a, b = dd.demo_log_records(10, seed=3), dd.demo_log_records(10, seed=3)
        assert a == b
        r = a[0]
        for f in ("body", "trace_id", "span_id", "severity_text",
                  "service.name", "url.path", "upstream.cluster",
                  "user_agent.original", "event.name"):
            assert f in r
        assert len(r["trace_id"]) == 32 and len(r["span_id"]) == 16
        # severity tracks status classes across the cycle
        sevs = {x["severity_text"] for x in a}
        assert sevs == {"INFO", "WARN", "ERROR"}

    def test_otel_batch_flattens_through_real_ingest_kernels(self):
        batch = dd.build_otel_batch(7)
        assert dd.build_otel_batch(7) == batch  # deterministic
        logs = flatten_otel_logs(batch["logs"])
        traces = flatten_otel_traces(batch["traces"])
        metrics = flatten_otel_metrics(batch["metrics"])
        assert len(logs) == 5  # one record per service
        assert len(traces) == 10  # root + child span per service
        assert len(metrics) == 5 * 4  # 3 counters + 1 gauge per service
        # log <-> trace correlation: every log's trace id has spans
        span_traces = {t["span_trace_id"] for t in traces}
        assert all(lg["trace_id"] in span_traces for lg in logs)
        assert {m["metric_type"] for m in metrics} == {"sum", "gauge"}
        assert all("__series_hash_u64" in m for m in metrics)


class TestOtelGeneratorSessions:
    def test_lifecycle_and_tenant_keying(self):
        gen = dd.OtelDemoGenerator(interval_secs=0.02)
        sent: list[tuple] = []
        res = gen.start(lambda k, s, p: sent.append((k, s)) or 1, "http://x", 0)
        assert res["status"] == "started" and "infinite" in res["message"]
        # double start is an error; another tenant starts independently
        assert gen.start(lambda *a: 1, "http://x", 0)["status"] == "error"
        assert gen.start(lambda *a: 1, "http://y", 5, "acme")["status"] == "started"
        st = gen.status()
        assert st["state"] == "running" and st["endpoint"] == "http://x"
        assert gen.status("acme")["duration"] == 5
        assert gen.status("ghost") == {"state": "stopped"}
        assert _wait(lambda: len(sent) >= 6, timeout=5)
        assert {s for _, s in sent} >= {
            "otel-demo-logs", "otel-demo-metrics", "otel-demo-traces"
        }
        assert gen.stop()["status"] == "stopping"
        assert _wait(lambda: gen.status()["state"] == "stopped", timeout=5)
        assert gen.stop()["status"] == "not_running"
        gen.stop("acme")

    def test_duration_expiry_removes_session(self):
        gen = dd.OtelDemoGenerator(interval_secs=0.01)
        gen.start(lambda *a: 1, "http://x", 1)
        # duration 1s at 10ms interval: expires on its own
        assert _wait(lambda: gen.status()["state"] == "stopped", timeout=5)

    def test_send_failures_do_not_kill_the_loop(self):
        gen = dd.OtelDemoGenerator(interval_secs=0.01)
        calls = []

        def bad_send(k, s, p):
            calls.append(k)
            raise RuntimeError("ingest down")

        gen.start(bad_send, "http://x", 0)
        assert _wait(lambda: len(calls) >= 6, timeout=5)
        assert gen.status()["state"] == "running"
        gen.stop()


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    api = ParseableAPI(spark, str(tmp_path_factory.mktemp("demo_store")))
    srv, base = serve_background(api)
    yield api, base
    srv.shutdown()


class TestDemodataRoute:
    def test_param_validation(self, served):
        _, base = served
        st, out = _req("GET", f"{base}/api/v1/demodata")
        assert st == 400
        st, out = _req("GET", f"{base}/api/v1/demodata?foo=1")
        assert st == 400 and "action" in out["error"]
        st, out = _req("GET", f"{base}/api/v1/demodata?action=bogus")
        assert st == 400 and "bogus" in out["error"]

    def test_ingest_action_spawns_and_lands_records(self, served):
        api, base = served
        st, _ = _req("GET", f"{base}/api/v1/demodata?action=ingest")
        assert st == 202
        assert _wait(lambda: "demodata" in api._stores)
        # the job drives the same ingest path: 200 records total
        # (count_fast_path = manifests + staging, no scan needed)
        assert _wait(
            lambda: api._stores["demodata"].count_fast_path() >= 200
        )

    def test_filters_alerts_dashboards_actions(self, served):
        api, base = served
        for action in ("filters", "alerts", "dashboards"):
            st, _ = _req("GET", f"{base}/api/v1/demodata?action={action}")
            assert st == 202
        assert _wait(lambda: len(api.list_filters()) >= 5)
        assert _wait(lambda: len(api.list_alerts()) >= 2)
        assert _wait(lambda: len(api.list_dashboards()) >= 1)
        dash = api.list_dashboards()[0]
        full = api.get_dashboard(dash["dashboardId"])
        assert len(full["tiles"]) == 2 and full["isFavorite"] is True
        names = {f["filterName"] for f in api.list_filters()}
        assert "error_logs" in names and "service_errors" in names

    def test_repeat_actions_are_idempotent(self, served):
        """Re-invoking the demo actions must not accumulate duplicate
        targets / scheduled alerts / filters / dashboards (review
        finding)."""
        api, base = served
        for action in ("filters", "alerts", "dashboards"):
            st, _ = _req("GET", f"{base}/api/v1/demodata?action={action}")
            assert st == 202
        assert _wait(lambda: len(api.list_dashboards()) >= 1)
        import time

        time.sleep(1.0)  # let the background jobs drain
        n_filters = len(api.list_filters())
        n_alerts = len(api.list_alerts())
        n_targets = len([t for t in api.targets.list()
                         if t.get("name") == "Demo Webhook"])
        n_dash = len(api.list_dashboards())
        for action in ("filters", "alerts", "dashboards"):
            _req("GET", f"{base}/api/v1/demodata?action={action}")
        time.sleep(1.5)
        assert len(api.list_filters()) == n_filters
        assert len(api.list_alerts()) == n_alerts
        assert len([t for t in api.targets.list()
                    if t.get("name") == "Demo Webhook"]) == n_targets
        assert len(api.list_dashboards()) == n_dash
        assert n_targets == 1


class TestOtelGeneratorRoute:
    def test_http_lifecycle_and_ingestion(self, served):
        api, base = served
        # fast cadence for the test; the route reuses an existing gen
        api._otel_demo_gen = dd.OtelDemoGenerator(interval_secs=0.05)
        st, out = _req("POST", f"{base}/api/v1/otel_generator", {"durationSecs": 60})
        assert st == 202 and out["status"] == "accepted"
        st, out = _req("GET", f"{base}/api/v1/otel_generator")
        assert st == 200 and out["state"] == "running" and out["duration"] == 60
        # conflict on double start
        st, out = _req("POST", f"{base}/api/v1/otel_generator", {})
        assert st == 409 and "already running" in out["error"]
        # batches land in the three otel-demo streams through the real
        # OTLP flatten + ingest path
        assert _wait(
            lambda: all(
                name in api._stores
                and api._stores[name].count_fast_path() > 0
                for name in (
                    "otel-demo-logs", "otel-demo-metrics", "otel-demo-traces"
                )
            )
        )
        st, out = _req("DELETE", f"{base}/api/v1/otel_generator")
        assert st == 200 and out["status"] == "stopping"
        assert _wait(
            lambda: _req("GET", f"{base}/api/v1/otel_generator")[1]["state"]
            == "stopped"
        )
        st, out = _req("DELETE", f"{base}/api/v1/otel_generator")
        assert st == 200 and out["status"] == "not_running"

    def test_duration_validation(self, served):
        _, base = served
        for bad in (0, -1, dd.MAX_DURATION_SECS + 1):
            st, out = _req(
                "POST", f"{base}/api/v1/otel_generator", {"durationSecs": bad}
            )
            assert st == 400 and "durationSecs" in out["error"]


def test_errors_total_is_monotonic_cumulative():
    """Review finding (r5): errors_total is an isMonotonic sum with a
    fixed start time, so its value must never decrease across
    sequences — the old `sequence if is_error else 0` reset to 0 on
    every non-error tick."""
    from parseable_spark.demo_data import build_otel_batch

    series: dict[int, list[int]] = {}
    for seq in range(1, 25):
        batch = build_otel_batch(seq)
        for pos, rm in enumerate(batch["metrics"]["resourceMetrics"]):
            for sm in rm["scopeMetrics"]:
                for m in sm["metrics"]:
                    if m["name"] == "errors_total":
                        v = int(m["sum"]["dataPoints"][0]["asInt"])
                        series.setdefault(pos, []).append(v)
    assert series
    for pos, vals in series.items():
        assert vals == sorted(vals), f"service {pos} not monotonic: {vals}"
        assert vals[-1] > 0  # errors do accumulate
