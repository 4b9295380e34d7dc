"""Regression pins for the round-7 judge ADVICE findings (fixed r8).

1 medium: config replay of pre-r7 mismatched grant tenants must not
kill server boot (coerce + warn instead of ApiError 400).
4 low: Host header host:port on nonstandard ports + non-2xx logging,
multi-addr pinned fallback, data_point_value committed-float64
consult, OIDC state flood / per-client cap.
"""

from __future__ import annotations

import os

import pytest


class TestGrantReplayCoercion:
    """ADVICE r7 medium — server.py _parse_grants during replay."""

    def test_boot_survives_pre_r7_mismatched_grant_tenant(self, spark, tmp_path):
        from parseable_spark.migration import save_versioned
        from parseable_spark.server import ParseableAPI

        root = str(tmp_path)
        cfg = {
            "deployment_id": "d1",
            "roles": {
                # pre-r7 installs persisted grants whose tenant field is
                # neither 'default' nor the workspace tenant with HTTP 200
                "legacy": [
                    {"privilege": "reader", "stream": "*", "tenant": "acme"}
                ],
            },
            "users": {},
        }
        save_versioned("config", os.path.join(root, "_config.json"), cfg)
        api = ParseableAPI(spark, root)  # must NOT raise at boot
        grants = api.rbac.get_role("legacy")
        assert grants and all(g.tenant == api.tenant for g in grants)

    def test_live_put_still_rejects_mismatched_tenant(self, spark, tmp_path):
        from parseable_spark.server import ApiError, ParseableAPI

        api = ParseableAPI(spark, str(tmp_path))
        with pytest.raises(ApiError) as ei:
            api.put_role(
                "r", [{"privilege": "reader", "stream": "*", "tenant": "other"}]
            )
        assert ei.value.status == 400


class TestHttpTransportHostAndStatus:
    """ADVICE r7 low — RFC 7230 §5.4 Host header + non-2xx logging."""

    def _serve(self, status: int):
        import http.server
        import threading

        seen = {}

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                seen["host"] = self.headers.get("Host")
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                self.send_response(status)
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, seen

    def test_host_header_carries_nonstandard_port(self):
        from parseable_spark.query.alert_targets import HttpTransport

        srv, seen = self._serve(200)
        try:
            port = srv.server_address[1]
            HttpTransport(timeout_s=5).post(
                f"http://127.0.0.1:{port}/hook", b"{}", {}
            )
            assert seen["host"] == f"127.0.0.1:{port}"
        finally:
            srv.shutdown()

    def test_non_2xx_is_logged(self, caplog):
        import logging

        from parseable_spark.query.alert_targets import HttpTransport

        srv, _ = self._serve(503)
        try:
            port = srv.server_address[1]
            with caplog.at_level(logging.ERROR):
                HttpTransport(timeout_s=5).post(
                    f"http://127.0.0.1:{port}/hook", b"{}", {}
                )
            assert any("HTTP 503" in r.message for r in caplog.records)
        finally:
            srv.shutdown()

    def test_pinned_addr_list_falls_back_past_unreachable(self):
        """First gate-validated address unreachable → next one is tried
        (pre-fix: hard pin to addrs[0], delivery failed outright)."""
        from parseable_spark.query.alert_targets import HttpTransport

        srv, seen = self._serve(200)
        try:
            port = srv.server_address[1]
            HttpTransport(timeout_s=5).post(
                f"http://rebind-target.invalid:{port}/hook",
                b"{}",
                {},
                # first candidate fails name/route resolution instantly
                pinned_ip=["256.999.1.1", "127.0.0.1"],
            )
            assert seen.get("host", "").startswith("rebind-target.invalid")
        finally:
            srv.shutdown()

    def test_send_passes_all_validated_addrs(self):
        from parseable_spark.query.alert_targets import (
            Context,
            RecordingTransport,
            WebhookTarget,
        )
        from parseable_spark.query.alerts import AlertState

        rec = RecordingTransport()
        t = WebhookTarget("t", "http://example.invalid/hook", transport=rec)
        t.policy_gate = lambda: {"addrs": ["2001:db8::1", "203.0.113.9"]}
        t._send(Context("id", "n", "m", AlertState.TRIGGERED))
        assert rec.calls[0]["pinned_ip"] == ["2001:db8::1", "203.0.113.9"]


class TestDataPointValueCommittedConsult:
    """ADVICE r7 low — cross-batch ordering: committed float64 wins."""

    def test_committed_float64_suppresses_int64_exemption(self, caplog):
        import logging

        from parseable_spark.ingest import schema as sc

        big = (1 << 53) + 1
        records = [{"data_point_value": big}]
        inferred = sc.infer_batch_schema(records)
        with caplog.at_level(logging.WARNING):
            out = sc.override_data_type(
                inferred,
                records,
                "v1",
                committed={"data_point_value": sc.FLOAT64},
            )
        assert out["data_point_value"] == sc.FLOAT64  # no sibling split
        assert any("2^53" in r.message for r in caplog.records)

    def test_fresh_column_still_gets_exact_int64(self):
        from parseable_spark.ingest import schema as sc

        big = (1 << 53) + 1
        records = [{"data_point_value": big}]
        inferred = sc.infer_batch_schema(records)
        out = sc.override_data_type(inferred, records, "v1", committed={})
        assert out["data_point_value"] == sc.INT64


class TestOidcStateFlood:
    """ADVICE r7 low — per-client pending-state cap (login DoS)."""

    def test_flooder_cannot_evict_other_clients_states(self, spark, tmp_path):
        from parseable_spark.server import ParseableAPI

        api = ParseableAPI(spark, str(tmp_path))
        victim_nonce = api.mint_oidc_state("/victim", client="10.0.0.1")
        for i in range(1200):  # well past the old global FIFO cap
            api.mint_oidc_state(f"/x{i}", client="192.0.2.66")
        # the flood is self-limiting: one address holds at most the
        # per-client cap, so the victim's pending login survives
        assert api.consume_oidc_state(victim_nonce) == "/victim"
        per_client = [
            c for (_, _, c) in api._oidc_states.values() if c == "192.0.2.66"
        ]
        assert len(per_client) <= api._OIDC_STATES_PER_CLIENT

    def test_state_remains_single_use(self, spark, tmp_path):
        from parseable_spark.server import ParseableAPI

        api = ParseableAPI(spark, str(tmp_path))
        n = api.mint_oidc_state("/a", client="10.0.0.1")
        assert api.consume_oidc_state(n) == "/a"
        assert api.consume_oidc_state(n) is None
