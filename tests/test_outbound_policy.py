"""Outbound egress policy for alert targets (SSRF gate).

Reference behavior: src/alerts/outbound_http_policy.rs (validation
order, fail-closed multi-address DNS, builtin private ranges, header
screening) and src/handlers/http/alert_target_policy.rs (GET/PUT
surface). The resolver is injected — no live DNS in tests.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from parseable_spark.query.outbound_policy import (
    OutboundPolicyError,
    TargetPolicy,
    prepare_target,
    validate_policy,
)


def _resolver(mapping):
    return lambda host, port: mapping[host]


class TestValidatePolicy:
    def test_conflicting_cidrs_rejected(self):
        with pytest.raises(OutboundPolicyError, match="conflicting CIDRs"):
            validate_policy(
                TargetPolicy(
                    allowed_cidrs=["10.0.0.0/8"], denied_cidrs=["10.1.0.0/16"]
                )
            )

    def test_conflicting_domains_rejected_both_directions(self):
        for a, d in [("example.com", "sub.example.com"), ("sub.example.com", "example.com")]:
            with pytest.raises(OutboundPolicyError, match="conflicting domains"):
                validate_policy(
                    TargetPolicy(allowed_domains=[a], denied_domains=[d])
                )

    def test_invalid_cidr_rejected(self):
        with pytest.raises(OutboundPolicyError, match="invalid CIDR"):
            validate_policy(TargetPolicy(denied_cidrs=["not-a-cidr"]))

    def test_disjoint_policy_ok(self):
        validate_policy(
            TargetPolicy(
                allowed_domains=["a.com"], denied_domains=["b.com"],
                allowed_cidrs=["10.0.0.0/8"], denied_cidrs=["192.168.0.0/16"],
            )
        )


class TestPrepareTarget:
    def test_scheme_and_slack_rules(self):
        p = TargetPolicy()
        with pytest.raises(OutboundPolicyError, match="scheme"):
            prepare_target("ftp://x.com/a", "webhook", p)
        with pytest.raises(OutboundPolicyError, match="HTTPS"):
            prepare_target("http://hooks.slack.com/x", "slack", p)
        with pytest.raises(OutboundPolicyError, match="TLS"):
            prepare_target(
                "https://hooks.slack.com/x", "slack", p, skip_tls_check=True
            )
        with pytest.raises(OutboundPolicyError, match="[Ss]lack target host"):
            prepare_target(
                "https://evil.example.com/x", "slack", p,
                resolver=_resolver({"evil.example.com": ["8.8.8.8"]}),
            )

    def test_tls_downgrade_is_deployment_gated(self):
        res = _resolver({"h.example.com": ["8.8.8.8"]})
        with pytest.raises(OutboundPolicyError, match="TLS"):
            prepare_target(
                "https://h.example.com/", "webhook", TargetPolicy(),
                skip_tls_check=True, resolver=res,
            )
        out = prepare_target(
            "https://h.example.com/", "webhook",
            TargetPolicy(allow_invalid_tls=True), skip_tls_check=True, resolver=res,
        )
        assert out["addrs"] == ["8.8.8.8"]

    def test_denied_domain_wins_before_dns(self):
        def boom(host, port):
            raise AssertionError("resolver must not be called for denied domains")

        with pytest.raises(OutboundPolicyError, match="domain is denied"):
            prepare_target(
                "http://bad.example.com/", "webhook",
                TargetPolicy(denied_domains=["example.com"]), resolver=boom,
            )

    def test_multi_address_fail_closed(self):
        """One public + one private A record: reject (DNS rebinding)."""
        res = _resolver({"h.example.com": ["8.8.8.8", "10.0.0.5"]})
        with pytest.raises(OutboundPolicyError, match="Private target"):
            prepare_target("http://h.example.com/", "webhook", TargetPolicy(), resolver=res)

    def test_private_requires_allow_private_AND_allowlist(self):
        res = _resolver({"internal.corp": ["10.1.2.3"]})
        # allow_private alone is not enough
        with pytest.raises(OutboundPolicyError, match="Private target"):
            prepare_target(
                "http://internal.corp/", "webhook",
                TargetPolicy(allow_private=True), resolver=res,
            )
        # allowlist alone is not enough
        with pytest.raises(OutboundPolicyError, match="Private target"):
            prepare_target(
                "http://internal.corp/", "webhook",
                TargetPolicy(allowed_cidrs=["10.0.0.0/8"]), resolver=res,
            )
        # both: authorized, and Authorization headers unlock
        out = prepare_target(
            "http://internal.corp/", "webhook",
            TargetPolicy(allow_private=True, allowed_cidrs=["10.0.0.0/8"]),
            headers={"Authorization": "Bearer t"}, resolver=res,
        )
        assert out["authorization_allowed"]
        assert out["headers"] == {"Authorization": "Bearer t"}

    def test_denied_cidr_and_builtin_ranges(self):
        p = TargetPolicy(denied_cidrs=["203.0.113.0/24"])
        res = _resolver({"x.example.com": ["203.0.113.9"]})
        with pytest.raises(OutboundPolicyError, match="address is denied"):
            prepare_target("http://x.example.com/", "webhook", p, resolver=res)
        # builtin: loopback, link-local, CGNAT, reserved all denied
        for ip in ("127.0.0.1", "169.254.1.1", "100.64.0.1", "240.0.0.1", "0.1.2.3"):
            with pytest.raises(OutboundPolicyError, match="Private target"):
                prepare_target(f"http://{ip}/", "webhook", TargetPolicy())
        # plain public literal is fine
        out = prepare_target("http://8.8.8.8/", "webhook", TargetPolicy())
        assert out["addrs"] == ["8.8.8.8"]

    def test_header_screening(self):
        res = _resolver({"h.example.com": ["8.8.8.8"]})
        for name in ("Host", "Connection", "Proxy-Authorization", "Cookie",
                     "Transfer-Encoding"):
            with pytest.raises(OutboundPolicyError, match="denied header"):
                prepare_target(
                    "http://h.example.com/", "webhook", TargetPolicy(),
                    headers={name: "v"}, resolver=res,
                )
        # Authorization blocked for non-allowlisted destinations
        with pytest.raises(OutboundPolicyError, match="denied header"):
            prepare_target(
                "http://h.example.com/", "webhook", TargetPolicy(),
                headers={"authorization": "Bearer t"}, resolver=res,
            )
        with pytest.raises(OutboundPolicyError, match="invalid header value"):
            prepare_target(
                "http://h.example.com/", "webhook", TargetPolicy(),
                headers={"X-Ok": "a\r\nInjected: b"}, resolver=res,
            )
        out = prepare_target(
            "http://h.example.com/", "webhook", TargetPolicy(),
            headers={"X-Custom": "ok"}, resolver=res,
        )
        assert out["headers"] == {"X-Custom": "ok"}


def test_policy_http_surface_and_enforcement(spark, tmp_path):
    """E2e (alert_target_policy.rs + targets.rs): GET default → PUT
    invalid 400 → PUT valid → target creation now passes through the
    egress gate → policy survives a restart."""
    from parseable_spark.server import ParseableAPI, serve_background

    def req(method, base, path, body=None):
        data = None if body is None else json.dumps(body).encode()
        r = urllib.request.Request(
            base + path, data=data, method=method,
            headers={"Content-Type": "application/json"},
        )
        resp = urllib.request.urlopen(r, timeout=30)
        return json.loads(resp.read())

    api = ParseableAPI(spark, str(tmp_path))
    srv, base = serve_background(api)
    try:
        # default: permissive (no policy configured)
        out = req("GET", base, "/api/v1/alert-target-policy")
        assert out["allowPrivate"] is True

        # conflicting policy never becomes active
        with pytest.raises(urllib.error.HTTPError) as ei:
            req("PUT", base, "/api/v1/alert-target-policy",
                {"allowedDomains": ["a.com"], "deniedDomains": ["a.com"]})
        assert ei.value.code == 400
        assert api._target_policy is None

        # activate a deny policy; target creation is now gated
        put = req("PUT", base, "/api/v1/alert-target-policy",
                  {"deniedDomains": ["evil.example.com"]})
        assert put["deniedDomains"] == ["evil.example.com"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            req("POST", base, "/api/v1/targets",
                {"name": "t1", "type": "webhook",
                 "endpoint": "http://evil.example.com/hook"})
        assert ei.value.code == 400
        # loopback webhook now requires allowPrivate + allowlist
        with pytest.raises(urllib.error.HTTPError) as ei:
            req("POST", base, "/api/v1/targets",
                {"name": "t2", "type": "webhook", "endpoint": "http://127.0.0.1:9/h"})
        assert ei.value.code == 400
        req("PUT", base, "/api/v1/alert-target-policy",
            {"allowPrivate": True, "allowedCidrs": ["127.0.0.0/8"],
             "deniedDomains": ["evil.example.com"]})
        created = req("POST", base, "/api/v1/targets",
                      {"name": "t2", "type": "webhook",
                       "endpoint": "http://127.0.0.1:9/h"})
        assert created["name"] == "t2"
    finally:
        srv.shutdown()

    # restart: the policy is replayed from the persisted config
    api2 = ParseableAPI(spark, str(tmp_path))
    assert api2._target_policy is not None
    assert api2._target_policy.denied_domains == ["evil.example.com"]


def test_malformed_urls_rejected_not_crashed():
    """Review finding: out-of-range ports / broken IPv6 literals raise
    OutboundPolicyError (HTTP 400), never ValueError (HTTP 500)."""
    for url in ("http://example.com:99999/hook", "http://[::1", "http://[zz]/x"):
        with pytest.raises(OutboundPolicyError):
            prepare_target(url, "webhook", TargetPolicy(), resolver=lambda h, p: ["8.8.8.8"])


def test_non_dict_policy_body_rejected(spark, tmp_path):
    from parseable_spark.server import ParseableAPI, ApiError

    api = ParseableAPI(spark, str(tmp_path))
    for bad in ([], "oops", 5, None):
        with pytest.raises(ApiError) as ei:
            api.put_target_policy(bad)
        assert ei.value.status == 400
    assert api._target_policy is None  # nothing became active
