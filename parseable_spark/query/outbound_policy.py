"""Outbound egress policy for alert targets (SSRF protection).

Behavioral parity with the reference's outbound HTTP policy
(src/alerts/outbound_http_policy.rs) and its admin surface
(src/handlers/http/alert_target_policy.rs — GET/PUT
/api/v1/alert-target-policy):

- policy = allow/deny domain lists + allow/deny CIDR lists +
  allow_private + allow_invalid_tls (camelCase on the wire)
- validation rejects conflicting allow/deny entries BEFORE a bad
  policy becomes active (validate_policy, :80-94)
- every target dispatch enters through `prepare_target`
  (prepare_alert_target, :260-297): scheme check (Slack is
  HTTPS-only), TLS downgrade gate, denied domains before DNS, Slack
  host pinning, resolve, fail-closed multi-address validation
  (denied CIDRs, then builtin private/reserved ranges unless
  allow_private AND an operator allowlist match), header screening
  (routing/proxy/credential headers blocked; Authorization only for
  allowlisted destinations).

Pure stdlib (ipaddress + socket); the resolver is injectable so tests
never do live DNS.
"""

from __future__ import annotations

import ipaddress
import socket
from dataclasses import dataclass, field
from typing import Any, Callable


class OutboundPolicyError(Exception):
    """Raised with a sanitized, user-safe message (the reference keeps
    raw details out of API responses, :231-257)."""


_SLACK_HOSTS = {"hooks.slack.com", "hooks.slack-gov.com"}
_ALWAYS_DENIED_HEADERS = {
    "host",
    "content-length",
    "transfer-encoding",
    "connection",
    "upgrade",
    "proxy-authorization",
    "proxy-authenticate",
    "cookie",
}


@dataclass
class TargetPolicy:
    allow_private: bool = False
    allowed_domains: list[str] = field(default_factory=list)
    allowed_cidrs: list[str] = field(default_factory=list)
    denied_domains: list[str] = field(default_factory=list)
    denied_cidrs: list[str] = field(default_factory=list)
    allow_invalid_tls: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TargetPolicy":
        return cls(
            allow_private=bool(d.get("allowPrivate", False)),
            allowed_domains=list(d.get("allowedDomains", [])),
            allowed_cidrs=list(d.get("allowedCidrs", [])),
            denied_domains=list(d.get("deniedDomains", [])),
            denied_cidrs=list(d.get("deniedCidrs", [])),
            allow_invalid_tls=bool(d.get("allowInvalidTls", False)),
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "allowPrivate": self.allow_private,
            "allowedDomains": self.allowed_domains,
            "allowedCidrs": self.allowed_cidrs,
            "deniedDomains": self.denied_domains,
            "deniedCidrs": self.denied_cidrs,
            "allowInvalidTls": self.allow_invalid_tls,
        }


def _parse_cidrs(values: list[str]) -> list[ipaddress._BaseNetwork]:
    nets = []
    for v in values:
        try:
            nets.append(ipaddress.ip_network(v, strict=False))
        except ValueError:
            raise OutboundPolicyError(
                "Outbound policy contains an invalid CIDR"
            ) from None
    return nets


def _normalize_domain(domain: str) -> str:
    return domain.rstrip(".").lower()


def _domains_overlap(a: str, b: str) -> bool:
    a, b = _normalize_domain(a), _normalize_domain(b)
    return a == b or a.endswith("." + b) or b.endswith("." + a)


def _matches_domain_list(host: str, domains: list[str]) -> bool:
    """Domain entries match the exact host and its subdomains."""
    host = _normalize_domain(host)
    return any(
        host == (d := _normalize_domain(dom)) or host.endswith("." + d)
        for dom in domains
    )


def validate_policy(policy: TargetPolicy) -> None:
    """Reject a policy whose allow and deny lists conflict — a bad
    policy must never become active (validate_policy, :80-94)."""
    allowed = _parse_cidrs(policy.allowed_cidrs)
    denied = _parse_cidrs(policy.denied_cidrs)
    for a in allowed:
        for d in denied:
            if a.version == d.version and a.overlaps(d):
                raise OutboundPolicyError(
                    "Outbound policy contains conflicting CIDRs"
                )
    for a in policy.allowed_domains:
        if any(_domains_overlap(a, d) for d in policy.denied_domains):
            raise OutboundPolicyError(
                "Outbound policy contains conflicting domains"
            )


def _builtin_denied_ip(ip: ipaddress.IPv4Address | ipaddress.IPv6Address) -> bool:
    """Private, loopback, link-local, multicast, carrier NAT, reserved —
    the SSRF-relevant ranges (denied_ipv4/denied_ipv6, :438-477)."""
    if isinstance(ip, ipaddress.IPv6Address):
        mapped = ip.ipv4_mapped
        if mapped is not None:
            return _builtin_denied_ip(mapped)
        return (
            ip.is_loopback
            or ip.is_link_local
            or ip.is_private  # includes unique-local fc00::/7
            or ip.is_multicast
            or ip.is_unspecified
            or ip.is_reserved
        )
    o = int(ip) >> 24
    return (
        ip.is_unspecified
        or ip.is_loopback
        or ip.is_private
        or ip.is_link_local
        or ip.is_multicast
        or o == 0
        or (o == 100 and 64 <= (int(ip) >> 16) % 256 <= 127)  # CGNAT 100.64/10
        or o >= 240
    )


def _default_resolver(host: str, port: int) -> list[str]:
    infos = socket.getaddrinfo(host, port, proto=socket.IPPROTO_TCP)
    return [info[4][0] for info in infos]


def prepare_target(
    url: str,
    kind: str,
    policy: TargetPolicy,
    skip_tls_check: bool = False,
    headers: dict[str, str] | None = None,
    resolver: Callable[[str, int], list[str]] | None = None,
) -> dict[str, Any]:
    """Authorize an alert-target destination; returns {'addrs': [...],
    'headers': {...}, 'authorization_allowed': bool} or raises
    OutboundPolicyError. Mirrors prepare_alert_target's order exactly:
    scheme → TLS gate → denied domains → Slack pinning → resolve →
    denied CIDRs → builtin private ranges → headers."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url)
        host = parts.hostname
        port = parts.port
    except ValueError:  # malformed IPv6 literal, out-of-range port, ...
        raise OutboundPolicyError("Target URL is malformed") from None
    scheme = parts.scheme.lower()
    kind = kind.lower()
    if kind == "slack":
        if scheme != "https":
            raise OutboundPolicyError("Slack target requires HTTPS")
        if skip_tls_check:
            raise OutboundPolicyError("TLS verification cannot be disabled")
    elif scheme not in ("http", "https"):
        raise OutboundPolicyError("Target URL scheme is unsupported")
    if skip_tls_check and not policy.allow_invalid_tls:
        raise OutboundPolicyError("TLS verification cannot be disabled")

    if not host:
        raise OutboundPolicyError("Target URL is missing a host")
    # denied domains win before DNS resolution (no needless egress)
    if _matches_domain_list(host, policy.denied_domains):
        raise OutboundPolicyError("Target domain is denied by outbound policy")
    if kind == "slack" and host not in _SLACK_HOSTS:
        raise OutboundPolicyError("Slack target host is invalid")

    port = port or (443 if scheme == "https" else 80)
    try:
        ip = ipaddress.ip_address(host)
        addrs = [str(ip)]
    except ValueError:
        try:
            addrs = (resolver or _default_resolver)(host, port)
        except OSError:
            raise OutboundPolicyError(
                "Target host could not be resolved"
            ) from None
        if not addrs:
            raise OutboundPolicyError("Target host resolved to no addresses")

    allowed_cidrs = _parse_cidrs(policy.allowed_cidrs)
    denied_cidrs = _parse_cidrs(policy.denied_cidrs)
    ips = [ipaddress.ip_address(a) for a in addrs]
    # operator allowlist: domain match OR any resolved address in an
    # allowed CIDR — gates both private targets and Authorization
    allowlisted = _matches_domain_list(host, policy.allowed_domains) or any(
        ip.version == net.version and ip in net
        for ip in ips
        for net in allowed_cidrs
    )
    # fail closed over EVERY resolved address (multi-A-record DNS)
    for ip in ips:
        if any(ip.version == net.version and ip in net for net in denied_cidrs):
            raise OutboundPolicyError(
                "Target address is denied by outbound policy"
            )
        if _builtin_denied_ip(ip) and not (policy.allow_private and allowlisted):
            raise OutboundPolicyError(
                "Private target is not allowed by outbound policy"
            )

    out_headers: dict[str, str] = {}
    for name, value in (headers or {}).items():
        low = name.lower()
        if low in _ALWAYS_DENIED_HEADERS or (
            low == "authorization" and not allowlisted
        ):
            raise OutboundPolicyError("Target contains a denied header")
        if not name.isascii() or any(c in name for c in " \r\n:"):
            raise OutboundPolicyError("Target contains an invalid header name")
        if not value.isascii() or any(c in value for c in "\r\n"):
            raise OutboundPolicyError("Target contains an invalid header value")
        out_headers[name] = value
    return {
        "addrs": addrs,
        "headers": out_headers,
        "authorization_allowed": allowlisted,
    }
