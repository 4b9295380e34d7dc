"""OpenID Connect login — discovery, code exchange, userinfo.

Reference: src/oidc.rs:1-84 (OpenidConfig/DiscoveredClient over the
`openid` crate) and src/handlers/http/oidc.rs (login redirect, code
callback, logout, group→role resolution, session cookies). This module
is the client half: standard OIDC discovery
(/.well-known/openid-configuration), authorization-code exchange at the
token endpoint (client_secret_post), and userinfo retrieval with the
bearer token. The HTTP routes and session registry live in server.py.

Pure stdlib (urllib) — works against any spec-compliant provider; the
test suite runs it against an in-process fake provider.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any

# responses come from an EXTERNAL identity provider and are parsed on
# the driver: cap the bytes read so a misconfigured/hostile endpoint
# cannot balloon driver memory — real discovery/token/userinfo bodies
# are a few KB (r11 review). A truncated over-cap body fails JSON
# parsing, which is the right fail-closed outcome.
_MAX_RESPONSE_BYTES = 1 << 20


@dataclass
class OpenidConfig:
    """Mirror of reference OpenidConfig (oidc.rs:36-47)."""

    client_id: str
    client_secret: str
    issuer: str  # OP host; discovery happens under it
    origin: str  # this server's externally visible base URL
    scope: str = "openid profile email"
    redirect_suffix: str = "api/v1/o/code"  # reference redirect path

    @property
    def redirect_uri(self) -> str:
        return f"{self.origin.rstrip('/')}/{self.redirect_suffix}"


@dataclass
class DiscoveredClient:
    """Lazy discovery + token/userinfo plumbing (oidc.rs:49-68)."""

    config: OpenidConfig
    _doc: dict[str, Any] | None = field(default=None, repr=False)

    def _discover(self) -> dict[str, Any]:
        if self._doc is None:
            url = (
                self.config.issuer.rstrip("/")
                + "/.well-known/openid-configuration"
            )
            with urllib.request.urlopen(url, timeout=10) as r:
                self._doc = json.loads(r.read(_MAX_RESPONSE_BYTES))
        return self._doc

    def auth_url(self, state: str) -> str:
        """Authorization-endpoint redirect target; `state` carries the
        post-login client redirect (handlers/http/oidc.rs:95-101)."""
        doc = self._discover()
        params = urllib.parse.urlencode(
            {
                "response_type": "code",
                "client_id": self.config.client_id,
                "redirect_uri": self.config.redirect_uri,
                "scope": self.config.scope,
                "state": state,
                # reference appends these for refresh-token issuance
                "access_type": "offline",
                "prompt": "consent",
            }
        )
        # some IdPs publish an authorization_endpoint that already has
        # a query string (Azure AD B2C's `?p=<policy>`) — joining with
        # a second '?' would fold our params into theirs (review
        # finding)
        ep = doc["authorization_endpoint"]
        sep = "&" if "?" in ep else "?"
        return f"{ep}{sep}{params}"

    def exchange_code(self, code: str) -> dict[str, Any]:
        """Authorization-code → token response (client_secret_post)."""
        doc = self._discover()
        data = urllib.parse.urlencode(
            {
                "grant_type": "authorization_code",
                "code": code,
                "redirect_uri": self.config.redirect_uri,
                "client_id": self.config.client_id,
                "client_secret": self.config.client_secret,
            }
        ).encode()
        req = urllib.request.Request(
            doc["token_endpoint"],
            data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read(_MAX_RESPONSE_BYTES))

    def userinfo(self, access_token: str) -> dict[str, Any]:
        doc = self._discover()
        req = urllib.request.Request(
            doc["userinfo_endpoint"],
            headers={"Authorization": f"Bearer {access_token}"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read(_MAX_RESPONSE_BYTES))

    def logout_url(self) -> str | None:
        return self._discover().get("end_session_endpoint")


def extract_identity(userinfo: dict[str, Any]) -> tuple[str, str]:
    """(username, user_id) from userinfo claims — name, falling back to
    email then sub; sub is mandatory (oidc.rs extract_identity)."""
    sub = userinfo.get("sub")
    if not sub:
        raise ValueError("OAuth provider did not return a sub")
    username = userinfo.get("name") or userinfo.get("email") or sub
    return str(username), str(sub)
