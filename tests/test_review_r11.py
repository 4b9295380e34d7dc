"""Round-11 review pass (judge r10 next-6): tenants/sse/oidc/gcs/
azureblob seams. Findings fixed and pinned here:

1. None of the native object-store clients retried transient failures
   — the reference's object_store crate retries 5xx/429/connection
   errors with backoff by default, and at scale a flush uploads
   thousands of objects (one transient 503 failed the whole sync).
   storage/net.with_retries now wraps all three clients' _request.
2. GCS: a server-side-revoked bearer token poisoned the cache until
   local expiry (every op 401s for up to an hour). One re-mint retry
   on 401 now.
3. OIDC: response bodies from the external IdP were read unbounded
   into driver memory; now capped at 1 MiB (fail-closed via JSON
   parse error).

tenants.py and sse.py: clean pass — locking discipline, resurrection
guards, fail-closed authz filters all already pinned by r7/r8 tests.
"""

from __future__ import annotations

import urllib.error

import pytest

from parseable_spark.storage.net import with_retries


class _Flaky:
    def __init__(self, fail_statuses=(), fail_excs=(), then=(200, b"ok")):
        self.calls = 0
        self.fail_statuses = list(fail_statuses)
        self.fail_excs = list(fail_excs)
        self.then = then

    def __call__(self):
        self.calls += 1
        if self.fail_excs:
            raise self.fail_excs.pop(0)
        if self.fail_statuses:
            return (self.fail_statuses.pop(0), b"transient")
        return self.then


class TestWithRetries:
    def test_transient_statuses_retry_then_succeed(self, monkeypatch):
        import parseable_spark.storage.net as net

        monkeypatch.setattr(net.time, "sleep", lambda s: None)
        f = _Flaky(fail_statuses=[503, 429])
        assert with_retries(f) == (200, b"ok")
        assert f.calls == 3

    def test_non_retryable_status_returns_immediately(self):
        f = _Flaky(then=(403, b"denied"))
        assert with_retries(f) == (403, b"denied")
        assert f.calls == 1

    def test_connection_errors_retry_then_raise(self, monkeypatch):
        import parseable_spark.storage.net as net

        monkeypatch.setattr(net.time, "sleep", lambda s: None)
        f = _Flaky(
            fail_excs=[ConnectionResetError()] * 4
        )
        with pytest.raises(ConnectionResetError):
            with_retries(f, attempts=4)
        assert f.calls == 4

    def test_retryable_status_on_final_attempt_is_returned(self, monkeypatch):
        import parseable_spark.storage.net as net

        monkeypatch.setattr(net.time, "sleep", lambda s: None)
        f = _Flaky(fail_statuses=[503, 503, 503, 503])
        # callers keep their own status→error mapping
        assert with_retries(f, attempts=4) == (503, b"transient")

    def test_connection_error_then_success(self, monkeypatch):
        import parseable_spark.storage.net as net

        monkeypatch.setattr(net.time, "sleep", lambda s: None)
        f = _Flaky(fail_excs=[urllib.error.URLError("reset")])
        assert with_retries(f) == (200, b"ok")

    def test_escaped_httperror_propagates_unretried(self):
        calls = {"n": 0}

        def attempt():
            calls["n"] += 1
            raise urllib.error.HTTPError("u", 403, "forbidden", {}, None)

        with pytest.raises(urllib.error.HTTPError):
            with_retries(attempt)
        assert calls["n"] == 1  # a 403 must never loop


class TestGCSTokenReauth:
    def test_revoked_token_reminted_once(self, tmp_path):
        crypto = pytest.importorskip("cryptography")  # noqa: F841
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.hazmat.primitives import serialization

        from parseable_spark.storage.gcs import (
            GCSClient,
            GCSConfig,
            MiniGCSServer,
            ServiceAccountCredentials,
        )

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        priv = key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
        pub = key.public_key().public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        with MiniGCSServer("svc@test", pub) as srv:
            creds = ServiceAccountCredentials(
                {
                    "type": "service_account",
                    "client_email": "svc@test",
                    "private_key": priv.decode(),
                    "token_uri": srv.token_uri,
                }
            )
            client = GCSClient(GCSConfig(bucket="b", credentials=creds,
                                         endpoint_url=srv.endpoint))
            client.put_object("k1", b"v1")
            assert client.get_object("k1") == b"v1"
            # server-side revocation: the cached token is now invalid
            # but far from its local expiry — pre-fix this 401'd every
            # operation for up to an hour
            srv.tokens.clear()
            assert client.get_object("k1") == b"v1"
            client.put_object("k2", b"v2")
            assert client.get_object("k2") == b"v2"


class TestOidcResponseCap:
    def test_oversize_idp_response_fails_closed(self, monkeypatch):
        import io

        from parseable_spark import oidc

        class _Resp(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        huge = b'{"pad": "' + b"x" * (2 << 20) + b'"}'
        monkeypatch.setattr(
            oidc.urllib.request,
            "urlopen",
            lambda *a, **k: _Resp(huge),
        )
        client = oidc.DiscoveredClient(
            oidc.OpenidConfig(
                client_id="c", client_secret="s",
                issuer="http://idp.invalid", origin="http://me",
            )
        )
        with pytest.raises(ValueError):  # truncated JSON fails closed
            client._discover()
