"""Round-5 server.py review hardening: streaming-lock leak, header
injection, read-side RBAC gates, x-p-tenant field pollution, /about
auth, chunked-TE rejection, replay resilience.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from parseable_spark.server import ParseableAPI, serve_background

ADMIN = ("admin", "admin")


def _basic(u, p):
    import base64

    return {"Authorization": "Basic " + base64.b64encode(f"{u}:{p}".encode()).decode()}


def _req(method, url, body=None, headers=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    api = ParseableAPI(
        spark, str(tmp_path_factory.mktemp("hard_store")), auth=ADMIN
    )
    srv, base = serve_background(api)
    yield api, base
    srv.shutdown()


def test_streaming_lock_released_when_iteration_never_starts(served):
    """A transport failure before the first chunk must still release
    the API lock (closing an unstarted generator skips its finally)."""
    api, base = served
    api.ingest("locks", [{"n": 1}])
    from datetime import datetime, timedelta

    lo = (datetime.utcnow() - timedelta(days=1)).isoformat() + "Z"
    hi = (datetime.utcnow() + timedelta(days=1)).isoformat() + "Z"
    lines = api.query_ndjson(
        {"query": "select * from locks", "startTime": lo, "endTime": hi}
    )
    # simulate the handler dying before iteration starts
    lines.close()
    # the lock must be free: this acquire would deadlock otherwise
    assert api._lock.acquire(timeout=5)
    api._lock.release()
    # and a normal drained stream also releases exactly once
    lines2 = api.query_ndjson(
        {"query": "select * from locks", "startTime": lo, "endTime": hi}
    )
    list(lines2)
    lines2.close()  # idempotent
    assert api._lock.acquire(timeout=5)
    api._lock.release()


def test_redirect_rejects_crlf_injection(served):
    api, base = served
    st, out = _req(
        "GET", base + "/api/v1/o/login?redirect=/x%0d%0aSet-Cookie:%20p=1"
    )
    assert st == 400


def test_read_side_routes_require_manage(served):
    """GET alerts/targets/filters/correlation must gate like their
    mutating counterparts; a zero-grant user gets 403."""
    api, base = served
    adm = _basic(*ADMIN)
    st, out = _req(
        "POST", base + "/api/v1/user/nobody", {"grants": []}, adm
    )
    assert st == 200, out
    creds = _basic("nobody", out["password"])
    for route in ("alerts", "targets", "filters", "correlation"):
        st, _ = _req("GET", f"{base}/api/v1/{route}", None, creds)
        assert st == 403, route
        st, _ = _req("GET", f"{base}/api/v1/{route}", None, adm)
        assert st == 200, route


def test_stream_metadata_routes_gate_per_stream(served):
    """Schema/stats/info need QUERY on the stream; the stream list is
    filtered to what the principal may see."""
    api, base = served
    adm = _basic(*ADMIN)
    api.ingest("meta_a", [{"x": 1}])
    api.ingest("meta_b", [{"x": 1}])
    st, out = _req(
        "POST",
        base + "/api/v1/user/reader_a",
        {"grants": [{"privilege": "reader", "stream": "meta_a"}]},
        adm,
    )
    assert st == 200, out
    creds = _basic("reader_a", out["password"])
    st, schema = _req("GET", base + "/api/v1/logstream/meta_a/schema", None, creds)
    assert st == 200
    st, _ = _req("GET", base + "/api/v1/logstream/meta_b/schema", None, creds)
    assert st == 403
    st, _ = _req("GET", base + "/api/v1/logstream/meta_b/stats", None, creds)
    assert st == 403
    st, _ = _req("GET", base + "/api/v1/logstream/meta_b/info", None, creds)
    assert st == 403
    st, listed = _req("GET", base + "/api/v1/logstream", None, creds)
    assert st == 200
    names = {s["name"] for s in listed}
    assert "meta_a" in names and "meta_b" not in names


def test_about_requires_auth(served):
    api, base = served
    st, _ = _req("GET", base + "/api/v1/about")
    assert st == 401
    st, about = _req("GET", base + "/api/v1/about", None, _basic(*ADMIN))
    assert st == 200 and about["engine"] == "parseable-spark"


def test_chunked_transfer_encoding_rejected(served):
    """A chunked request body is never decoded; it must be rejected
    (411), not silently treated as empty with its bytes left to desync
    the keep-alive connection."""
    import http.client
    from urllib.parse import urlparse

    api, base = served
    u = urlparse(base)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=10)
    conn.putrequest("POST", "/api/v1/ingest")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("x-p-stream", "chunky")
    for k, v in _basic(*ADMIN).items():
        conn.putheader(k, v)
    conn.endheaders()
    conn.send(b"5\r\n[{}]x\r\n0\r\n\r\n")
    resp = conn.getresponse()
    assert resp.status == 411
    conn.close()


def test_tenant_header_not_a_custom_field(spark, tmp_path):
    """x-p-tenant is routing metadata: multi-tenant ingest must not grow
    a 'tenant' column on every record."""
    from parseable_spark.tenants import TenantManager

    api = ParseableAPI(spark, str(tmp_path), auth=ADMIN)
    mgr = TenantManager(api, multi_tenant=True)
    srv, base = serve_background(api, tenants=mgr)
    try:
        adm = _basic(*ADMIN)
        st, _ = _req("PUT", base + "/api/v1/tenants/thdr", {}, adm)
        assert st == 200
        st, out = _req(
            "POST",
            base + "/api/v1/ingest",
            [{"msg": "hello"}],
            {**adm, "x-p-tenant": "thdr", "x-p-stream": "tlogs"},
        )
        assert st == 200, out
        t_api = mgr.api_for("thdr")
        fields = t_api._stores["tlogs"].stream.registry.fields
        assert "tenant" not in fields, fields
        mgr.delete_tenant("thdr")
    finally:
        srv.shutdown()
