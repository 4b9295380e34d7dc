"""SSE broadcaster unit tests (reference src/sse/mod.rs).

The HTTP transport + alert integration is e2e-tested in
test_http_api.py::test_sse_alert_push_e2e; these cover the
broadcaster's fan-out semantics in isolation: the connected greeting,
session targeting, principal filtering, slow-consumer overflow skip,
and the Triggered-only gate of the alert target adapter.
"""

from __future__ import annotations

import json

from parseable_spark.sse import (
    SseAlertTarget,
    SseBroadcaster,
    alert_event,
    format_frame,
)


def _drain(client):
    out = []
    while not client.q.empty():
        out.append(client.q.get_nowait())
    return out


def test_register_greets_connected_and_lists_sessions():
    b = SseBroadcaster()
    c = b.register("sid-1", "alice")
    assert b.sessions() == ["sid-1"]
    assert _drain(c) == [("data", "connected")]
    b.unregister(c)
    assert b.sessions() == []


def test_broadcast_filters_by_principal_and_session():
    b = SseBroadcaster()
    ca = b.register("sid-a", "alice")
    cb = b.register("sid-b", "bob")
    _drain(ca), _drain(cb)
    # principal filter (per-session authorization gate)
    n = b.broadcast({"x": 1}, allow=lambda p: p == "alice")
    assert n == 1
    assert _drain(ca) == [("data", '{"x": 1}')]
    assert _drain(cb) == []
    # explicit session targeting (sse/mod.rs broadcast(sessions=Some))
    n = b.broadcast({"x": 2}, sessions=["sid-b"])
    assert n == 1 and _drain(cb) == [("data", '{"x": 2}')] and _drain(ca) == []


def test_slow_consumer_overflow_skips_not_blocks():
    b = SseBroadcaster()
    c = b.register("sid", "u")
    # fill the bounded queue; broadcast must neither block nor raise
    while True:
        try:
            c.q.put_nowait(("data", "fill"))
        except Exception:
            break
    assert b.broadcast({"dropped": True}) == 0  # skip-on-overflow
    b.ping()  # same discipline for pings
    assert c.q.full()


def test_alert_target_triggers_only_on_triggered():
    from parseable_spark.query.alerts import AlertState

    b = SseBroadcaster()
    c = b.register("sid", "u")
    _drain(c)
    t = SseAlertTarget(b, "aid-1", "max(v) on s", allow=None)
    t.notify(None, AlertState.NOT_TRIGGERED, 1.0)
    assert _drain(c) == []
    t.notify(None, AlertState.TRIGGERED, 99.0)
    frames = _drain(c)
    assert len(frames) == 1
    evt = json.loads(frames[0][1])
    assert evt == alert_event("aid-1", "triggered", "max(v) on s")


def test_wire_frames():
    assert format_frame("data", "hello") == b"data: hello\n\n"
    assert format_frame("comment", "ping") == b": ping\n\n"


def test_replayed_alert_sse_target_carries_persisted_id(spark, tmp_path):
    """Code-review regression: after a server restart, the replayed
    alert's SSE target must broadcast the PERSISTED alert id, not the
    throwaway uuid minted during config replay."""
    from parseable_spark.server import ParseableAPI
    from parseable_spark.sse import SseAlertTarget

    api = ParseableAPI(spark, str(tmp_path))
    api.ingest("s1", [{"v": 1}])
    api._stores["s1"].flush()
    aid = api.create_alert(
        {"stream": "s1", "aggregate": "max", "aggregateColumn": "v",
         "operator": ">", "threshold": 100}
    )["id"]
    api2 = ParseableAPI(spark, str(tmp_path))
    targets = [
        t for t in api2._alerts[aid].targets if isinstance(t, SseAlertTarget)
    ]
    assert len(targets) == 1 and targets[0].alert_id == aid


def test_null_stratum_rows_respect_their_rate(spark):
    """Code-review regression: a None stratum key must match NULL
    column values (== NULL is never true and silently dropped them)."""
    from pyspark.sql import functions as F

    from parseable_spark.llm.sampling import hash_sample, mixture_sample

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").alias("domain"),  # half NULL
    )
    out = hash_sample(
        df, strata_col="domain", strata_rates={None: 1.0, "web": 1.0}
    )
    assert out.count() == 400  # NULL rows kept at rate 1.0
    # and through the mixture path: T=1 keeps every nonzero domain
    mixed = mixture_sample(df, "domain", temperature=1.0)
    assert mixed.filter(F.col("domain").isNull()).count() == 200


def test_tenant_scoped_alert_carries_tenant_id():
    """Review finding (r5): SseAlertTarget never passed the alert's
    tenant, so tenant-scoped alerts broadcast tenantId: null."""
    import json

    from parseable_spark.sse import SseAlertTarget, SseBroadcaster

    frames = []
    bc = SseBroadcaster()
    bc.broadcast = lambda payload, allow=None: frames.append(payload)

    class _S:  # alert state stand-in
        value = "triggered"

    SseAlertTarget(bc, "a1", "high cpu", tenant="acme").notify(None, _S(), 9.0)
    SseAlertTarget(bc, "a2", "default alert").notify(None, _S(), 1.0)
    acme = json.loads(frames[0]) if isinstance(frames[0], str) else frames[0]
    dflt = json.loads(frames[1]) if isinstance(frames[1], str) else frames[1]
    assert acme["tenantId"] == "acme"
    assert dflt["tenantId"] is None
