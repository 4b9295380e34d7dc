"""Kinesis envelope, Kafka envelope parse, stream stats, RBAC/tenancy.

Models the reference's own unit coverage of these layers (kinesis.rs
doc-tested format, stats.rs counters, rbac/role.rs privilege
expansion)."""

from __future__ import annotations

import base64
import json
from datetime import datetime

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from parseable_spark.ingest.kinesis import KinesisError, flatten_kinesis_logs
from parseable_spark.rbac import AccessDenied, Action, Grant, Rbac, tenant_view_name
from parseable_spark.storage.stats import FullStats
from parseable_spark.streaming.kafka import parse_kafka_envelope


def _b64(obj) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


class TestKinesis:
    def test_flatten_envelope(self):
        msg = {
            "requestId": "9b848d8a",
            "timestamp": 1705026780451,
            "records": [
                {"data": _b64({"TICKER": "DEG", "PRICE": 5.36})},
                {"data": _b64({"TICKER": "WMT", "PRICE": 73.76})},
            ],
        }
        out = flatten_kinesis_logs(msg)
        assert [r["TICKER"] for r in out] == ["DEG", "WMT"]
        # envelope fields stamped on every event; timestamp stringified
        assert all(r["requestId"] == "9b848d8a" for r in out)
        assert all(r["timestamp"] == "1705026780451" for r in out)

    def test_array_field_explodes(self):
        # generic_flattening cartesian explode (kinesis.rs:76-89)
        msg = {
            "requestId": "r",
            "timestamp": 1,
            "records": [{"data": _b64({"k": [{"a": 1}, {"a": 2}], "x": "y"})}],
        }
        out = flatten_kinesis_logs(msg)
        # one event per array element; dotted-key flattening happens
        # later in the shared ingest path (flatten_json_body)
        assert len(out) == 2 and [r["k"] for r in out] == [{"a": 1}, {"a": 2}]
        assert all(r["x"] == "y" for r in out)

    def test_deep_nesting_passthrough(self):
        deep = {"a": {"b": {"c": {"d": {"e": 1}}}}}
        msg = {"requestId": "r", "timestamp": 1, "records": [{"data": _b64(deep)}]}
        out = flatten_kinesis_logs(msg)
        assert out == [deep]  # kept as-is, no envelope stamp (kinesis.rs:90-100)

    def test_bad_base64_raises(self):
        msg = {"requestId": "r", "timestamp": 1, "records": [{"data": "!!notb64!!"}]}
        with pytest.raises(KinesisError):
            flatten_kinesis_logs(msg)


KAFKA_WIRE = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("topic", StringType()),
        StructField("partition", LongType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampNTZType()),
    ]
)

EVENT_SCHEMA = StructType(
    [
        StructField("p_timestamp", TimestampNTZType()),
        StructField("status", StringType()),
        StructField("latency_ms", DoubleType()),
    ]
)


class TestKafkaEnvelope:
    def test_parse_typed_columns(self, spark):
        kafka_ts = datetime(2026, 8, 13, 12, 0, 0)
        rows = [
            (None, json.dumps({"p_timestamp": "2026-08-13T11:59:00", "status": "ok", "latency_ms": 5.0}), "logs", 0, 10, kafka_ts),
            (None, json.dumps({"status": "error", "latency_ms": 9.0}), "logs", 1, 11, kafka_ts),
        ]
        df = spark.createDataFrame(rows, KAFKA_WIRE)
        out = parse_kafka_envelope(df, EVENT_SCHEMA).collect()
        byoff = {r["p_kafka_offset"]: r for r in out}
        assert byoff[10]["status"] == "ok"
        assert byoff[10]["p_timestamp"] == datetime(2026, 8, 13, 11, 59, 0)
        # missing payload timestamp falls back to the Kafka ingest time
        assert byoff[11]["p_timestamp"] == kafka_ts
        assert byoff[11]["p_kafka_topic"] == "logs" and byoff[11]["p_kafka_partition"] == 1


class TestStats:
    def test_ledgers(self, tmp_path):
        s = FullStats()
        s.record_ingest(100, 5000, 2000)
        s.record_ingest(50, 2500, 1000)
        s.record_deletion(30, 1500, 600)
        assert s.lifetime.events == 150 and s.current.events == 120
        assert s.deleted.ingestion == 1500
        # current + deleted == lifetime invariant
        assert s.current.storage + s.deleted.storage == s.lifetime.storage
        p = str(tmp_path / "stats.json")
        s.save(p)
        assert FullStats.load(p) == s

    def test_store_integration(self, spark, tmp_path):
        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.storage.store import StreamStore

        store = StreamStore(spark, str(tmp_path), StreamConfig(name="s1"))
        store.ingest([{"status": "ok"}, {"status": "err"}], p_timestamp=datetime(2026, 8, 1))
        store.flush()
        assert store.stats.current.events == 2
        assert store.stats.current.storage > 0 and store.stats.current.ingestion > 0
        removed = store.apply_retention(days=7, now=datetime(2026, 8, 13))
        assert removed == 1
        assert store.stats.current.events == 0
        assert store.stats.lifetime.events == 2
        assert store.stats.deleted.storage == store.stats.lifetime.storage
        # counters survive reopen (persisted like the reference stream.json)
        store2 = StreamStore(spark, str(tmp_path), StreamConfig(name="s1"))
        assert store2.stats.lifetime.events == 2


class TestRbac:
    def test_privilege_expansion(self):
        rbac = Rbac()
        rbac.add_user("alice", [Grant("reader", stream="app_logs")])
        rbac.add_user("bob", [Grant("admin")])
        rbac.authorize("alice", Action.QUERY, "app_logs")
        with pytest.raises(AccessDenied):
            rbac.authorize("alice", Action.QUERY, "other_stream")
        with pytest.raises(AccessDenied):
            rbac.authorize("alice", Action.INGEST, "app_logs")
        rbac.authorize("bob", Action.DELETE_STREAM, "anything")

    def test_tenant_isolation(self):
        rbac = Rbac()
        rbac.add_user("t1_admin", [Grant("admin", tenant="t1")])
        rbac.authorize("t1_admin", Action.QUERY, "s", tenant="t1")
        with pytest.raises(AccessDenied):
            rbac.authorize("t1_admin", Action.QUERY, "s", tenant="t2")
        with pytest.raises(AccessDenied):
            rbac.authorize("nobody", Action.QUERY, "s")

    def test_authorized_streams_filter(self):
        rbac = Rbac()
        rbac.add_user("u", [Grant("reader", stream="a"), Grant("ingestor", stream="b")])
        assert rbac.authorized_streams("u", ["a", "b", "c"]) == ["a"]

    def test_tenant_view_name(self):
        assert tenant_view_name("default", "logs") == "logs"
        assert tenant_view_name("acme-corp", "logs") == "_t_acme_1corp__logs"
        # injective: tenants that collided under the lossy '-'→'_' map
        # now get distinct views, and no tenant view can collide with a
        # default-tenant stream (those must start alphanumeric)
        assert tenant_view_name("acme_corp", "logs") != tenant_view_name(
            "acme-corp", "logs"
        )
        assert not tenant_view_name("acme", "logs")[0].isalnum()


class TestRetentionConfig:
    def test_parse_valid(self):
        from parseable_spark.storage.retention import parse_retention_config

        tasks = parse_retention_config(
            [{"description": "drop old", "action": "delete", "duration": "30d"}]
        )
        assert tasks[0].days == 30 and tasks[0].action == "delete"

    def test_validation_rules(self):
        import pytest as _pytest

        from parseable_spark.storage.retention import (
            RetentionConfigError,
            parse_retention_config,
        )

        with _pytest.raises(RetentionConfigError, match="'d' suffix"):
            parse_retention_config([{"duration": "30"}])
        with _pytest.raises(RetentionConfigError, match="unsigned"):
            parse_retention_config([{"duration": "xd"}])
        with _pytest.raises(RetentionConfigError, match="36500"):
            parse_retention_config([{"duration": "99999d"}])
        with _pytest.raises(RetentionConfigError, match="duplicate"):
            parse_retention_config([{"duration": "5d"}, {"duration": "6d"}])
        # 0 days falls back to 7 (reference Task::new)
        assert parse_retention_config([{"duration": "0d"}])[0].days == 7

    def test_apply_tasks(self, spark, tmp_path):
        from datetime import datetime

        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.storage.retention import (
            apply_retention_tasks,
            parse_retention_config,
        )
        from parseable_spark.storage.store import StreamStore

        store = StreamStore(spark, str(tmp_path), StreamConfig(name="s"))
        store.ingest([{"a": 1.0}], p_timestamp=datetime(2026, 8, 1))
        store.flush()
        tasks = parse_retention_config([{"duration": "3d"}])
        assert apply_retention_tasks(store, tasks, now=datetime(2026, 8, 10)) == 1
        assert store.count_fast_path() == 0


def test_kinesis_http_dispatch(spark, tmp_path):
    """r6 review: the Kinesis decoder was dead code — nothing routed
    x-p-log-source: kinesis to it, so Firehose deliveries ingested as
    one raw envelope with base64-opaque data. Now dispatched on the
    header (reference ingest_utils.rs:209-225); malformed envelopes
    are a 400, not a 500."""
    import base64 as _b64
    import json as _json
    import urllib.error
    import urllib.request

    from parseable_spark.server import ParseableAPI, serve_background

    api = ParseableAPI(spark, str(tmp_path / "store"))
    srv, base = serve_background(api)
    try:
        def post(body, expect_error=False):
            req = urllib.request.Request(
                base + "/api/v1/ingest",
                data=_json.dumps(body).encode(),
                headers={
                    "Content-Type": "application/json",
                    "x-p-stream": "firehose",
                    "x-p-log-source": "kinesis",
                },
            )
            return urllib.request.urlopen(req, timeout=30)

        payload = {"level": "info", "n": 7}
        msg = {
            "requestId": "req-1",
            "timestamp": 1704964113659,
            "records": [
                {"data": _b64.b64encode(_json.dumps(payload).encode()).decode()}
            ],
        }
        resp = _json.loads(post(msg).read())
        assert resp["records"] == 1
        rows = api._stores["firehose"].scan().collect()
        assert rows[0]["level"] == "info" and rows[0]["n"] == 7.0
        assert rows[0]["requestId"] == "req-1"
        assert rows[0]["timestamp"] == "1704964113659"
        # malformed envelope -> 400 via KinesisError, not a 500
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"requestId": "r", "timestamp": 1, "records": ["junk"]})
        assert ei.value.code == 400
    finally:
        srv.shutdown()
