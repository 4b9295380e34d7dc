"""End-to-end product lifecycle: ingest → flush → compact → query
surface (SQL + counts + alerts + field stats + NDJSON) → retention.

One scenario exercising the full reference workflow across layers —
the Spark analog of the reference's Quest black-box suite
(SURVEY.md §5, integration-test.yaml)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from parseable_spark.ingest.events import StreamConfig
from parseable_spark.query.alerts import Alert, AlertState, Condition, ConditionGroup
from parseable_spark.query.counts import fast_count, histogram_sql
from parseable_spark.query.engine import QueryEngine
from parseable_spark.query.field_stats import compute_field_stats
from parseable_spark.query.response import ndjson_lines, query_response
from parseable_spark.storage.store import StreamStore


@pytest.fixture(scope="class")
def world(spark, tmp_path_factory):
    """Ingest two days of app logs in three flushes (schema evolves
    mid-stream), compact, and expose the stream through a QueryEngine."""
    root = tmp_path_factory.mktemp("e2e")
    store = StreamStore(spark, str(root), StreamConfig(name="app"))
    base = datetime(2026, 8, 10, 9, 0)

    # day 1, two flushes into the same minute partition (compactable)
    for flush in range(2):
        batch = [
            {
                "level": "error" if i % 5 == 0 else "info",
                "latency_ms": 10.0 * i + flush,
                "svc": {"name": f"svc-{i % 2}"},
            }
            for i in range(10)
        ]
        store.ingest(batch, p_timestamp=base)
        store.flush()
    # day 2: schema evolves (new field), different partition
    store.ingest(
        [{"level": "info", "latency_ms": 1.0, "region": "eu"} for _ in range(5)],
        p_timestamp=base + timedelta(days=1),
    )
    store.flush()
    assert store.compact() >= 1

    eng = QueryEngine(spark, time_col="p_timestamp")
    eng.register_stream("app", store.legacy_scan())
    return store, eng, base


class TestLifecycle:
    def test_schema_evolved_union(self, world):
        store, eng, base = world
        # evolved field exists, old rows read it as null
        rows = eng.query(
            "SELECT count(*) AS n FROM app WHERE region IS NULL"
        ).collect()
        assert rows[0]["n"] == 20

    def test_sql_with_time_injection(self, world):
        store, eng, base = world
        day1 = eng.query(
            "SELECT level, count(*) AS n FROM app GROUP BY level ORDER BY level",
            "2026-08-10T00:00:00Z",
            "2026-08-11T00:00:00Z",
        ).collect()
        assert {r["level"]: r["n"] for r in day1} == {"error": 4, "info": 16}

    def test_count_fast_path_vs_scan(self, world):
        store, eng, base = world
        fast = fast_count(eng, "SELECT COUNT(*) AS n FROM app", {"app": store})
        assert fast.collect()[0]["n"] == 25
        scan = eng.query("SELECT COUNT(*) AS n FROM app").collect()[0]["n"]
        assert scan == 25  # metadata answer == scan answer

    def test_counts_histogram_api(self, world):
        store, eng, base = world
        sql = histogram_sql("app", "p_timestamp", 86400)
        bins = eng.query(sql, "2026-08-09T00:00:00Z", "2026-08-12T00:00:00Z").collect()
        assert sorted(b["cnt"] for b in bins) == [5, 20]

    def test_alert_on_error_rate(self, world):
        store, eng, base = world
        alert = Alert(
            stream="app",
            aggregate="count",
            agg_column="*",
            threshold_op=">",
            threshold=3,
            conditions=ConditionGroup(
                "AND", [Condition("level", "=", "error")]
            ),
        )
        state = alert.evaluate(
            eng, "2026-08-10T00:00:00Z", "2026-08-11T00:00:00Z"
        )
        assert state is AlertState.TRIGGERED  # 4 errors > 3

    def test_field_stats_pipeline(self, world):
        store, eng, base = world
        df = eng.query("SELECT * FROM app")
        stats = {r["field_name"]: r for r in compute_field_stats(df, "app", fields=["level"]).collect()}
        top = stats["level"]["distinct_stats"]
        assert top[0]["distinct_value"] == "info" and top[0]["count"] == 21

    def test_ndjson_and_response_flags(self, world):
        store, eng, base = world
        df = eng.query("SELECT level, latency_ms FROM app ORDER BY latency_ms LIMIT 3")
        lines = list(ndjson_lines(df))
        assert len(lines) == 3 and json.loads(lines[0])["latency_ms"] == 0.0
        wrapped = query_response(df, fields=True, send_null=False)
        assert wrapped["fields"] == ["level", "latency_ms"]

    def test_stats_ledger_and_retention(self, world, spark):
        store, eng, base = world
        assert store.stats.lifetime.events == 25
        assert store.stats.current.events == 25
        removed = store.apply_retention(days=1, now=base + timedelta(days=2))
        assert removed == 1  # day-1 partition dropped
        assert store.count_fast_path() == 5
        assert store.stats.current.events == 5
        assert store.stats.deleted.events == 20
