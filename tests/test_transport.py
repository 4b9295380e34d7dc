"""Field-stats write pipeline, JSON/NDJSON responses, Flight transport."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from parseable_spark.query.engine import QueryEngine
from parseable_spark.query.field_stats import compute_field_stats
from parseable_spark.query.response import ndjson_lines, query_response
from parseable_spark.tables import load_table
from tests.conftest import SF_SMALL


class TestFieldStatsPipeline:
    def test_pstats_shape_and_values(self, spark, duck):
        ev = load_table(spark, SF_SMALL, "events")
        out = compute_field_stats(ev, "events", fields=["event_type", "user_id"], k=3)
        rows = {r["field_name"]: r for r in out.collect()}
        assert set(rows) == {"event_type", "user_id"}
        et = rows["event_type"]
        assert et["dataset_name"] == "events"
        total = duck.sql("SELECT count(*) FROM events").fetchone()[0]
        ndist = duck.sql("SELECT count(DISTINCT event_type) FROM events").fetchone()[0]
        assert et["count"] == total and et["distinct_count"] == ndist
        # top-K matches the oracle's value counts, ordered count desc
        top = duck.sql(
            "SELECT event_type, count(*) c FROM events GROUP BY 1 ORDER BY c DESC, event_type LIMIT 3"
        ).fetchall()
        got = [(s["distinct_value"], s["count"]) for s in et["distinct_stats"]]
        assert got == [(v, c) for v, c in top]

    def test_nulls_count_as_null_literal(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), (None,)], "v string"
        )
        row = compute_field_stats(df, "d", k=5).collect()[0]
        stats = dict((s["distinct_value"], s["count"]) for s in row["distinct_stats"])
        assert stats == {"NULL": 2, "a": 1}
        assert row["count"] == 3 and row["distinct_count"] == 2


class TestResponse:
    def test_query_response_flags(self, spark):
        df = spark.createDataFrame(
            [(1, "x", None), (2, None, 3.5)], "id int, s string, v double"
        )
        plain = query_response(df.orderBy("id"))
        assert plain == [
            {"id": 1, "s": "x", "v": None},
            {"id": 2, "s": None, "v": 3.5},
        ]
        wrapped = query_response(df.orderBy("id"), fields=True, send_null=False)
        assert wrapped["fields"] == ["id", "s", "v"]
        assert wrapped["records"] == [{"id": 1, "s": "x"}, {"id": 2, "v": 3.5}]

    def test_timestamp_serialization(self, spark):
        df = spark.createDataFrame(
            [(datetime(2026, 8, 13, 12, 0, 0, 123000),)], "ts timestamp_ntz"
        )
        assert query_response(df) == [{"ts": "2026-08-13T12:00:00.123"}]

    def test_ndjson_streams_all_rows(self, spark):
        df = spark.range(100).selectExpr("id", "id * 2 AS dbl")
        lines = list(ndjson_lines(df))
        assert len(lines) == 100
        parsed = [json.loads(ln) for ln in lines]
        assert {p["id"] for p in parsed} == set(range(100))
        assert all(p["dbl"] == 2 * p["id"] for p in parsed)


class TestFlight:
    def test_do_get_roundtrip(self, spark):
        pytest.importorskip("pyarrow.flight")
        from parseable_spark.flight import fetch, serve

        eng = QueryEngine(spark, time_col="ts")
        eng.register_stream("events", load_table(spark, SF_SMALL, "events"), time_col="ts")
        server = serve(eng)
        try:
            table = fetch(
                server.port,
                "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
                "2024-01-10T00:00:00Z",
                "2024-01-17T00:00:00Z",
            )
            assert table.num_rows >= 1
            assert set(table.column_names) == {"event_type", "cnt"}
            # time filter was injected: full-range count is larger
            full = fetch(server.port, "SELECT count(*) AS n FROM events")
            window = sum(table.column("cnt").to_pylist())
            assert full.column("n").to_pylist()[0] > window
        finally:
            server.shutdown()
