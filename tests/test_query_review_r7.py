"""Round-7 review findings over parseable_spark/query/ — each test
pins one verified defect (see the r7 review pass): fast-path gate
bypass, condition-value lexer escaping, DNS-rebinding pinning, alias
time-filter suppression, cross-tenant view restore, identifier gating
in field-stats SQL, backtick aliases in the COUNT fast path, duplicate
output columns, and target-delete error atomicity.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from parseable_spark.query.engine import QueryEngine, references_time_col


def _eng(spark, name="rstream"):
    eng = QueryEngine(spark, time_col="ts")
    df = spark.createDataFrame(
        [(1, "x\\' OR 1=1 --", datetime(2026, 8, 13, 12, 0)),
         (2, "benign", datetime(2026, 8, 13, 12, 1))],
        "v bigint, msg string, ts timestamp_ntz",
    )
    eng.register_stream(name, df)
    return eng


class TestFastPathGate:
    def test_detect_bare_count_never_executes_unvalidated_sql(self, spark):
        """spark.sql() runs commands EAGERLY — probing the plan shape
        of unvalidated SQL executed SET/DDL before the read-only gate
        (full bypass via the COUNT(*) fast path)."""
        eng = _eng(spark)
        key = "spark.sql.runSQLOnFiles"
        before = spark.conf.get(key)
        assert eng.detect_bare_count(f"SET {key}=true") is None
        assert spark.conf.get(key) == before  # the SET must NOT run
        assert eng.detect_bare_count("DROP VIEW rstream") is None
        assert any(t.name == "rstream" for t in spark.catalog.listTables())
        # the legit shape still fast-paths
        got = eng.detect_bare_count("SELECT COUNT(*) AS n FROM rstream")
        assert got == ("rstream", "n")
        eng.deregister_stream("rstream")

    def test_backtick_alias_roundtrips(self, spark):
        """A legal alias containing a backtick must not 500 the fast
        path's result-schema construction."""
        eng = _eng(spark)
        got = eng.detect_bare_count("SELECT COUNT(*) AS `a``b` FROM rstream")
        assert got == ("rstream", "a`b")
        eng.deregister_stream("rstream")

    def test_fast_count_schema_with_backtick_alias(self, spark, tmp_path):
        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.query.counts import fast_count
        from parseable_spark.storage.store import StreamStore

        st = StreamStore(spark, str(tmp_path), StreamConfig(name="fc"))
        st.ingest([{"n": 1}], p_timestamp=datetime(2026, 8, 13, 12, 0))
        st.flush()
        eng = QueryEngine(spark)
        eng.register_stream("fc", st.scan())
        df = fast_count(
            eng, "SELECT COUNT(*) AS `a``b` FROM fc", {"fc": st}
        )
        assert df is not None and df.columns == ["a`b"]
        assert df.collect()[0][0] == 1
        eng.deregister_stream("fc")


class TestConditionEscaping:
    def test_backslash_quote_cannot_escape_the_literal(self, spark):
        """Spark's default lexer treats \\' as an escaped quote, so
        quote-doubling alone let a value ending in a backslash swallow
        the closing quote and smuggle raw SQL."""
        from parseable_spark.query.alerts import Condition

        df = spark.createDataFrame(
            [("x\\' OR 1=1 --",), ("benign",)], "msg string"
        )
        sql = Condition("msg", "=", "x\\' OR 1=1 --").to_sql()
        rows = df.filter(sql).collect()
        assert [r["msg"] for r in rows] == ["x\\' OR 1=1 --"]  # literal only
        like = Condition("msg", "contains", "\\' OR 1=1 --").to_sql()
        assert [r["msg"] for r in df.filter(like).collect()] == [
            "x\\' OR 1=1 --"
        ]

    def test_null_value_rejected_for_comparisons(self):
        from parseable_spark.query.alerts import Condition

        with pytest.raises(ValueError, match="requires a value"):
            Condition("c", "=", None).to_sql()
        # IS NULL stays value-less
        assert Condition("c", "is null").to_sql() == "`c` IS NULL"

    def test_non_scalar_values_rejected(self):
        from parseable_spark.query.alerts import Condition

        with pytest.raises(ValueError, match="unsupported condition value"):
            Condition("c", "=", ["a", "b"]).to_sql()


class TestTimeFilterAliasResolution:
    SQL = (
        "SELECT * FROM app a JOIN other o ON a.v = o.v "
        "WHERE a.p_timestamp >= '2026-08-01'"
    )

    def test_alias_constrains_only_its_own_stream(self):
        known = {"app", "other"}
        assert references_time_col(self.SQL, "p_timestamp", "app", known)
        # pre-fix this returned True (alias 'a' unresolvable) and
        # `other` scanned full history
        assert not references_time_col(self.SQL, "p_timestamp", "other", known)

    def test_unresolvable_alias_stays_conservative(self):
        sql = (
            "SELECT * FROM (SELECT * FROM app) z, other "
            "WHERE z.p_timestamp >= '2026-08-01'"
        )
        known = {"app", "other"}
        # z aliases a subquery the regex can't resolve: suppress for
        # both (the double-filter-safe direction)
        assert references_time_col(sql, "p_timestamp", "app", known)
        assert references_time_col(sql, "p_timestamp", "other", known)


class TestCrossTenantRestore:
    def test_foreign_restore_does_not_clobber_same_named_view(self, spark):
        """Engine A owns 'x' and 'shr'; engine B owns 'shr'. B querying
        'x' must fail AND leave B's 'shr' installed — the old finally
        block re-installed ALL of A's streams, leaving A's data under
        B's view name."""
        a = QueryEngine(spark, time_col="ts")
        b = QueryEngine(spark, time_col="ts")
        mk = lambda tag: spark.createDataFrame(  # noqa: E731
            [(tag, datetime(2026, 8, 13, 12, 0))], "who string, ts timestamp_ntz"
        )
        a.register_stream("x_r7", mk("a-x"))
        a.register_stream("shr_r7", mk("a-shared"))
        b.register_stream("shr_r7", mk("b-shared"))  # takes ownership
        with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found|cannot be found"):
            b.query("SELECT * FROM x_r7").collect()
        got = [r["who"] for r in spark.table("shr_r7").collect()]
        assert got == ["b-shared"]  # B's view survives the restore
        a.deregister_stream("x_r7")
        b.deregister_stream("shr_r7")


class TestFieldStatsIdentifiers:
    def test_dotted_field_and_injection_gate(self, spark):
        from parseable_spark.query.field_stats import (
            field_cardinality_sql,
            field_top_k_sql,
        )

        df = spark.createDataFrame(
            [("GET",), ("GET",), ("POST",)], ["http.method"]
        )
        df.createOrReplaceTempView("fs_r7")
        sql = field_top_k_sql("fs_r7", ["http.method"], k=2)
        rows = spark.sql(sql).collect()
        assert {(r["field_value"], r["cnt"]) for r in rows} == {
            ("GET", 2), ("POST", 1)
        }
        card = spark.sql(
            field_cardinality_sql("fs_r7", ["http.method"])
        ).collect()[0]
        assert card["distinct_count"] == 2
        for bad in ("a b", "x'y", "t`x", "a;drop"):
            with pytest.raises(ValueError, match="invalid identifier"):
                field_top_k_sql("fs_r7", [bad], k=1)
        spark.catalog.dropTempView("fs_r7")


class TestResponseDuplicates:
    def test_duplicate_output_columns_rejected(self, spark):
        from parseable_spark.query.response import ndjson_lines, query_response

        df = spark.sql("SELECT 1 AS a, 2 AS a")
        with pytest.raises(ValueError, match="duplicate output column"):
            query_response(df)
        with pytest.raises(ValueError, match="duplicate output column"):
            next(ndjson_lines(df))


class TestTargetDeleteAtomicity:
    def test_failing_in_use_check_restores_the_target(self):
        from parseable_spark.query.alert_targets import (
            NotificationTarget,
            TargetRegistry,
        )

        reg = TargetRegistry()
        t = NotificationTarget("t", "http://127.0.0.1:9/x")
        reg.update(t)

        def boom():
            raise RuntimeError("transient")

        with pytest.raises(RuntimeError, match="transient"):
            reg.delete(t.id, alert_target_ids=boom)
        assert reg.get(t.id) is t  # restored, not silently deleted


class TestPinnedDispatch:
    def test_gate_addrs_are_pinned_into_the_send(self):
        from parseable_spark.query.alert_targets import (
            Context,
            RecordingTransport,
            WebhookTarget,
        )
        from parseable_spark.query.alerts import AlertState

        rec = RecordingTransport()
        t = WebhookTarget("t", "http://example.invalid/hook", transport=rec)
        t.policy_gate = lambda: {"addrs": ["203.0.113.9"], "headers": {}}
        t._send(Context("id", "n", "m", AlertState.TRIGGERED))
        assert rec.calls and rec.calls[0]["pinned_ip"] == "203.0.113.9"

    def test_http_transport_connects_to_pinned_ip(self):
        """The URL's hostname does not resolve; the POST must still land
        because the connection goes to the PINNED address while the Host
        header carries the hostname."""
        import http.server
        import threading

        from parseable_spark.query.alert_targets import HttpTransport

        seen = {}

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                seen["host"] = self.headers.get("Host")
                seen["path"] = self.path
                seen["body"] = self.rfile.read(
                    int(self.headers.get("Content-Length", 0))
                )
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            port = srv.server_address[1]
            HttpTransport(timeout_s=5).post(
                f"http://rebind-target.invalid:{port}/hook",
                b'{"k":1}',
                {"Content-Type": "application/json"},
                pinned_ip="127.0.0.1",
            )
            assert seen.get("path") == "/hook"
            assert seen.get("host", "").startswith("rebind-target.invalid")
            assert seen.get("body") == b'{"k":1}'
        finally:
            srv.shutdown()
