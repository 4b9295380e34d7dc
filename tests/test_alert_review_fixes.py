"""Regression tests for the round-5 query/ subsystem review findings:
SQL injection via the condition-group logic string, unvalidated
threshold operators, identifier backticking (line-comment truncation),
per-stream time-filter scoping, scheduler first-eval sentinel,
dispatch-time egress gate, repeat-window length, and registry delete
semantics."""

from __future__ import annotations

import time

import pytest

from parseable_spark.query.alert_targets import (
    Context,
    NotificationConfig,
    RecordingTransport,
    SlackTarget,
    TargetInUseError,
    TargetRegistry,
    WebhookTarget,
)
from parseable_spark.query.alert_scheduler import ScheduledAlert
from parseable_spark.query.alerts import (
    Alert,
    AlertState,
    Condition,
    ConditionGroup,
    grouped_alert_sql,
)
from parseable_spark.query.engine import references_time_col


class TestConditionInjection:
    def test_logic_operator_whitelist(self):
        # the /counts and alerts APIs pass the user `operator` verbatim
        # into ConditionGroup.logic; anything but AND/OR is an injection
        with pytest.raises(ValueError):
            ConditionGroup(
                "OR (SELECT max(x) FROM other) > 0 OR",
                [Condition("a", "=", 1), Condition("b", "=", 2)],
            )
        with pytest.raises(ValueError):
            ConditionGroup("UNION", [Condition("a", "=", 1)])

    def test_logic_case_insensitive(self):
        g = ConditionGroup("or", [Condition("a", "=", 1), Condition("b", "=", 2)])
        assert g.to_sql() == "`a` = 1 OR `b` = 2"

    def test_mutated_logic_caught_at_to_sql(self):
        g = ConditionGroup("AND", [Condition("a", "=", 1)])
        g.logic = "OR 1=1 --"
        with pytest.raises(ValueError):
            g.to_sql()

    def test_dash_column_backticked_no_line_comment(self):
        # 'a--' passes the identifier regex; bare interpolation opened a
        # SQL line comment that truncated everything after it
        sql = Condition("a--", "is null").to_sql()
        assert "`a--`" in sql and not sql.rstrip().endswith("--")
        # honest dash column resolves as ONE name, not subtraction
        assert Condition("x-p-env", "=", "prod").to_sql() == "`x-p-env` = 'prod'"

    def test_nested_field_backticked_per_segment(self):
        assert Condition("meta.level", "=", "err").to_sql() == "`meta`.`level` = 'err'"


class TestAlertValidation:
    def test_threshold_op_whitelist(self):
        with pytest.raises(ValueError):
            Alert("events", "count", "*", "=>", 1.0)
        with pytest.raises(ValueError):
            Alert("events", "count", "*", "> 0 OR 1=1 --", 1.0)

    def test_threshold_coerced_to_float(self):
        a = Alert("events", "count", "*", ">", "5")
        assert a.threshold == 5.0
        with pytest.raises(ValueError):
            Alert("events", "count", "*", ">", "5; DROP TABLE x")

    def test_grouped_sql_backticks_and_validates(self):
        sql = grouped_alert_sql("events", "avg", "value", "event_type", ">", "7")
        assert "`event_type`" in sql and "HAVING avg(`value`) > 7.0" in sql
        with pytest.raises(ValueError):
            grouped_alert_sql("events", "avg", "value", "event_type", "=>", 7)


class TestTimeColScoping:
    def test_qualified_ref_scopes_to_one_stream(self):
        sql = "SELECT * FROM a JOIN b ON a.id=b.id WHERE a.p_timestamp >= 'x'"
        known = {"a", "b"}
        assert references_time_col(sql, "p_timestamp", stream="a", known_streams=known)
        # b is NOT constrained — injection must still apply to it
        assert not references_time_col(
            sql, "p_timestamp", stream="b", known_streams=known
        )

    def test_unqualified_ref_counts_for_all(self):
        sql = "SELECT * FROM a JOIN b ON a.id=b.id WHERE p_timestamp >= 'x'"
        for s in ("a", "b"):
            assert references_time_col(sql, "p_timestamp", stream=s, known_streams={"a", "b"})

    def test_alias_qualifier_is_conservative(self):
        # `t` is an alias we can't resolve: suppressing injection is the
        # double-filter-safe direction
        sql = "SELECT * FROM a t WHERE t.p_timestamp >= 'x'"
        assert references_time_col(sql, "p_timestamp", stream="a", known_streams={"a"})

    def test_string_literal_does_not_match(self):
        sql = "SELECT * FROM a WHERE msg = 'p_timestamp > 5'"
        assert not references_time_col(sql, "p_timestamp", stream="a", known_streams={"a"})


class TestSchedulerSentinel:
    def test_fresh_alert_immediately_due(self):
        sa = ScheduledAlert(Alert("events", "count", "*", ">", 1.0))
        # on a recently-booted host monotonic() is small; a 0.0 sentinel
        # gated first evaluation on machine uptime
        assert sa.due(30.0)
        sa._last_eval = 30.0
        assert not sa.due(31.0)
        assert sa.due(30.0 + sa.eval_frequency_s)


def _ctx(state: AlertState) -> Context:
    return Context("id1", "alert1", "fired", state)


class TestTargetDispatch:
    def test_times_one_window_spans_one_interval(self):
        # with the default times=1 the reset fired immediately, so a
        # flapping alert re-notified on every evaluation
        rec = RecordingTransport()
        t = SlackTarget(
            "s", "https://hooks.slack.com/x",
            notification=NotificationConfig(interval_s=0.3, times=1),
            transport=rec,
        )
        t.call(_ctx(AlertState.TRIGGERED), get_state=lambda: AlertState.TRIGGERED)
        assert len(rec.calls) == 1
        # immediately re-trigger: still inside the window → suppressed
        t.call(_ctx(AlertState.TRIGGERED), get_state=lambda: AlertState.TRIGGERED)
        assert len(rec.calls) == 1
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and t.state.timed_out:
            time.sleep(0.05)
        assert not t.state.timed_out  # window ended after ~1 interval
        t.call(_ctx(AlertState.TRIGGERED), get_state=lambda: AlertState.TRIGGERED)
        assert len(rec.calls) == 2
        t.close()

    def test_policy_gate_vetoes_dispatch(self):
        rec = RecordingTransport()
        t = WebhookTarget("w", "http://example.com", transport=rec)

        def deny():
            raise RuntimeError("denied by outbound policy")

        t.policy_gate = deny
        t.call(_ctx(AlertState.TRIGGERED))
        assert rec.calls == []  # vetoed, and veto never raises
        t.policy_gate = None
        t2 = WebhookTarget("w2", "http://example.com", transport=rec)
        t2.call(_ctx(AlertState.TRIGGERED))
        assert len(rec.calls) == 1
        t.close()
        t2.close()

    def test_registry_delete_closes_repeat_thread(self):
        rec = RecordingTransport()
        t = SlackTarget(
            "s", "https://hooks.slack.com/x",
            notification=NotificationConfig(interval_s=0.1, times=None),
            transport=rec,
        )
        reg = TargetRegistry()
        reg.update(t)
        t.call(_ctx(AlertState.TRIGGERED), get_state=lambda: AlertState.TRIGGERED)
        assert t._repeat_thread is not None and t._repeat_thread.is_alive()
        reg.delete(t.id)
        t._repeat_thread.join(timeout=5)
        assert not t._repeat_thread.is_alive()
        n = len(rec.calls)
        time.sleep(0.35)  # no further posts after delete
        assert len(rec.calls) == n

    def test_registry_delete_in_use_reinserts(self):
        t = SlackTarget("s", "https://hooks.slack.com/x", transport=RecordingTransport())
        reg = TargetRegistry()
        reg.update(t)
        with pytest.raises(TargetInUseError):
            reg.delete(t.id, alert_target_ids=lambda: [t.id])
        assert reg.get(t.id) is t  # still registered, not closed
        assert not t._stop.is_set()
