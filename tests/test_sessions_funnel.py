"""Sessionization + funnel semantics on crafted timelines."""

from __future__ import annotations

from pyspark.sql import functions as F

from parseable_spark.functions.sessions import funnel, sessionize


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts string"
    )
    return df.withColumn("ts", F.to_timestamp("ts").cast("timestamp_ntz"))


def test_sessionize_splits_on_gap(spark):
    df = _events(
        spark,
        [
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:10:00"),   # same session (10 min)
            (3, 1, "view", "2024-01-01 11:00:00"),    # 50 min gap → new session
            (4, 2, "view", "2024-01-01 10:00:00"),    # other user independent
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)]["n_events"] == 2
    assert str(got[(1, 1)]["session_end"]) == "2024-01-01 10:10:00"
    assert got[(1, 2)]["n_events"] == 1


def test_sessionize_boundary_gap_stays_in_session(spark):
    """A gap of exactly gap_seconds does NOT split (strict >)."""
    df = _events(
        spark,
        [
            (1, 1, "a", "2024-01-01 10:00:00"),
            (2, 1, "b", "2024-01-01 10:30:00"),  # exactly 1800 s
        ],
    )
    out = sessionize(df, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_funnel_strict_ordering(spark):
    df = _events(
        spark,
        [
            # u1 full ordered funnel
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:01:00"),
            (3, 1, "purchase", "2024-01-01 10:02:00"),
            # u2 clicks BEFORE viewing → converts view only
            (4, 2, "click", "2024-01-01 09:00:00"),
            (5, 2, "view", "2024-01-01 10:00:00"),
            # u3 views+clicks, purchase precedes click → no purchase credit
            (6, 3, "view", "2024-01-01 10:00:00"),
            (7, 3, "purchase", "2024-01-01 10:00:30"),
            (8, 3, "click", "2024-01-01 10:01:00"),
            # u4 never views → not in the funnel at all
            (9, 4, "purchase", "2024-01-01 10:00:00"),
        ],
    )
    row = funnel(df, ["view", "click", "purchase"]).collect()[0]
    assert (row["step_view"], row["step_click"], row["step_purchase"]) == (3, 2, 1)


def test_funnel_same_timestamp_does_not_convert(spark):
    df = _events(
        spark,
        [
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:00:00"),  # simultaneous → strict > fails
        ],
    )
    row = funnel(df, ["view", "click"]).collect()[0]
    assert (row["step_view"], row["step_click"]) == (1, 0)


def test_log_templates_masking(spark):
    from parseable_spark.llm.text import log_templates

    df = spark.createDataFrame(
        [
            (1, "conn 0xDEAD42 from 'alice' took 12.5 ms"),
            (2, "conn 0xBEEF from 'bob' took 3 ms"),
            (3, "disk full on /dev/sda1"),
        ],
        "user_id bigint, msg string",
    )
    out = {
        r["template"]: (r["n_events"], r["n_users"])
        for r in log_templates(df, msg_col=__import__("pyspark").sql.functions.col("msg")).collect()
    }
    assert out["conn <HEX> from <STR> took <NUM> ms"] == (2, 2)
    assert out["disk full on /dev/sda<NUM>"] == (1, 1)
