"""As-of join operator tests: tie semantics, tolerance, LEFT nulls.

The oracle query (q52) checks parity with DuckDB ASOF JOIN at scale;
these pin the operator's edge semantics on hand-built frames.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from parseable_spark.functions import asof_join


def _ts(m, s=0):
    return datetime(2026, 8, 13, 12, m, s)


def test_asof_basic_and_left_nulls(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(1), "b"), (2, _ts(3), "c")],
        "k bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 10.0), (1, _ts(4), 20.0), (3, _ts(0), 99.0)],
        "k bigint, ts timestamp_ntz, v double",
    )
    out = {
        (r["k"], r["tag"]): r["v"]
        for r in asof_join(left, right, keys=["k"]).collect()
    }
    assert out[(1, "a")] == 20.0  # latest right <= 12:05
    assert out[(1, "b")] is None  # no right row at/before 12:01
    assert out[(2, "c")] is None  # key has no right rows at all


def test_asof_equal_ts_matches_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts(2), "x")], "k bigint, ts timestamp_ntz, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 1.0, 100), (1, _ts(2), 2.0, 200), (1, _ts(1), 9.0, 300)],
        "k bigint, ts timestamp_ntz, v double, rid bigint",
    )
    rows = asof_join(
        left, right, keys=["k"], right_cols=["v", "rid"],
        right_order=["rid"], matched_ts_col="rts",
    ).collect()
    assert len(rows) == 1
    # equal-ts right row matches (inclusive), max rid wins the tie
    assert rows[0]["v"] == 2.0 and rows[0]["rid"] == 200
    assert rows[0]["rts"] == _ts(2)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "fresh"), (2, _ts(10), "stale")],
        "k bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 1.0), (2, _ts(0), 2.0)],
        "k bigint, ts timestamp_ntz, v double",
    )
    rows = {
        r["tag"]: (r["v"], r["rts"])
        for r in asof_join(
            left, right, keys=["k"], matched_ts_col="rts",
            tolerance_seconds=120,
        ).collect()
    }
    assert rows["fresh"] == (1.0, _ts(9))
    assert rows["stale"] == (None, None)  # row kept, match nulled


def test_asof_collision_rejected(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k bigint, ts timestamp_ntz, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, keys=["k"])


def test_nullable_right_payload_is_row_atomic(spark):
    """Code-review regression: the matched right row must come over as a
    whole — per-column ignorenulls fill stitched (price from ts2, qty
    from ts1), a row that never existed."""
    from datetime import datetime

    from parseable_spark.functions.asof import asof_join

    right = spark.createDataFrame(
        [
            ("k", datetime(2026, 1, 1, 0, 0, 1), 100.0, 10.0),
            ("k", datetime(2026, 1, 1, 0, 0, 2), 200.0, None),
        ],
        "k string, ts timestamp_ntz, price double, qty double",
    )
    left = spark.createDataFrame(
        [("k", datetime(2026, 1, 1, 0, 0, 3))], "k string, ts timestamp_ntz"
    )
    out = asof_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts",
        matched_ts_col="m_ts",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["price"] == 200.0 and r["qty"] is None
    assert r["m_ts"] == datetime(2026, 1, 1, 0, 0, 2)


def test_asof_tolerance_subsecond_overage_is_stale(spark):
    """Review finding (r5): timestampdiff(SECOND) truncated sub-second
    overage, keeping matches up to 1s past the tolerance. A gap of
    300.9s against tolerance 300 must null the match."""
    left = spark.createDataFrame(
        [(1, datetime(2026, 8, 13, 12, 5, 0, 900000), "a")],
        "k bigint, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, datetime(2026, 8, 13, 12, 0, 0), 10.0)],
        "k bigint, ts timestamp_ntz, v double",
    )
    out = asof_join(left, right, keys=["k"], tolerance_seconds=300).collect()
    assert out[0]["v"] is None  # 300.9s > 300s — stale
    # exactly at the bound is still a match
    left2 = spark.createDataFrame(
        [(1, datetime(2026, 8, 13, 12, 5, 0), "a")],
        "k bigint, ts timestamp_ntz, tag string",
    )
    out2 = asof_join(left2, right, keys=["k"], tolerance_seconds=300).collect()
    assert out2[0]["v"] == 10.0
