"""Interval/range-join operator tests: boundary inclusivity, bucket
spanning, outer semantics, plan shape (no nested-loop join)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from parseable_spark.functions.rangejoin import time_range_join


def _ts(s):
    return datetime(2026, 8, 13, 12, 0, 0) + timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(1000), "L1"), (2, _ts(50), "L2")],
        "k bigint, ts timestamp_ntz, ltag string",
    )
    right = spark.createDataFrame(
        # 700: exactly at lower bound (1000-300); 1300: exactly upper;
        # 699/1301: just outside; 1100: inside but crosses bucket border
        [(1, _ts(700), "in_lo"), (1, _ts(1300), "in_hi"),
         (1, _ts(699), "out_lo"), (1, _ts(1301), "out_hi"),
         (1, _ts(1100), "mid"), (2, _ts(500), "far")],
        "k bigint, rts timestamp_ntz, rtag string",
    )
    return left, right


def test_range_join_inclusive_bounds_and_buckets(spark):
    left, right = _frames(spark)
    got = {
        r["rtag"]
        for r in time_range_join(
            left, right, keys=["k"], left_ts="ts", right_ts="rts",
            lower_seconds=-300, upper_seconds=300,
        ).collect()
    }
    assert got == {"in_lo", "in_hi", "mid"}


def test_range_join_left_outer_keeps_unmatched(spark):
    left, right = _frames(spark)
    rows = time_range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        lower_seconds=-300, upper_seconds=300, how="left_outer",
    ).collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["ltag"], []).append(r["rtag"])
    assert sorted(by_tag["L1"]) == ["in_hi", "in_lo", "mid"]
    assert by_tag["L2"] == [None]  # kept with null right payload


def test_range_join_asymmetric_window(spark):
    left, right = _frames(spark)
    got = {
        r["rtag"]
        for r in time_range_join(
            left, right, keys=["k"], left_ts="ts", right_ts="rts",
            lower_seconds=0, upper_seconds=300,
        ).collect()
    }
    assert got == {"in_hi", "mid"}  # only right rows at/after left ts


def test_range_join_no_nested_loop_in_plan(spark):
    left, right = _frames(spark)
    out = time_range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        lower_seconds=-300, upper_seconds=300,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_bad_args(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="upper_seconds"):
        time_range_join(left, right, keys=["k"], lower_seconds=10, upper_seconds=0)
    with pytest.raises(ValueError, match="collision"):
        time_range_join(
            left, left.withColumnRenamed("k", "k2"), keys=[],
            left_ts="ts", right_ts="ts",
        )


@pytest.mark.parametrize("seed", [7, 42])
def test_range_join_matches_bruteforce_random(spark, seed):
    """Randomized equivalence vs an O(n*m) pandas brute force."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    lrows = [(rng.randrange(4), _ts(rng.randrange(0, 5000)), f"L{i}")
             for i in range(120)]
    rrows = [(rng.randrange(4), _ts(rng.randrange(0, 5000)), f"R{i}")
             for i in range(200)]
    lo, hi = -97, 211  # asymmetric, not bucket-aligned
    left = spark.createDataFrame(lrows, "k bigint, ts timestamp_ntz, ltag string")
    right = spark.createDataFrame(rrows, "k bigint, rts timestamp_ntz, rtag string")
    got = {
        (r["ltag"], r["rtag"])
        for r in time_range_join(
            left, right, keys=["k"], left_ts="ts", right_ts="rts",
            lower_seconds=lo, upper_seconds=hi,
        ).collect()
    }
    want = {
        (lt, rt)
        for lk, lts, lt in lrows
        for rk, rts, rt in rrows
        if lk == rk and lts + pd.Timedelta(seconds=lo) <= rts <= lts + pd.Timedelta(seconds=hi)
    }
    assert got == want


def test_bucket_coverage_property():
    """Pure-math completeness invariant behind the operator: any
    in-range (left, right) pair meets in the right row's bucket —
    i.e. floor(r/w) always falls inside the left row's replicated
    bucket span [floor((l+lo)/w), floor((l+hi)/w)], including negative
    epochs and windows far larger/smaller than the bucket width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(
        l=st.integers(-10**9, 10**9),
        off=st.integers(0, 10**6),
        lo=st.integers(-10**6, 10**6),
        span=st.integers(0, 2 * 10**6),
        w=st.integers(1, 10**6),
    )
    def check(l, off, lo, span, w):
        hi = lo + span
        r = l + lo + (off % (span + 1))  # guaranteed in [l+lo, l+hi]
        assert (l + lo) // w <= r // w <= (l + hi) // w

    check()


def test_subsecond_boundary_is_exact(spark):
    """Code-review regression: whole-second epoch truncation admitted
    pairs whose true gap is a fraction past the window boundary."""
    from datetime import datetime

    from parseable_spark.functions.rangejoin import time_range_join

    left = spark.createDataFrame(
        [("u", datetime(2026, 1, 1, 12, 0, 0, 500000))], "k string, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            ("u", datetime(2026, 1, 1, 11, 55, 0, 400000)),  # gap 300.1s: OUT
            ("u", datetime(2026, 1, 1, 11, 55, 0, 600000)),  # gap 299.9s: IN
        ],
        "k string, rts timestamp_ntz",
    )
    out = time_range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        lower_seconds=-300, upper_seconds=300,
    ).collect()
    assert len(out) == 1
    assert out[0]["rts"] == datetime(2026, 1, 1, 11, 55, 0, 600000)
