"""Time-range (interval) join — equi-join on time buckets + residual.

Joins each left row to right rows whose timestamp falls in
[left_ts + lower_seconds, left_ts + upper_seconds] for the same key —
Flink's interval join; the reference engine exposes only what its SQL
engine plans, and a plain `ON key = key AND abs(t1-t2) <= w` condition
in Spark plans the time predicate as a post-join residual on the keyed
join, which is fine — but with NO equi-key (pure time-window joins) it
degenerates to BroadcastNestedLoopJoin, a cartesian product.

This operator makes the time dimension itself an equi-join key:

    bucket(right) = floor(epoch(right_ts) / W)
    left replicated to every bucket overlapping [t+lower, t+upper]
    join on (keys..., bucket)  ->  residual range filter

Each (left, right) candidate pair meets in exactly ONE bucket (the
right row's), so no dedup is needed. With W = window span, a left row
replicates to at most 2-3 buckets — constant fan-out, hash shuffle
both sides, no cartesian, partial aggregation still applies downstream.
At 100 TB the shuffle is (keys, bucket)-partitioned, so hot keys are
further spread across time buckets — milder skew than a key-only join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
_BUCKET = "__rj_bucket"


def _epoch_us(col: str) -> str:
    # MICROSECOND, not SECOND: whole-second truncation includes pairs
    # whose true gap is a fraction past the window boundary, diverging
    # from an inclusive full-precision BETWEEN (review finding — the
    # same ambiguity sessions.py was already fixed for)
    return f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})"


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 0,
    bucket_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Rows pair when right_ts ∈ [left_ts+lower, left_ts+upper] (both
    inclusive) and all `keys` match. Column names across the two inputs
    must not collide except for `keys` (alias beforehand).

    bucket_seconds defaults to the window span (max 2 buckets per left
    row); tune it down only if the span is huge and rows are dense.
    `how` supports inner/left_outer (left rows with no partner kept).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = list(keys)
    span = max(upper_seconds - lower_seconds, 1)
    w = int(bucket_seconds or span) * 1_000_000  # microsecond epoch axis

    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"non-key column collision: {sorted(clash)}")

    lo = F.expr(_epoch_us(left_ts)) + F.lit(int(lower_seconds) * 1_000_000)
    hi = F.expr(_epoch_us(left_ts)) + F.lit(int(upper_seconds) * 1_000_000)
    l_exp = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(w)).cast("long"),
                F.floor(hi / F.lit(w)).cast("long"),
            )
        ),
    )
    r_b = right.withColumn(
        _BUCKET, F.floor(F.expr(_epoch_us(right_ts)) / F.lit(w)).cast("long")
    )

    in_range = (
        F.expr(_epoch_us(right_ts))
        >= F.expr(_epoch_us(left_ts)) + F.lit(int(lower_seconds) * 1_000_000)
    ) & (
        F.expr(_epoch_us(right_ts))
        <= F.expr(_epoch_us(left_ts)) + F.lit(int(upper_seconds) * 1_000_000)
    )

    if how == "inner":
        return l_exp.join(r_b, on=[*keys, _BUCKET], how="inner").filter(in_range).drop(
            _BUCKET
        )
    if how == "left_outer":
        # run the inner match, then add back unmatched left rows
        matched = (
            l_exp.join(r_b, on=[*keys, _BUCKET], how="inner")
            .filter(in_range)
            .drop(_BUCKET)
        )
        r_payload = [c for c in right.columns if c not in keys]
        missing = left.join(
            matched.select(*keys, left_ts).distinct(),
            on=[*keys, left_ts],
            how="left_anti",
        ).select(
            *left.columns,
            *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_payload],
        )
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")
