"""Stream–stream joins with event-time bounds.

The streaming counterpart of functions/rangejoin.py: Spark's
stream–stream join natively supports equi-keys plus a time-interval
condition, and the watermarks on BOTH sides are what let the join state
be evicted — without the interval bound the state would grow forever.
(The reference engine has no stream-join analog; this is a
beyond-reference Structured Streaming capability, SURVEY §2.5.)

State bound at 100 TB/day: each side buffers only rows younger than
(watermark delay + interval span) per key partition; the shuffle is the
same (keys)-hash exchange a batch join would use, and the watermark
eviction keeps per-executor state proportional to event-rate × window,
independent of total history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ingest import _watermarkable


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark_delay: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join streams where right_ts ∈ [left_ts+lower, left_ts+upper]
    (inclusive) and `keys` match. Both sides get `watermark_delay`
    event-time watermarks; non-key column names must not collide.

    `how` supports inner and left_outer (unmatched left rows emit with
    nulls once the watermark passes their join window — outer results
    are therefore delayed by design, not dropped).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = list(keys)
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"non-key column collision: {sorted(clash)}")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    lw = _watermarkable(left, left_ts).withWatermark(left_ts, watermark_delay)
    rw = _watermarkable(right, right_ts).withWatermark(right_ts, watermark_delay)
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {int(lower_seconds)} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {int(upper_seconds)} SECOND"))
    )
    for k in keys:
        cond = (lw[k] == rw[k]) & cond
    joined = lw.join(rw, cond, how)
    # de-duplicate the key columns (both sides carry them post-join)
    dedup = [lw[k].alias(k) for k in keys]
    rest = [c for c in joined.columns if c not in keys]
    return joined.select(*dedup, *rest)
