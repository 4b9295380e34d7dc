"""Sessionization + funnel analysis over event streams (batch).

Product-analytics operators the reference's users run as generated SQL
over log streams; both are expressed so every window is PARTITIONed by
the entity key — per-user work stays in one task, users parallelize
across the cluster, nothing global.

- ``sessionize``: gap-based session assignment — a new session starts
  when the gap to the previous event of the same user exceeds
  ``gap_seconds``. Two stacked windows per user (lag → flag, running
  sum → session id) then one hash aggregate; at 100 TB this is one
  shuffle on user_id.
- ``funnel``: ordered-step conversion (e.g. view → click → purchase):
  step N counts users whose first step-N event happens strictly after
  their first qualifying step-(N−1) event. One per-user aggregate per
  step joined on the entity key — co-partitioned shuffles that AQE
  collapses; no window over more than one user's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    id_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """(user, session_id, session_start, session_end, n_events) with
    sessions split at inactivity gaps > gap_seconds. Deterministic
    ordering via (ts, order_col) so ties never flip session bounds."""
    w = Window.partitionBy(id_col).orderBy(ts_col, order_col)
    with_prev = events.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w))
    # microsecond precision: SECOND-granularity diffs are engine-
    # ambiguous on sub-second gaps (exact difference vs boundary count)
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(id_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_ids = with_prev.withColumn("session_id", F.sum(new_session).over(cum))
    return with_ids.groupBy(id_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row of per-step converted-user counts for an ordered funnel.

    Step k counts entities whose earliest step-k event is strictly
    after their earliest qualifying step-(k-1) event (the standard
    strict-ordering funnel; same-timestamp events do not convert).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(id_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(per_user.select(id_col, f"t{i-1}"), id_col)
            .filter(F.col(ts_col) > F.col(f"t{i-1}"))
            .groupBy(id_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        per_user = per_user.join(nxt, id_col, "left")
    # single aggregate job: count(t_i) skips nulls, giving per-step
    # converted-user counts — no per-step driver actions
    return per_user.agg(
        *[
            F.count(f"t{i}").cast("bigint").alias(f"step_{s}")
            for i, s in enumerate(steps)
        ]
    )
