"""Custom stateful streaming operator: per-key alert state machine.

The reference evaluates alerts by re-running a rolling-window aggregate
on a schedule and driving a Triggered/NotTriggered state transition
(src/alerts/alerts_utils.rs:269-278, alert_enums.rs:320-323) — state
lives in the server process. Here the same semantics run INSIDE the
stream as a Spark stateful operator via `applyInPandasWithState`: state
(current alert state + breach streak) is partitioned by alert key and
managed by Spark's state store, so on a real cluster it shards across
executors, survives micro-batches via the checkpoint, and needs no
driver-side bookkeeping. Emitted rows are the TRANSITIONS only (the
reference's notification points), not per-event output.

This is the `applyInPandasWithState` pattern from the build brief:
grouped Arrow batches in, state handle per key, iterator of DataFrames
out.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

TRANSITION_SCHEMA = (
    "alert_key string, n_breaches bigint, n_events bigint, "
    "old_state string, new_state string"
)
_STATE_SCHEMA = "state string, streak bigint"

TRIGGERED = "Triggered"
NOT_TRIGGERED = "NotTriggered"


def _make_machine(threshold: float, min_streak: int):
    """Build the per-group transition function. Closures capture only
    plain numbers, so the pickled task stays tiny."""

    def machine(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cur, streak = state.get if state.exists else (NOT_TRIGGERED, 0)
        n_breaches = 0
        n_events = 0
        for pdf in pdfs:
            vals = pdf["value"]
            n_events += len(vals)
            n_breaches += int((vals > threshold).sum())
        # One evaluation per micro-batch per key: a batch with any breach
        # extends the streak, a breach-free batch resets it
        # (alert_enums.rs:320-323 semantics). No events → state unchanged.
        if n_events:
            streak = streak + 1 if n_breaches else 0
        new = TRIGGERED if streak >= min_streak else NOT_TRIGGERED
        state.update((new, int(streak)))
        if new == cur:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    {
                        "alert_key": [key[0]],
                        "n_breaches": [n_breaches],
                        "n_events": [n_events],
                        "old_state": [cur],
                        "new_state": [new],
                    }
                )
            ]
        )

    return machine


def alert_state_machine(
    events: DataFrame,
    key_col: str = "alert_key",
    value_col: str = "value",
    threshold: float = 0.0,
    min_streak: int = 1,
) -> DataFrame:
    """value > threshold for `min_streak` consecutive evaluations →
    Triggered; first non-breaching evaluation → NotTriggered. Emits one
    row per state TRANSITION per key (the reference's notification
    semantics). Keys shard across the cluster by groupBy hash; state is
    checkpoint-backed."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).alias("alert_key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("alert_key").applyInPandasWithState(
        _make_machine(threshold, min_streak),
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
