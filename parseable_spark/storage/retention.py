"""Retention configuration — task parsing + validation.

Parity with the reference's retention config (src/storage/retention.rs:
96-160): tasks are `{description, action: "delete", duration: "<N>d"}`;
the duration must end in 'd', parse as an unsigned number, and be
≤ 36500 days; a 0-day task falls back to 7 days with a warning. The
daily scheduler applies `StreamStore.apply_retention(days)` per task
(the reference runs at 00:00 via its scheduler, retention.rs:58-91 —
any cron slot works identically here).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

logger = logging.getLogger(__name__)

MAX_RETENTION_DAYS = 36500  # retention.rs:156
DEFAULT_DAYS_FOR_ZERO = 7  # Task::new fallback, retention.rs:111-117


class RetentionConfigError(ValueError):
    pass


@dataclass(frozen=True)
class RetentionTask:
    description: str
    days: int
    action: str = "delete"


def parse_retention_config(tasks: list[dict]) -> list[RetentionTask]:
    """Validate a task-view list into RetentionTasks (retention.rs
    TryFrom<Vec<TaskView>> :140-160). Duplicate actions are rejected —
    the reference keeps at most one task per action kind."""
    out: list[RetentionTask] = []
    seen_actions: set[str] = set()
    for t in tasks:
        duration = str(t.get("duration", ""))
        if not duration.endswith("d"):
            raise RetentionConfigError("missing 'd' suffix for duration value")
        try:
            days = int(duration[:-1])
        except ValueError:
            raise RetentionConfigError(
                "could not convert duration to an unsigned number"
            ) from None
        if days < 0:
            raise RetentionConfigError("could not convert duration to an unsigned number")
        if days > MAX_RETENTION_DAYS:
            raise RetentionConfigError(
                f"retention duration cannot be greater than {MAX_RETENTION_DAYS} days"
            )
        if days == 0:
            logger.warning(
                "Using default %s days for retention since 0 was provided",
                DEFAULT_DAYS_FOR_ZERO,
            )
            days = DEFAULT_DAYS_FOR_ZERO
        action = str(t.get("action", "delete")).lower()
        if action != "delete":
            raise RetentionConfigError(f"unsupported retention action: {action}")
        if action in seen_actions:
            raise RetentionConfigError("duplicate retention action")
        seen_actions.add(action)
        out.append(RetentionTask(str(t.get("description", "")), days, action))
    return out


def apply_retention_tasks(store, tasks: list[RetentionTask], now=None) -> int:
    """Run every delete task against a StreamStore; returns partitions
    removed (the per-stream body of the daily scheduler loop)."""
    removed = 0
    for task in tasks:
        removed += store.apply_retention(task.days, now=now)
    return removed
