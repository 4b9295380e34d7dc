"""Time-range parsing: RFC3339 or human-relative, minute truncation.

Reference: TimeRange::parse_human_time (src/utils/time.rs:191-213)
accepts either RFC3339 instants or humantime expressions ("2 hours",
"10m") relative to "now", and truncates both bounds to the minute.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

_HUMAN_RE = re.compile(
    r"^\s*(\d+)\s*(d|day|days|h|hr|hour|hours|m|min|minute|minutes|s|sec|second|seconds)\s*$",
    re.I,
)
_UNIT_SECONDS = {
    "d": 86400, "day": 86400, "days": 86400,
    "h": 3600, "hr": 3600, "hour": 3600, "hours": 3600,
    "m": 60, "min": 60, "minute": 60, "minutes": 60,
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
}


def truncate_minute(dt: datetime) -> datetime:
    return dt.replace(second=0, microsecond=0)


def _utc_naive(dt: datetime) -> datetime:
    """Normalize to the UTC-naive axis the stored p_timestamp uses.
    Aware stamps convert (a "+05:30" offset must not silently shift the
    window); naive stamps are already UTC by convention. Uniform
    naivety also keeps bound comparisons legal — mixing a naive RFC3339
    bound with an aware 'now' raised TypeError (review findings)."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_human_time(value: str, now: datetime | None = None) -> datetime:
    """'now', RFC3339, or a relative duration subtracted from now.
    Always returns a UTC-naive datetime."""
    now = _utc_naive(now or datetime.now(timezone.utc))
    v = value.strip()
    if v.lower() == "now":
        return now
    m = _HUMAN_RE.match(v)
    if m:
        return now - timedelta(seconds=int(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()])
    # RFC3339 (accept trailing Z)
    return _utc_naive(datetime.fromisoformat(v.replace("Z", "+00:00")))


@dataclass(frozen=True)
class TimeRange:
    start: datetime
    end: datetime

    @classmethod
    def parse(cls, start: str, end: str, now: datetime | None = None) -> "TimeRange":
        now = now or datetime.now(timezone.utc)
        s = truncate_minute(parse_human_time(start, now))
        e = truncate_minute(parse_human_time(end, now))
        if s > e:
            raise ValueError(f"start {s} after end {e}")
        return cls(s, e)

    def sql_literals(self) -> tuple[str, str]:
        fmt = "%Y-%m-%d %H:%M:%S"
        return (
            f"TIMESTAMP_NTZ '{self.start.strftime(fmt)}'",
            f"TIMESTAMP_NTZ '{self.end.strftime(fmt)}'",
        )
