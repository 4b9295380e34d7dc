"""System resource monitor gating the data plane under overload.

Parity with the reference's resource check
(src/handlers/http/resource_check.rs): a background monitor samples
CPU and memory utilization every `interval_s` and flips a shared
`resource_ok` flag when either crosses its threshold; the HTTP layer
rejects requests with 503 "Server resources over-utilized" while the
flag is down, and recovery is logged when utilization normalizes.

Differences, on purpose: sampling is /proc-based (no sysinfo crate in
Python; /proc/stat deltas for CPU, /proc/meminfo MemAvailable for
memory) with injectable readers for tests and non-Linux fallback
(monitor stays permissive when /proc is unavailable), and the gate
applies to the data-plane POST surface only — health probes and admin
GETs stay reachable so operators can see WHY the node is shedding
load (the reference spawns the same monitor; its middleware is not
bound to a scope in this version, so the binding choice is ours).
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable

log = logging.getLogger(__name__)


def read_proc_cpu() -> tuple[int, int] | None:
    """(busy_jiffies, total_jiffies) from /proc/stat, None off-Linux."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
    except OSError:
        return None
    if not fields or fields[0] != "cpu":
        return None
    vals = [int(x) for x in fields[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    total = sum(vals)
    return total - idle, total


def read_proc_memory() -> float | None:
    """Used-memory percentage from /proc/meminfo, None off-Linux."""
    try:
        info: dict[str, int] = {}
        with open("/proc/meminfo") as f:
            for line in f:
                name, _, rest = line.partition(":")
                info[name] = int(rest.split()[0])
    except (OSError, ValueError, IndexError):
        return None
    total = info.get("MemTotal", 0)
    avail = info.get("MemAvailable")
    if not total or avail is None:
        return None
    return 100.0 * (total - avail) / total


class ResourceMonitor:
    """Background CPU/memory watcher with a `resource_ok` flag.

    cpu_reader/memory_reader are injectable (tests drive synthetic
    utilization); when a reader returns None the corresponding check
    is skipped (fail-open — an unreadable /proc must not take down
    ingestion)."""

    def __init__(
        self,
        cpu_threshold: float = 80.0,
        memory_threshold: float = 80.0,
        interval_s: float = 15.0,
        cpu_reader: Callable[[], tuple[int, int] | None] = read_proc_cpu,
        memory_reader: Callable[[], float | None] = read_proc_memory,
    ) -> None:
        self.cpu_threshold = cpu_threshold
        self.memory_threshold = memory_threshold
        self.interval_s = interval_s
        self._cpu_reader = cpu_reader
        self._memory_reader = memory_reader
        self._prev_cpu: tuple[int, int] | None = None
        self.resource_ok = True
        self.last_cpu_pct: float | None = None
        self.last_memory_pct: float | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _cpu_pct(self) -> float | None:
        cur = self._cpu_reader()
        if cur is None:
            return None
        prev, self._prev_cpu = self._prev_cpu, cur
        if prev is None:
            return None  # first sample anchors the delta
        dbusy, dtotal = cur[0] - prev[0], cur[1] - prev[1]
        return 100.0 * dbusy / dtotal if dtotal > 0 else None

    def check_once(self) -> bool:
        """One sampling round; updates and returns resource_ok."""
        self.last_cpu_pct = self._cpu_pct()
        self.last_memory_pct = self._memory_reader()
        ok = True
        if self.last_memory_pct is not None and self.last_memory_pct > self.memory_threshold:
            log.warning(
                "High memory usage: %.1f%% (threshold %.1f%%)",
                self.last_memory_pct, self.memory_threshold,
            )
            ok = False
        if self.last_cpu_pct is not None and self.last_cpu_pct > self.cpu_threshold:
            log.warning(
                "High CPU usage: %.1f%% (threshold %.1f%%)",
                self.last_cpu_pct, self.cpu_threshold,
            )
            ok = False
        if ok != self.resource_ok:
            log.warning(
                "Resource utilization %s — requests will be %s",
                "back to normal" if ok else "too high",
                "accepted" if ok else "rejected",
            )
        self.resource_ok = ok
        return ok

    def start(self) -> "ResourceMonitor":
        def loop() -> None:
            while not self._stop.wait(self.interval_s):
                try:
                    self.check_once()
                except Exception:  # noqa: BLE001 — monitor must not die
                    log.exception("resource check failed")

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
