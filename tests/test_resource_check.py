"""Resource-utilization gate (resource_check.py + server wiring).

Reference: src/handlers/http/resource_check.rs — background monitor
flips a flag on CPU/memory thresholds; requests are rejected with 503
while the flag is down and accepted again after recovery.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from parseable_spark.resource_check import ResourceMonitor


class TestMonitor:
    def test_cpu_delta_math_and_threshold(self):
        """CPU%% comes from jiffy deltas between samples; the first
        sample only anchors."""
        readings = iter([(100, 200), (190, 300), (200, 400)])
        mon = ResourceMonitor(
            cpu_threshold=80.0,
            cpu_reader=lambda: next(readings),
            memory_reader=lambda: 10.0,
        )
        assert mon.check_once()  # first sample: no delta yet -> ok
        assert not mon.check_once()  # (190-100)/(300-200) = 90% > 80
        assert mon.last_cpu_pct == 90.0
        assert mon.check_once()  # (200-190)/(400-300) = 10% -> recovered

    def test_memory_threshold(self):
        mem = [95.0]
        mon = ResourceMonitor(
            memory_threshold=80.0,
            cpu_reader=lambda: None,
            memory_reader=lambda: mem[0],
        )
        assert not mon.check_once()
        mem[0] = 50.0
        assert mon.check_once()

    def test_unreadable_proc_fails_open(self):
        mon = ResourceMonitor(cpu_reader=lambda: None, memory_reader=lambda: None)
        assert mon.check_once()  # no readings -> permissive

    def test_real_readers_return_sane_values_on_linux(self):
        from parseable_spark.resource_check import read_proc_cpu, read_proc_memory

        cpu = read_proc_cpu()
        mem = read_proc_memory()
        if cpu is not None:
            busy, total = cpu
            assert 0 <= busy <= total
        if mem is not None:
            assert 0.0 <= mem <= 100.0


def test_http_data_plane_shed_under_overload(spark, tmp_path):
    """503 on data-plane POSTs while over-utilized; health and admin
    GETs stay reachable; ingestion resumes after recovery."""
    from parseable_spark.server import ParseableAPI, serve_background

    mem = [50.0]
    mon = ResourceMonitor(
        memory_threshold=80.0, cpu_reader=lambda: None, memory_reader=lambda: mem[0]
    )
    api = ParseableAPI(spark, str(tmp_path), resource_monitor=mon)
    srv, base = serve_background(api)

    def post_ingest():
        req = urllib.request.Request(
            base + "/api/v1/ingest",
            data=json.dumps([{"msg": "x"}]).encode(),
            headers={"Content-Type": "application/json", "x-p-stream": "s1"},
        )
        return urllib.request.urlopen(req, timeout=30)

    try:
        assert post_ingest().status == 200  # healthy baseline

        mem[0] = 95.0
        mon.check_once()
        with pytest.raises(urllib.error.HTTPError) as ei:
            post_ingest()
        assert ei.value.code == 503
        assert b"over-utilized" in ei.value.read()
        # health probe and about stay up for operators
        for path in ("/api/v1/liveness", "/api/v1/about"):
            assert urllib.request.urlopen(base + path, timeout=30).status == 200

        mem[0] = 40.0
        mon.check_once()
        assert post_ingest().status == 200  # recovered
    finally:
        srv.shutdown()
