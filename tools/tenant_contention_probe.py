"""Multi-tenant contention probe (VERDICT r4 next-4).

tenants.py's ISOLATION is e2e-proven; this measures its SCALE axis:
T tenants issuing concurrent queries through ONE SparkSession serialize
on the engine's global view lock (query/engine.py _VIEW_LOCK) for the
inject→analyze→restore window. The claim to verify: that window is
ANALYSIS-ONLY — execution (collect) runs outside the lock on Spark's
scheduler — so concurrency still pays.

Method: 8 tenants, each with its own stream (ingested through the real
HTTP ingest route), then the same query workload driven over real HTTP
(ThreadingHTTPServer → per-request threads → shared engine):

- sequential: Q queries round-robin over tenants from one thread;
- concurrent: the same Q queries from 8 threads (one per tenant).

Reported: both walls, speedup, per-query p50/p95, and the measured
analysis-window (lock-held) time per query — obtained by timing
QueryEngine.query (the exact lock scope) via a wrapper installed for
the probe. If the lock serialized whole queries, speedup would pin
at ~1; analysis-only locking shows speedup well above 1 with
lock-window time a small fraction of query wall.

Run: python tools/tenant_contention_probe.py [tenants=8] [queries=48]
Prints one JSON line; prose lands in SCALE.md.
"""

from __future__ import annotations

import base64
import json
import statistics
import sys
import threading
import time
import urllib.request
from datetime import datetime, timedelta, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ADMIN = ("admin", "admin")
N_EVENTS = 4000
BATCH = 500


def _basic(user: str, pw: str) -> dict:
    tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
    return {"Authorization": f"Basic {tok}"}


def _req(method: str, url: str, body=None, headers=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(
        url,
        data=data,
        method=method,
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    resp = urllib.request.urlopen(req, timeout=120)
    return resp.status, json.loads(resp.read() or b"null")


def _time_range() -> dict:
    now = datetime.now(timezone.utc)
    fmt = lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")  # noqa: E731
    return {
        "startTime": fmt(now - timedelta(minutes=10)),
        "endTime": fmt(now + timedelta(minutes=10)),
    }


def main() -> None:
    n_tenants = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from parseable_spark.query import engine as engine_mod
    from parseable_spark.server import ParseableAPI, serve_background
    from parseable_spark.session import get_spark
    from parseable_spark.tenants import TenantManager

    spark = get_spark("tenant-contention-probe")
    import tempfile

    root = tempfile.mkdtemp(prefix="tenant_probe_")
    api = ParseableAPI(spark, root, auth=ADMIN)
    mgr = TenantManager(api, multi_tenant=True)
    srv, base = serve_background(api, tenants=mgr)
    adm = _basic(*ADMIN)

    # instrument the exact lock scope: QueryEngine.query wall per call
    analysis_times: list[float] = []
    orig_query = engine_mod.QueryEngine.query

    def timed_query(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig_query(self, *a, **kw)
        finally:
            analysis_times.append(time.perf_counter() - t0)

    engine_mod.QueryEngine.query = timed_query

    tenants = [f"t{i}" for i in range(n_tenants)]
    for tid in tenants:
        st, _ = _req("PUT", f"{base}/api/v1/tenants/{tid}", {}, adm)
        assert st == 200, f"tenant create {tid} -> {st}"
        for off in range(0, N_EVENTS, BATCH):
            events = [
                {
                    "level": ["info", "warn", "error"][(off + i) % 3],
                    "msg": f"{tid}-{off + i}",
                    "latency_ms": (off + i) % 500,
                }
                for i in range(BATCH)
            ]
            st, out = _req(
                "POST",
                f"{base}/api/v1/ingest",
                events,
                {**adm, "x-p-tenant": tid, "x-p-stream": "applogs"},
            )
            assert st == 200, out

    sql = (
        "SELECT level, COUNT(*) AS c, AVG(latency_ms) AS avg_latency "
        "FROM applogs GROUP BY level ORDER BY level"
    )

    def run_one(tid: str):
        st, rows = _req(
            "POST",
            f"{base}/api/v1/query",
            {"query": sql, **_time_range()},
            {**adm, "x-p-tenant": tid},
        )
        assert st == 200, rows
        # correctness under contention: every tenant sees ITS counts
        assert sum(r["c"] for r in rows) == N_EVENTS, (tid, rows)
        return rows

    # warm: first query per tenant builds the staging union plan
    for tid in tenants:
        run_one(tid)

    # sequential baseline
    per_query_seq: list[float] = []
    t0 = time.perf_counter()
    for i in range(n_queries):
        q0 = time.perf_counter()
        run_one(tenants[i % n_tenants])
        per_query_seq.append(time.perf_counter() - q0)
    seq_wall = time.perf_counter() - t0

    # concurrent: one thread per tenant, same total query count
    analysis_times.clear()
    per_query_conc: list[float] = []
    conc_lock = threading.Lock()
    errors: list[str] = []

    def worker(tid: str, count: int) -> None:
        try:
            for _ in range(count):
                q0 = time.perf_counter()
                run_one(tid)
                dt = time.perf_counter() - q0
                with conc_lock:
                    per_query_conc.append(dt)
        except Exception as e:  # noqa: BLE001
            with conc_lock:
                errors.append(f"{tid}: {e}")

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(tid, n_queries // n_tenants))
        for tid in tenants
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_wall = time.perf_counter() - t0

    engine_mod.QueryEngine.query = orig_query
    srv.shutdown()

    def pct(xs, p):
        return round(statistics.quantiles(xs, n=100)[p - 1], 4) if len(xs) > 1 else xs[0]

    print(
        json.dumps(
            {
                "metric": "tenant_contention",
                "tenants": n_tenants,
                "queries": n_queries,
                "events_per_tenant": N_EVENTS,
                "errors": errors,
                "sequential_wall_s": round(seq_wall, 2),
                "concurrent_wall_s": round(conc_wall, 2),
                "speedup": round(seq_wall / conc_wall, 2),
                "seq_query_p50_s": pct(per_query_seq, 50),
                "conc_query_p50_s": pct(per_query_conc, 50),
                "conc_query_p95_s": pct(per_query_conc, 95),
                "lock_window_p50_s": pct(analysis_times, 50),
                "lock_window_p95_s": pct(analysis_times, 95),
                "lock_window_total_s": round(sum(analysis_times), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
