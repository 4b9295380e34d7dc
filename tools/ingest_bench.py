"""Ingestion throughput bench: driver-side vs distributed normalization.

Measures events/second through the two ingest paths over the same
synthetic JSON events (shape modeled on the driver's events table —
nested fields, mixed types, occasional schema drift):

1. driver path — `prepare_batch` (flatten → conflict-rename → coerce →
   type) in a single Python process, the path HTTP ingest uses. This
   is the reference's per-request path too; it bounds ONE ingestor's
   throughput, and the product answer to more volume is more
   ingestors (the reference scales the same way).
2. distributed path — `ingest/distributed.py` two-phase mapInPandas
   over a Spark DataFrame of raw JSON strings: the bulk/backfill path
   where normalization parallelizes across executors; this is the
   100 TB shape.

Usage: python tools/ingest_bench.py [n_events]
Prints one JSON line per path + a summary.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_events(n: int) -> list[dict]:
    lvls = ["info", "warn", "error", "debug"]
    out = []
    for i in range(n):
        e = {
            "level": lvls[i % 4],
            "msg": f"request {i} completed with status {200 + (i % 5)}",
            "latency_ms": (i * 37) % 950,
            "meta": {"region": f"r{i % 3}", "zone": f"z{i % 7}"},
            "ok": i % 11 != 0,
        }
        if i % 50 == 0:  # schema drift: occasional new field
            e[f"extra_{i % 200}"] = float(i)
        if i % 97 == 0:  # type conflict: number where strings usually are
            e["msg"] = i
        out.append(e)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    events = make_events(n)

    # --- driver path -------------------------------------------------------
    from parseable_spark.ingest.events import StreamConfig, prepare_batch
    from parseable_spark.ingest.schema import SchemaRegistry

    cfg = StreamConfig(name="bench")
    reg = SchemaRegistry()
    prepare_batch(events[:1000], reg, cfg)  # warm (first-batch schema work)
    t0 = time.perf_counter()
    batch = prepare_batch(events, SchemaRegistry(), cfg)
    driver_s = time.perf_counter() - t0
    assert len(batch.records) >= n
    driver_eps = n / driver_s
    print(json.dumps({"path": "driver_prepare_batch", "n": n,
                      "wall_s": round(driver_s, 3), "events_per_s": int(driver_eps)}))

    # --- distributed path --------------------------------------------------
    from parseable_spark.ingest import distributed
    from parseable_spark.session import get_spark

    spark = get_spark("ingest-bench")
    from parseable_spark.ingest.schema import SchemaRegistry as _Reg

    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    ).repartition(32).localCheckpoint()  # isolate generation from the timing

    def run():
        reg2 = distributed.infer_schema_distributed(raw, _Reg(), cfg)
        distributed.normalize_distributed(spark, raw, reg2, cfg).write.format(
            "noop"
        ).mode("overwrite").save()

    run()  # warm
    t0 = time.perf_counter()
    run()
    dist_s = time.perf_counter() - t0
    dist_eps = n / dist_s
    print(json.dumps({"path": "distributed_mapInPandas", "n": n,
                      "wall_s": round(dist_s, 3), "events_per_s": int(dist_eps)}))
    print(json.dumps({
        "metric": "ingest_throughput",
        "n": n,
        "driver_events_per_s": int(driver_eps),
        "distributed_events_per_s": int(dist_eps),
        "speedup": round(dist_eps / driver_eps, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
