"""Memory-pressure capacity probe — spill-not-OOM under a constrained
heap (VERDICT r3 next-6).

Every other probe measures TIME; this one measures what happens when
the working set exceeds executor memory — the actual 100 TB failure
mode. It replicates the two memory-heaviest inputs xN (documents for
the UNCAPPED LSH dedup+verify q25; events for the q47 window frames,
whose 5-value partition key gives ~N*24k-row sort partitions), then
runs both queries in a SUBPROCESS whose JVM heap is pinned small
(``--mem``, default 1g, set at JVM launch — that's why it must be a
child process), and scrapes the Spark status store for shuffle/spill
bytes. PASS = the child completes with nonzero spill recorded (the
sorts/aggregations degraded to disk instead of dying); an OOM kills
only the child and reports as FAIL.

Usage: python tools/memory_probe.py [N=64] [--mem 1g]
       (child mode, internal: --child <data_dir> <mem>)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def build_data(out_dir: str, n: int) -> None:
    """xN replication of documents (consonant-rotated per replica — the
    scale_probe recipe, near-dup density held constant) and events
    (time axis extended)."""
    import shutil

    from pyspark.sql import functions as F

    from parseable_spark.session import get_spark
    from parseable_spark.tables import load_table

    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    spark = get_spark("memory-probe-build")
    for t, keys in (("documents", ["doc_id"]), ("events", ["event_id", "user_id"])):
        df = load_table(spark, SF_DIR, t)
        offsets = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        span = None
        if t == "events":
            lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
            span = int((hi - lo).total_seconds()) + 1
        parts = []
        for i in range(n):
            r = df
            for k, off in offsets.items():
                r = r.withColumn(k, F.col(k) + F.lit(i * off))
            if span is not None:
                r = r.withColumn(
                    "ts", F.timestamp_add("SECOND", F.lit(i * span), F.col("ts"))
                )
            if t == "documents" and i > 0:
                src = "bcdfghklmnprstvw"
                dst = src[i % len(src):] + src[: i % len(src)]
                r = r.withColumn("text", F.translate("text", src, dst))
            parts.append(r)
        whole = parts[0]
        for p in parts[1:]:
            whole = whole.unionByName(p)
        whole.write.parquet(f"{out}/{t}.parquet")
    spark.stop()


def child(data_dir: str, mem: str) -> None:
    """Constrained-heap session; runs the two probes; reports metrics."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")  # REST /api/v1 = spill metrics
        .config("spark.ui.port", "0")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("memory-probe")
        .getOrCreate()
    )
    results = {}
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("q25_dedup_minhash_verified", "q47_window_frames"):
        t0 = time.perf_counter()
        qs[name](spark, data_dir).write.format("noop").mode("overwrite").save()
        results[name] = {"wall_s": round(time.perf_counter() - t0, 2)}

    # spill/shuffle accounting from the UI REST API (the same numbers
    # the stage page shows)
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages", timeout=10)
    )
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    shuf_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    shuf_read = sum(s.get("shuffleReadBytes", 0) for s in stages)
    print(
        json.dumps(
            {
                "metric": "memory_probe_child",
                "driver_memory": mem,
                "queries": results,
                "memoryBytesSpilled": int(mem_spill),
                "diskBytesSpilled": int(disk_spill),
                "shuffleWriteBytes": int(shuf_write),
                "shuffleReadBytes": int(shuf_read),
            }
        )
    )
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return 0
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    mem = "1g"
    if "--mem" in sys.argv:
        mem = sys.argv[sys.argv.index("--mem") + 1]
    data_dir = os.environ.get("MEMORY_PROBE_DIR", "/tmp/parseable_spark_memprobe")

    t0 = time.perf_counter()
    build_data(data_dir, n)
    build_s = round(time.perf_counter() - t0, 1)

    proc = subprocess.run(
        [sys.executable, __file__, "--child", data_dir, mem],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    child_json = None
    for line in proc.stdout.splitlines():
        if line.startswith('{"metric": "memory_probe_child"'):
            child_json = json.loads(line)
    ok = proc.returncode == 0 and child_json is not None
    oom = "OutOfMemoryError" in proc.stderr or "OutOfMemoryError" in proc.stdout
    print(
        json.dumps(
            {
                "metric": "memory_probe",
                "replication": n,
                "build_s": build_s,
                "driver_memory": mem,
                "child": child_json,
                "oom": oom,
                "verdict": "PASS: spill-not-OOM"
                if ok and not oom
                else f"FAIL rc={proc.returncode} (see stderr tail)",
            }
        )
    )
    if not ok:
        sys.stderr.write(proc.stderr[-2000:])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
