"""Memory-pressure capacity probe — spill-not-OOM under a constrained
heap (VERDICT r3 next-6).

Every other probe measures TIME; this one measures what happens when
the working set exceeds executor memory — the actual 100 TB failure
mode. It replicates the two memory-heaviest inputs xN (documents for
the UNCAPPED LSH dedup+verify q25; events for the q47 window frames,
whose 5-value partition key gives ~N*24k-row sort partitions), then
runs each query in its OWN subprocess whose JVM heap is pinned small
(``--mem``, default 1g, set at JVM launch — that's why it must be a
child process), and scrapes the Spark status store for shuffle/spill
bytes. PASS = every child completes with nonzero spill recorded (the
sorts/aggregations degraded to disk instead of dying); an OOM kills
only that child and reports as FAIL.

One child PER QUERY is deliberate: the probe asks "does this PLAN
spill instead of dying on a 1 GB executor" — the per-plan capacity
question that transfers to a real cluster, where executors are not
one shared driver-heap process accumulating every query's status
store and broadcast blocks. (The r4 sequence experiment showed the
shared-session variant fails on the THIRD heavy query from exactly
that accumulation, with each query green solo.)

Usage: python tools/memory_probe.py [N=64] [--mem 1g]
       (child mode, internal: --child <data_dir> <mem> <query>)
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
    # fixed-size dims copied verbatim for q12 (q11 joins only
    # customer/orders/lineitem): its keys to them (l_suppkey,
    # nationkey, regionkey) are NOT offset below, so every replica
    # joins the same dim rows — fact grows xN, dims stay put,
    # exactly the 100 TB shape
    for t in ("supplier", "nation", "region"):
        load_table(spark, SF_DIR, t).write.parquet(f"{out}/{t}.parquet")
    for t, keys in (
        ("documents", ["doc_id"]),
        ("events", ["event_id", "user_id"]),
        ("embeddings", ["vec_id"]),
        # TPC-H join tables for the q11/q12 capacity children: order
        # and customer keys offset per replica so orders⋈customer and
        # lineitem⋈orders match within a replica
        ("customer", ["c_custkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey"]),
    ):
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


PROBE_QUERIES = (
    "q25_dedup_minhash_verified",
    "q47_window_frames",
    "strip_duplicate_spans",  # r4: token-explode × per-doc windows
    # r5 (VERDICT r4 next-3): the COMPOSED pipeline with every r4 stage
    # enabled — shared scans and co-resident stage state the per-op
    # probes never exercise together
    "curate_corpus_full",
    # r5 s7: after dropping the forced broadcasts on SF-growing sides,
    # prove the AQE join plans spill-not-OOM when the would-have-been
    # broadcast sides (x64 customer/orders) exceed the 1 GB heap
    "q11_shipping_priority",
    "q12_local_supplier_volume",
)


def child(data_dir: str, mem: str, query: str) -> None:
    """Constrained-heap session; runs ONE probe query; reports metrics."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")  # REST /api/v1 = spill metrics
        .config("spark.ui.port", "0")
        # keep the status store small: retained task/stage metadata
        # lives in the same heap the probe is squeezing
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        .config("spark.ui.retainedTasks", "500")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("memory-probe")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    from parseable_spark.llm.dedup import strip_duplicate_spans
    from parseable_spark.tables import load_table

    if query == "strip_duplicate_spans":
        dfs = [
            strip_duplicate_spans(
                load_table(spark, data_dir, "documents"), min_tokens=8
            )
        ]
    elif query == "curate_corpus_full":
        # every optional stage ON: history-bloom gate (built over a 1/8
        # "previously ingested" slice), CCNet perplexity scoring under a
        # target-corpus LM, LSH near-dup + Jaccard verify, repeated-span
        # strip, PII redaction, semantic dedup over the replicated
        # embeddings (identical-vector mega-clusters — the giant-cluster
        # guard's worst case), and temperature-mixture by source domain
        from parseable_spark.llm import bloom as B
        from parseable_spark.llm import lm as L
        from parseable_spark.llm.pipeline import curate_corpus

        docs = load_table(spark, data_dir, "documents")
        emb = load_table(spark, data_dir, "embeddings")
        geo = {"num_shards": 16, "bits_per_shard": 1 << 20, "num_hashes": 7}
        history = B.bloom_build(
            docs.filter("doc_id % 8 = 0"), "text", **geo
        ).localCheckpoint()
        lm_counts = L.ngram_counts(
            docs.filter("doc_id % 16 = 1"), order=2, min_count=2
        ).localCheckpoint()
        res = curate_corpus(
            docs,
            embeddings=emb,
            domain_col="source",
            history_bloom=history,
            bloom_geometry=geo,
            lm_counts=lm_counts,
            max_pseudo_ppl=1e9,  # filter RUNS (scores everything), keeps all
            strip_spans_min_tokens=10,
            mixture_temperature=0.7,
            compute_summary=False,
        )
        dfs = [res.kept, res.decisions]
    else:
        dfs = [entry.queries()[query](spark, data_dir)]
    t0 = time.perf_counter()
    for df in dfs:
        df.write.format("noop").mode("overwrite").save()
    results = {query: {"wall_s": round(time.perf_counter() - t0, 2)}}

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
                "query": query,
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
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return 0
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    mem = "1g"
    if "--mem" in sys.argv:
        mem = sys.argv[sys.argv.index("--mem") + 1]
    data_dir = os.environ.get("MEMORY_PROBE_DIR", "/tmp/parseable_spark_memprobe")

    t0 = time.perf_counter()
    build_data(data_dir, n)
    build_s = round(time.perf_counter() - t0, 1)

    children, all_ok, any_oom = [], True, False
    last_stderr = ""
    for query in PROBE_QUERIES:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", data_dir, mem, query],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        child_json = None
        for line in proc.stdout.splitlines():
            if line.startswith('{"metric": "memory_probe_child"'):
                child_json = json.loads(line)
        ok = proc.returncode == 0 and child_json is not None
        oom = (
            "OutOfMemoryError" in proc.stderr or "OutOfMemoryError" in proc.stdout
        )
        children.append(child_json or {"query": query, "failed": True})
        all_ok = all_ok and ok
        any_oom = any_oom or oom
        if not ok:
            last_stderr = proc.stderr[-2000:]
    print(
        json.dumps(
            {
                "metric": "memory_probe",
                "replication": n,
                "build_s": build_s,
                "driver_memory": mem,
                "children": children,
                "oom": any_oom,
                "verdict": "PASS: spill-not-OOM"
                if all_ok and not any_oom
                else "FAIL (see stderr tail)",
            }
        )
    )
    if not all_ok:
        sys.stderr.write(last_stderr)
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
